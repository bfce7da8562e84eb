#!/bin/bash
# Run a compiled graft main class directly (no sbt — avoids the project
# lock so measurement can overlap compilation/tests). Usage:
#   scripts/run_graft.sh graft.Bench [args...]
# Env: SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR / SPARK_DRIVER_MEM as usual.
set -u
CLS="$1"; shift
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS ${GRAFT_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -XX:ReservedCodeCacheSize=1g \
  -cp "${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" \
  "$CLS" "$@"
