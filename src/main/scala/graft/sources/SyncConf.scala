package graft.sources

/** Sync-job configuration, mirroring the reference's `application.yml`
  * (source/target JDBC endpoints + the database to replicate; see
  * /root/reference/src/main/resources/application.yml:1-23) plus the
  * scale knobs the reference hard-codes:
  *
  *  - `fetchSize` = 1000 — the reference's streaming-cursor batch
  *    (JdbcRecordCursor.java:45);
  *  - `batchSize` = 1000 — its executeBatch/commit cadence
  *    (JdbcPageSink.java:99-104);
  *  - `numPartitions` — NEW: the reference reads 1 thread per table
  *    (M2H2DataMigrator.java:24-28); we split reads on an integral key
  *    when one exists so a 1000-executor cluster scans in parallel;
  *  - `tableParallelism` — NEW: the reference syncs tables serially
  *    (Handler.java:30-32); we run the per-table driver loop in parallel.
  */
final case class SyncConf(
    sourceUrl: String,
    targetUrl: String,
    database: String,
    sourceProps: Map[String, String] = Map.empty,
    targetProps: Map[String, String] = Map.empty,
    fetchSize: Int = 1000,
    batchSize: Int = 1000,
    numPartitions: Int = 8,
    tableParallelism: Int = 4,
    /** Reference behavior: columns with no type mapping are silently
      * dropped (M2H2SchemaConverter.java:135-138). Strict mode fails
      * instead — an intentional, flagged divergence. */
    strictTypes: Boolean = false)

object SyncConf {

  /** Load a sync config from a Java properties file — the engine's
    * equivalent of the reference booting from `application.yml`
    * (Boot.java:17-20). Recognized keys: `source.url`, `target.url`,
    * `database` (required); `source.<k>` / `target.<k>` become JDBC
    * connection properties; `fetchSize`, `batchSize`, `numPartitions`,
    * `tableParallelism`, `strictTypes` override the scale knobs. */
  def fromProperties(path: String): SyncConf = {
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(path)
    try p.load(in) finally in.close()
    def req(k: String): String = {
      val v = p.getProperty(k)
      require(v != null && v.nonEmpty, s"missing required property: $k")
      v
    }
    import scala.jdk.CollectionConverters._
    def side(prefix: String): Map[String, String] =
      p.stringPropertyNames.asScala.toSeq
        .filter(k => k.startsWith(prefix + ".") && k != s"$prefix.url")
        .map(k => k.stripPrefix(prefix + ".") -> p.getProperty(k)).toMap
    val base = SyncConf(
      sourceUrl = req("source.url"),
      targetUrl = req("target.url"),
      database = req("database"),
      sourceProps = side("source"),
      targetProps = side("target"))
    def int(k: String, dflt: Int) =
      Option(p.getProperty(k)).map(_.trim.toInt).getOrElse(dflt)
    base.copy(
      fetchSize = int("fetchSize", base.fetchSize),
      batchSize = int("batchSize", base.batchSize),
      numPartitions = int("numPartitions", base.numPartitions),
      tableParallelism = int("tableParallelism", base.tableParallelism),
      strictTypes = Option(p.getProperty("strictTypes"))
        .map(_.trim.toBoolean).getOrElse(base.strictTypes))
  }
}
