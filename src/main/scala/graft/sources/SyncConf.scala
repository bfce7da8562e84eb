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
