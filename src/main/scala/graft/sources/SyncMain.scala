package graft.sources

import graft.GraftSession

/** CLI entry for whole-database sync — the reference's Boot→Handler flow
  * (Boot.java:17-20, Handler.java:27-33) as a Spark job.
  *
  * Usage: SyncMain <sourceJdbcUrl> <targetJdbcUrl> <database> [dialect]
  *    or: SyncMain <config.properties> [dialect]   (file-boot form,
  *        mirroring the reference's application.yml; see
  *        [[SyncConf.fromProperties]])
  *   dialect: mysql (default) | derby
  */
object SyncMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: SyncMain <sourceUrl> <targetUrl> <database> [mysql|derby] " +
        "| SyncMain <config.properties> [mysql|derby]")
    val fileBoot = args.length <= 2 && new java.io.File(args(0)).isFile
    val dialectArg = if (fileBoot) args.lift(1) else args.lift(3)
    val dialect: SqlDialect =
      if (dialectArg.contains("derby")) DerbyDialect else MySqlDialect
    val conf =
      if (fileBoot) SyncConf.fromProperties(args(0))
      else {
        require(args.length >= 3,
          "usage: SyncMain <sourceUrl> <targetUrl> <database> [mysql|derby]")
        SyncConf(sourceUrl = args(0), targetUrl = args(1), database = args(2))
      }
    val spark = GraftSession.get()
    try {
      val results = TableSync.syncAll(spark, conf, dialect)
      results.foreach { r =>
        val status = if (r.countInvariantHolds) "OK " else "MISMATCH"
        println(f"[sync] $status ${r.table}%-30s source=${r.sourceRows}%8d target=${r.targetRows}%8d")
      }
      val bad = results.filterNot(_.countInvariantHolds)
      println(s"[sync] ${results.size} tables, ${bad.size} mismatches")
      if (bad.nonEmpty) sys.exit(1)
    } finally spark.stop()
  }
}
