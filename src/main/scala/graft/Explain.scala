package graft

/** Plan auditor: prints the formatted physical plan of declared queries
  * (all, or those named in args) at sf0.001 — the tool for checking that
  * filters/projections reach the parquet scan (PushedFilters/ReadSchema),
  * small dims broadcast, and operators stay inside WholeStageCodegen.
  *
  * Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get()
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n===================== $name =====================")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          if (sys.env.contains("EXPLAIN_RUN")) {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            println(f"[explain] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
