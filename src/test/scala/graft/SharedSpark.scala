package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared across all specs (Spark startup is ~5s; a
  * per-suite session would dominate test time). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
