package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * Local runs use `local[N]`; on a real cluster the same settings apply —
  * AQE re-plans shuffles at runtime (coalescing small partitions, converting
  * sort-merge joins to broadcast when a side turns out small, splitting
  * skewed partitions), which is the main knob that keeps these plans honest
  * when the data is 1000× bigger than the test scale factors.
  */
object GraftSession {
  def builder(master: String = s"local[${defaultCpus}]",
              shufflePartitions: Int = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects natively; read as long and convert in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors().min(32))

  /** Shared session for tests / ad-hoc use. */
  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
