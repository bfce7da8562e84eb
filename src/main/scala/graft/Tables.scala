package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All queries in [[SparkEntry]]
  * take the sfDir as a parameter so the same code runs at any scale factor
  * (sf0.001 smoke → sf0.1 bench → a real 100 TB lake: the path is the only
  * thing that changes; the plans are declarative and partition-parallel).
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** TPC-H-ish star schema + events stream table + LLM-pipeline tables. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale. */
  val broadcastable: Set[String] = Set("region", "nation")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize events.ts across driver testdata generations: older data
    // is TIMESTAMP(NANOS) parquet, which Spark reads as raw nanos
    // (spark.sql.legacy.parquet.nanosAsLong, set in GraftSession) —
    // truncate to micros exactly like DuckDB does; newer data is
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    // TIMESTAMP_NTZ — cast to TIMESTAMP_LTZ (session TZ is pinned UTC,
    // so the instant equals DuckDB's naive read of the same file).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }

  /** Register every table as a temp view (for spark.sql / SQL tests). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
