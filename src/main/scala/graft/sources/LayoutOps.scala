package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management: how a 100 TB corpus is physically arranged
  * so downstream queries prune instead of scan.
  *
  * The reference copies rows into a target database and leaves layout to
  * it (SURVEY.md §2.1 #13); on a data lake the engine itself owns layout.
  * Three primitives cover the common lifecycle:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning on a
  *    low-cardinality column + in-file ordering on a high-cardinality
  *    one. Directory partitioning turns `WHERE lang = 'en'` into
  *    partition PRUNING (the non-matching directories are never listed,
  *    visible as `PartitionFilters` in the scan); the within-file sort
  *    tightens parquet row-group min/max stats so range predicates on
  *    the sort column skip row groups inside the files that survive.
  *  - [[compact]]: bin-pack a directory written by many small tasks into
  *    ~`targetRows`-sized files. Small files are the classic lake
  *    pathology (every file costs a driver listing + task schedule +
  *    footer read); compaction after high-parallelism writes keeps file
  *    count proportional to data volume, not to historical task count.
  *  - [[prunedScan]]: the read side — a reader over the partitioned
  *    layout with the partition predicate applied, for plan inspection
  *    and use as a source.
  *
  * `repartition(cols)` before the partitioned write sends each hive
  * partition's rows to ONE task (otherwise every task writes a file into
  * every partition directory: tasks × partitions small files);
  * `sortWithinPartitions` then orders rows inside each file. This is the
  * standard write-side shuffle trade: one exchange at write time buys
  * pruning on every subsequent read.
  */
object LayoutOps {

  /** Write `df` hive-partitioned by `partCol`, one file per partition,
    * rows ordered by `sortCol` inside each file. */
  def writePartitioned(df: DataFrame, path: String,
                       partCol: String, sortCol: String): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write
      .mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)

  /** Rewrite a parquet directory into ceil(count/targetRows) files,
    * preserving rows exactly. `repartitionByRange` on `orderCol` keeps
    * the new files range-disjoint (so min/max stats stay tight) instead
    * of round-robin shuffling rows across files. */
  def compact(spark: SparkSession, path: String, orderCol: String,
              targetRows: Long): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartitionByRange(files, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .write.mode("overwrite").parquet(tmp)
    // swap: parquet dirs are immutable from Spark's side, so the rewrite
    // lands in a temp dir and replaces the original atomically-enough
    // for a single-writer maintenance job (a lake table format — not
    // modeled here — would commit this as a snapshot instead).
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Reader over [[writePartitioned]] output with the partition predicate
    * applied — resolves to a pruned scan (PartitionFilters, not a data
    * filter). */
  def prunedScan(spark: SparkSession, path: String,
                 partCol: String, value: String): DataFrame =
    spark.read.parquet(path).filter(col(partCol) === value)

  /** Write `df` as a bucketed, per-bucket-sorted catalog table — the
    * PRE-PAID shuffle. Rows are hash-distributed into `buckets` files by
    * `bucketCol` at write time and the bucket spec rides in the catalog,
    * so a later join or aggregation keyed on `bucketCol` between tables
    * with the SAME bucket count needs no exchange at all: both scans
    * already report `HashPartitioning(bucketCol, buckets)` and
    * EnsureRequirements inserts nothing. This is THE layout for
    * fact-to-fact joins at 100 TB, where neither side can broadcast and
    * an on-the-fly shuffle of either side is the job's dominant cost —
    * one write-time exchange is amortized over every subsequent join.
    *
    * The explicit `repartition` matches the write tasks to the bucket
    * function (Spark's bucketing and `repartition` both use Murmur3 on
    * the column), so each bucket is exactly ONE file — without it every
    * task writes a sliver of every bucket (tasks × buckets small files)
    * and the per-bucket `sortBy` order no longer implies a single sorted
    * run, forcing joins to re-sort. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, buckets: Int): Unit =
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
