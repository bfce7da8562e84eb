package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SCD2 dimension MAINTENANCE — the MERGE emulation that keeps a
  * slowly-changing dimension current as change batches arrive, against
  * a plain bucketed parquet table (no Delta/Hudi/Iceberg runtime).
  * q38 answers the point-in-time LOOKUP; this answers how the
  * versioned table it reads is kept up to date on day 2 without a
  * from-scratch rebuild.
  *
  * The emulation is copy-on-write MERGE, the same contract a lakehouse
  * table format implements per touched file: close each batched key's
  * current version (valid_to ← the new row's valid_from,
  * is_current ← false), insert the new rows as the open versions, and
  * publish the result atomically as the table's next content. The
  * union is materialized (localCheckpoint) BEFORE the overwrite —
  * Spark cannot overwrite a location while scanning it, and the
  * materialize-then-swap is exactly upsertBatch's
  * delete-insert-commit transaction shape transplanted from JDBC to
  * the warehouse.
  *
  * Scale shape: the dimension persists BUCKETED on the entity key, so
  * the close-join plans no exchange on the dimension side; only the
  * (small) daily batch shuffles. The rewrite cost is the dimension's
  * size, not the fact table's — and the dimension is the small table
  * by definition. Specs prove day-2 maintenance ≡ a from-scratch
  * rebuild, bit for bit. */
object Scd2Ops {

  private val FarFuture = "9999-01-01"

  /** Initial SCD2 load: `versions` rows (k, seg_v, valid_from) become
    * (k, seg_v, valid_from, valid_to, is_current) with each version
    * closed by its successor and the latest left open. */
  def initDim(spark: SparkSession, table: String, versions: DataFrame): Unit =
    graft.sources.LayoutOps.writeBucketed(initDimFrame(versions), table, "k",
      graft.sources.LayoutOps.stateBuckets(versions.sparkSession))

  /** Day-2 MERGE: for every key in `batch` (k, seg_v, valid_from),
    * close the dimension's current version at the new valid_from and
    * insert the new row as current; untouched keys pass through
    * byte-identical. Intra-day churn is collapsed to the LATEST row
    * per key (by valid_from, seg_v tiebreak) before merging — a
    * daily-digest MERGE applies end-of-day state, and without the
    * collapse a key with two batch rows would insert two "current"
    * versions (the close-join pairs every dim row with every batch
    * row for its key). */
  def upsertDim(spark: SparkSession, table: String, batch: DataFrame): Unit = {
    // materialize the merged content before overwriting the scanned
    // location (CoW publish), then release the staging blocks
    val next = mergedDim(spark.table(table), batch).localCheckpoint()
    try graft.sources.LayoutOps.writeBucketed(next, table, "k",
      graft.sources.LayoutOps.stateBuckets(next.sparkSession))
    finally DedupOps.unpersistCheckpointed(next)
  }

  /** The MERGE itself, over explicit frames: close + insert as a lazy
    * plan, shared by the in-place batch [[upsertDim]] and the
    * epoch-committed streaming dual ([[graft.streaming.StreamOps
    * .streamingScd2]]), which writes the result to the NEXT epoch's
    * table instead of overwriting — same fold, different publish. */
  private[graft] def mergedDim(dim: DataFrame, batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    val b = batch
      .groupBy($"k")
      .agg(max_by(struct($"seg_v", $"valid_from"),
        struct($"valid_from", $"seg_v")).as("r"))
      .select($"k".as("bk"), $"r.seg_v".as("b_seg"),
        $"r.valid_from".as("b_from"))
    val closed = dim.join(b, $"k" === $"bk", "left")
      .select($"k", $"seg_v", $"valid_from",
        when($"bk".isNotNull && $"is_current", $"b_from")
          .otherwise($"valid_to").as("valid_to"),
        when($"bk".isNotNull, lit(false))
          .otherwise($"is_current").as("is_current"))
    val fresh = b.select($"bk".as("k"), $"b_seg".as("seg_v"),
      $"b_from".as("valid_from"),
      lit(FarFuture).cast("timestamp").as("valid_to"),
      lit(true).as("is_current"))
    closed.unionByName(fresh)
  }

  /** [[initDim]]'s content as a lazy frame, for callers that own the
    * publish (the epoch-committed streaming dual). */
  private[graft] def initDimFrame(versions: DataFrame): DataFrame = {
    import versions.sparkSession.implicits._
    val w = Window.partitionBy($"k").orderBy($"valid_from")
    versions
      .withColumn("valid_to",
        coalesce(lead($"valid_from", 1).over(w),
          lit(FarFuture).cast("timestamp")))
      .withColumn("is_current",
        $"valid_to" === lit(FarFuture).cast("timestamp"))
  }
}
