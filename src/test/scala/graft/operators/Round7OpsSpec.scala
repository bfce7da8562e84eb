package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator specs: persisted standing state (day-2 incremental
  * forms + serve-from-saved-ANN-index) and their plan-shape guarantees. */
class Round7OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  /** The physical plan with the AQE wrapper peeled (pre-execution, so
    * Exchange nodes are still visible as such, not query stages). */
  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Assert the join side that reads a `graft_state_` table plans no
    * Exchange: the bucketed standing state already provides the join's
    * required hash partitioning, so ONLY the daily batch shuffles. */
  private def assertStandingSideExchangeFree(df: DataFrame, what: String): Unit = {
    val smjs = physical(df).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"$what: expected a sort-merge probe join")
    val standingSides = smjs.flatMap(j => Seq(j.left, j.right))
      .filter(_.toString.contains("graft_state_"))
    assert(standingSides.nonEmpty,
      s"$what: no join side reads the standing-state table")
    standingSides.foreach { side =>
      assert(!side.toString.contains("Exchange"),
        s"$what: standing corpus side must be exchange-free:\n$side")
    }
  }

  test("d16: day-2 probe join is exchange-free on the persisted corpus side") {
    val df = graft.SparkEntry.queries("d16_incremental_day2")(spark, sf)
    assertStandingSideExchangeFree(df, "d16")
    // and day-2 output is identical to the day-1 query
    assert(df.collect().toSeq ==
      graft.SparkEntry.queries("d13_incremental")(spark, sf).collect().toSeq)
  }

  test("d17: day-2 band join is exchange-free on the persisted corpus side") {
    val df = graft.SparkEntry.queries("d17_neardup_day2")(spark, sf)
    assertStandingSideExchangeFree(df, "d17")
    assert(df.collect().toSeq ==
      graft.SparkEntry.queries("d15_incremental_neardup")(spark, sf).collect().toSeq)
  }

  test("p10: day-2 novelty join is exchange-free on the persisted corpus side") {
    val df = graft.SparkEntry.queries("p10_refresh_day2")(spark, sf)
    assertStandingSideExchangeFree(df, "p10")
    assert(df.collect().toSeq ==
      graft.SparkEntry.queries("p8_incremental_refresh")(spark, sf).collect().toSeq)
  }

  test("e17: gini pair sum survives a planted cardinality that overflows BIGINT") {
    import spark.implicits._
    // two activity levels, 2e9 users each: the histogram-pair numerator
    // is 2 * (2e9)^2 * 1000 = 8e21 — 1000x past Long.MaxValue. The
    // DECIMAL(38,0) path must deliver the exact permille.
    val c = 2000000000L
    val hist = Seq(("t", 1L, c), ("t", 1001L, c)).toDF("event_type", "v", "c")
    val row = EventOps.giniFromHist(hist).collect().head
    assert(row.getLong(1) == 2 * c, "n_users")
    assert(row.getLong(2) == c * 1L + c * 1001L, "total_events")
    // replicate the engine's one double conversion on the exact sum
    val mad = BigInt(c) * BigInt(c) * 1000 * 2
    val expected = math.floor(
      1000.0 * mad.toDouble / (2.0 * (2 * c).toDouble * (c * 1002L).toDouble)).toLong
    assert(row.getLong(3) == expected,
      s"gini_permille ${row.getLong(3)} != $expected (decimal path broken)")
    assert(mad > BigInt(Long.MaxValue), "planted sum must actually overflow longs")
  }

  test("p7: vt product survives a planted 9.5M-doc language that overflows BIGINT") {
    import spark.implicits._
    // pos * 10^12 at pos = 9.5e6 is 9.5e18 > Long.MaxValue — the old
    // BIGINT product would wrap (or throw under ANSI); the DECIMAL(38,0)
    // multiply with integral divide lands the exact BIGINT vt.
    val n = 9500000L
    val d0 = spark.range(n).select($"id".as("doc_id"), lit("xx").as("lang"))
    val wm = math.floor(1000000.0 * math.sqrt(n.toDouble)).toLong
    val expectedMax = (BigInt(n) * BigInt(1000000000000L) / BigInt(wm)).toLong
    val agg = PipelineOps.p7ScheduleFrom(d0)
      .agg(max("vt").as("mx"), count(lit(1)).as("n")).collect().head
    assert(agg.getLong(1) == n, "schedule must cover every doc")
    assert(agg.getLong(0) == expectedMax,
      s"max vt ${agg.getLong(0)} != $expectedMax (overflow in the vt product)")
    assert(BigInt(n) * BigInt(1000000000000L) > BigInt(Long.MaxValue),
      "planted product must actually overflow longs")
  }

  test("s10: serve plan scans ONLY the saved index, prunes unprobed cells, joins nothing") {
    val df = graft.SparkEntry.queries("s10_knn_serve")(spark, sf)
    val plan = physical(df)
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1,
      s"serve must scan exactly the saved codes table, got ${scans.size} scans:\n$plan")
    assert(scans.head.toString.contains("graft_state_s7_codes"),
      s"serve scan is not the saved index:\n${scans.head}")
    // the `cell isin probes` filter resolves as partition pruning: the
    // unprobed inverted lists are never listed, let alone read
    assert(scans.head.partitionFilters.nonEmpty,
      s"cell probe filter did not reach PartitionFilters:\n${scans.head}")
    // no join, no k-means lineage: the codebooks were compiled to literals
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"serve plan must not join:\n$plan")
    // and serving from the saved index reproduces s7 exactly
    assert(df.collect().toSeq ==
      graft.SparkEntry.queries("s7_knn_ivfpq_kmeans")(spark, sf).collect().toSeq)
  }
}
