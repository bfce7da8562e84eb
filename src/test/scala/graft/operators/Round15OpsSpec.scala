package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 specs: e30's portable re-encoding (power-of-two
  * weights as a shared literal table, sign-safe magnitude division,
  * floor(x+0.5) cents) and its negative-value contract — the r14
  * ADVICE low: Spark `div` truncates toward zero while DuckDB `//`
  * floors, so a refund corpus would have silently split the engines
  * under the old direct divide. */
class Round15OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("e30: the power-of-two weight table is exact and inlined " +
      "identically into the oracle VALUES CTE") {
    assert(EventOps.E30Pow2.size == 62)
    assert(EventOps.E30Pow2.head == (0 -> 1L))
    assert(EventOps.E30Pow2.last == (61 -> 2305843009213693952L))
    val sql = EventOps.e30DecayedEngagementSql
    assert(!sql.contains("<<"), "shift operator back in the oracle")
    assert(!sql.toLowerCase.contains("round("), "round() back in the oracle")
    assert(sql.contains("(61, CAST(2305843009213693952 AS BIGINT))"),
      "largest weight literal missing from the VALUES CTE")
  }

  test("e30: negative values (refunds) decay by SIGNED magnitude — " +
      "sign · (|cents|·10^6 div 2^k), identical in div- and " +
      "floor-division engines") {
    import spark.implicits._
    def ts(daysBack: Int) =
      java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 6, 30)
        .minusDays(daysBack).atTime(12, 0))
    val ev = Seq(
      (1L, ts(0), -10.00),  // k=0: -1000 c → -1_000_000_000 µ
      (1L, ts(70), -0.01),  // k=10: -(1e6 div 1024) = -976 µ — a plain
                            // Spark div gives -976 but DuckDB // gives
                            // -977; the magnitude form pins -976 in both
      (2L, ts(7), -0.125),  // cents = floor(-12.5 + 0.5) = -12 (half-up
                            // for negatives too); k=1 → -6_000_000 µ
      (2L, ts(0), 0.125)    // cents = floor(12.5 + 0.5) = 13 → 13e6 µ
    ).toDF("user_id", "ts", "value")
    val got = EventOps.e30From(ev)
      .select($"user_id", $"n_events",
        $"total_cents".cast("long"), $"score_micro".cast("long"))
      .collect().map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(1L, 2L, -1001L, -1000000976L),
      Seq(2L, 2L, 1L, 7000000L)), s"got $got")
  }

  // ------------------------------------------------------------- e31

  private def ts31(day: Int, hour: Int = 12) =
    java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
      .plusDays(day).atTime(hour, 0))

  test("e31: the daily table is a sufficient statistic — fold of " +
      "old-daily ∪ new-daily equals the from-scratch daily-grain " +
      "score, including negative day sums") {
    import spark.implicits._
    val old = Seq(
      (1L, ts31(0), 10.00), (1L, ts31(0, 18), 5.00), // same day, merged
      (1L, ts31(7), 3.00),
      (2L, ts31(0), -0.02))
    val fresh = Seq(
      (1L, ts31(14), 2.00),   // advances as-of: every k shifts
      (2L, ts31(14), 0.01))
    def df(rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      rows.toDF("user_id", "ts", "value")
    val folded = EventOps.e31Daily(df(old))
      .unionByName(EventOps.e31Daily(df(fresh)))
      .groupBy($"user_id", $"d")
      .agg(sum($"n_ev").as("n_ev"), sum($"day_cents").as("day_cents"))
    val got = EventOps.e31Score(folded)
      .select($"user_id", $"n_events",
        $"total_cents".cast("long"), $"score_micro".cast("long"))
      .collect().map(_.toSeq).toSeq
    val scratch = EventOps.e31Score(EventOps.e31Daily(df(old ++ fresh)))
      .select($"user_id", $"n_events",
        $"total_cents".cast("long"), $"score_micro".cast("long"))
      .collect().map(_.toSeq).toSeq
    assert(got == scratch, s"fold diverged from from-scratch:\n$got\n$scratch")
    // hand-computed under as-of = day 14: u1 day0 (1500c, k=2) →
    // 375_000_000; day7 (300c, k=1) → 150_000_000; day14 (200c, k=0) →
    // 200_000_000. u2 day0 (−2c, k=2) → −(2e6 div 4) = −500_000;
    // day14 (1c, k=0) → 1_000_000.
    assert(got == Seq(
      Seq(1L, 4L, 2000L, 725000000L),
      Seq(2L, 2L, -1L, 500000L)), s"got $got")
  }

  test("e31: the daily fold is co-partitioned — the bucketed standing " +
      "side plans zero exchange; only the delta's partials shuffle") {
    import spark.implicits._
    // building the query materializes the standing daily table
    graft.SparkEntry.queries("e31_decayed_day2")(spark, sf)
    val dayT = graft.sources.LayoutOps
      .stateTable("graft_state_e31_daily", sf)
    val fold = EventOps.e31Fold(dayT,
      graft.Tables(spark, sf, "events")
        .select($"event_id", $"user_id", $"ts", $"value").limit(64))
    val joins = physical(fold).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.size == 1, s"expected one fold join:\n${physical(fold)}")
    val standingClean = joins.forall(j =>
      j.children.exists(s => s.toString.contains("graft_state_e31_daily") &&
        !s.toString.contains("Exchange")))
    assert(standingClean,
      s"standing daily side is not exchange-free:\n${joins.head}")
  }

  test("e30: plan stays one scan + two broadcasts + partial agg — the " +
      "weight join must never shuffle") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf, "events")
    val p = EventOps.e30From(ev).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"weight/asof join not broadcast:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, // events feeds both the asof agg and the rows
      s"e30 re-scans the corpus ($scans scans):\n$p")
  }
}
