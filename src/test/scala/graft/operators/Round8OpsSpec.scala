package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operator specs: BPE pair counting (t18), hopping-window
  * distinct (e19), market share (q36), filtered ANN (s12). */
class Round8OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("t18: vocab-collapsed pair counts equal the direct per-occurrence count") {
    import spark.implicits._
    // the Zipf collapse (count pairs over DISTINCT words weighted by
    // frequency) must be a pure optimization: recompute the same top
    // merges straight off the raw token stream and compare.
    val direct = graft.Tables(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word)-1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"pair".asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = graft.SparkEntry.queries("t18_bpe_merges")(spark, sf)
      .orderBy($"rnk")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == direct, "vocab-weighted counts diverge from direct counts")
  }

  test("e19: every event lands in exactly 4 hopping windows") {
    import spark.implicits._
    val res = graft.SparkEntry.queries("e19_hopping_distinct")(spark, sf)
    val nEvents = graft.Tables(spark, sf, "events").count()
    val windowed = res.agg(sum($"n_events")).as[Long].head()
    assert(windowed == 4 * nEvents,
      s"explode factor broken: $windowed != 4 * $nEvents")
    // distinctness is real: no window reports more users than events
    assert(res.filter($"n_users" > $"n_events").isEmpty)
  }

  test("q36: one fact-fact shuffle join; no forced broadcast on linear sides") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q36_market_share")(spark, sf)
    // broadcast HINTS may only sit on provably-constant sides (nation,
    // region, the PROMO part slice). A hint on a customer- or
    // supplier-derived frame forces a broadcast that grows with the
    // corpus — a plan that fails outright at 100× — and also disables
    // the AQE size check that would otherwise protect it.
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.nonEmpty, "constant-size dimension broadcasts should remain hinted")
    hints.foreach { h =>
      val cols = h.child.output.map(_.name)
      assert(!cols.exists(c =>
          c.startsWith("c_") || c.startsWith("s_") || c.startsWith("supp_")),
        s"forced broadcast on a corpus-proportional side: $cols")
    }
    val plan = physical(df)
    val shuffled = plan.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    // at spec SF the un-hinted linear sides are still stats-small, so
    // Catalyst broadcasts them on its own and the only exchange-backed
    // join left is the lineitem⋈orders fact join
    assert(shuffled.size == 1,
      s"expected exactly one shuffle join (lineitem⋈orders), got ${shuffled.size}")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 3,
      "dimension chain should broadcast")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, nation, share) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nation >= 0 && nation <= total)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q37: superstep joins are shuffle-hash with the bucketed edges side exchange-free") {
    val df = RelationalOps.q37GraphRankPlan(spark, sf, checkpoint = false)
    val shjs = physical(df).collect { case j: ShuffledHashJoinExec => j }
    assert(shjs.size == 2, s"expected one shuffle-hash join per superstep, got ${shjs.size}")
    shjs.foreach { j =>
      // the rank side's lineage ALSO reads the edges table (deg/ranks
      // derive from it) and legitimately exchanges; the property is
      // that the raw edges PROBE side — the bucketed scan — plans no
      // exchange at all
      val clean = Seq(j.left, j.right).exists(s =>
        s.toString.contains("graft_state_q37_edges") &&
          !s.toString.contains("Exchange"))
      assert(clean,
        s"no exchange-free bucketed edges side on superstep join:\n$j")
    }
  }

  test("q37: two damped supersteps produce bounded, ordered integer ranks") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q37_graph_rank")(spark, sf).collect()
    assert(rows.length == 50)
    val ranks = rows.map(_.getLong(2))
    assert(ranks.sameElements(ranks.sortBy(-_)), "not rank-descending")
    // every node keeps at least the damping floor, exactly as the
    // integer recurrence guarantees (150000 + a non-negative term)
    assert(ranks.forall(_ >= 150000L))
    assert(rows.map(_.getLong(1)).distinct.length == 50, "duplicate nodes")
  }

  test("q38: SCD2 lookup plans as union+window — zero join nodes, every order matched") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q38_scd2_pit")(spark, sf)
    // the naive BETWEEN range join plans a nested-loop probe; the union
    // form must contain NO join operator of any kind
    val joins = physical(df).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"expected join-free union+window plan, got ${joins.map(_.nodeName)}")
    // version validity covers every order date (v0 starts before the
    // first order), so no fact row may be lost or double-counted
    val matched = df.agg(sum($"n_orders")).as[Long].head()
    val nOrders = graft.Tables(spark, sf, "orders").count()
    assert(matched == nOrders, s"$matched matched of $nOrders orders")
  }

  test("e20: sequence string is complete and conversions are bounded by their letters") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("e20_pattern_match")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, seq, conv) = (r.getLong(1), r.getString(2), r.getLong(3))
      assert(seq.length == math.min(n, EventOps.E20MaxEventsPerUser),
        "sequence must contain every event up to the hot-entity cap")
      assert(r.getBoolean(5) == (n > EventOps.E20MaxEventsPerUser))
      val (cs, ps) = (seq.count(_ == 'c'), seq.count(_ == 'p'))
      assert(conv <= math.min(cs, ps),
        s"conversions $conv exceed clicks=$cs or purchases=$ps")
      assert(r.getBoolean(4) == (conv > 0))
    }
    assert(rows.exists(_.getLong(3) > 0), "no conversions anywhere — vacuous")
  }

  test("s12: pre-filter returns full K per query where post-filtering s3 cannot") {
    import spark.implicits._
    val s12 = graft.SparkEntry.queries("s12_knn_filtered")(spark, sf)
      .select($"qid", $"nid").collect()
    // every query gets exactly K rows, all passing the predicate
    assert(s12.length == 100, s"expected 10 queries x K=10, got ${s12.length}")
    assert(s12.forall(_.getLong(1) % 2 == 0), "candidate failed the filter")
    // the naive composition (unfiltered ANN, then WHERE) under-returns:
    // some true top-K neighbor is odd, so post-filtering drops below K
    val postFiltered = graft.SparkEntry.queries("s3_knn_ivf")(spark, sf)
      .filter($"nid" % 2 === 0).count()
    assert(postFiltered < s12.length,
      s"post-filter kept $postFiltered rows — planted case lost, spec is vacuous")
  }
}
