package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator specs: corpus-derived shard counts (p11),
  * convergence-driven graph rank (q39), hot-entity caps. */
class Round9OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("p11: shard count is derived from the corpus and floors at 8") {
    // below the floor: any corpus under 8 target-shards stays at 8
    assert(PipelineOps.p11ShardCount(0) == 8)
    assert(PipelineOps.p11ShardCount(5000) == 8)
    assert(PipelineOps.p11ShardCount(8 * PipelineOps.P11TargetShardRows) == 8)
    // past the floor: exact ceil division, so every shard's window
    // input is capped at the target row count
    assert(PipelineOps.p11ShardCount(8 * PipelineOps.P11TargetShardRows + 1) == 9)
    assert(PipelineOps.p11ShardCount(1000000) == 40)
    // 100 TB sanity: ~1e11 docs → ~4M shards, each still target-sized
    assert(PipelineOps.p11ShardCount(100000000000L) == 4000000L)
  }

  test("p11: raising the shard count shrinks every per-shard window input") {
    import spark.implicits._
    val synth = spark.range(2000)
      .select($"id".cast("string").as("doc_id"))
    def maxShardRows(shards: Long): (Long, Long) = {
      val df = PipelineOps.p11TrainingOrderFrom(synth, shards)
      val per = df.groupBy($"shard").count()
      (per.agg(max($"count")).as[Long].head(), df.count())
    }
    val (max4, n4) = maxShardRows(4)
    val (max16, n16) = maxShardRows(16)
    assert(n4 == 2000 && n16 == 2000, "permutation must cover every doc")
    assert(max16 < max4,
      s"16 shards should bound the window input below 4 shards ($max16 >= $max4)")
    // hash uniformity keeps the largest shard near corpus/shards
    assert(max16 < 2 * (2000 / 16))
  }

  test("e20: planted bot user collects a capped row with an honest overflow flag") {
    import spark.implicits._
    // one bot with 5000 events, one normal user with 3 — the collected
    // row for the bot must stay bounded at the cap, keep the EARLIEST
    // events, and flag the cut instead of hiding it
    val bot = spark.range(5000).select(
      lit("bot").as("user_id"),
      timestamp_micros(lit(1700000000000000L) + $"id" * 1000000L).as("ts"),
      $"id".as("event_id"),
      when($"id" % 3 === 0, "click").when($"id" % 3 === 1, "view")
        .otherwise("purchase").as("event_type"))
    val human = spark.range(3).select(
      lit("human").as("user_id"),
      timestamp_micros(lit(1700000000000000L) + $"id" * 1000000L).as("ts"),
      ($"id" + 10000).as("event_id"),
      lit("click").as("event_type"))
    val res = EventOps.e20PatternMatchFrom(bot.unionByName(human), cap = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    val b = res("bot")
    assert(b.getLong(1) == 5000, "true event count must survive the cut")
    assert(b.getString(2).length == 100, "collected row must be capped")
    assert(b.getBoolean(5), "overflow must be flagged")
    // keep-earliest: the first 100 events by ts are ids 0..99, whose
    // initials cycle c,v,p — the capped sequence is exactly that prefix
    assert(b.getString(2) == "cvp" * 33 + "c")
    val h = res("human")
    assert(h.getLong(1) == 3 && h.getString(2) == "ccc" && !h.getBoolean(5))
  }

  test("e20: the window pre-filter and the collect share ONE hash exchange") {
    val df = graft.SparkEntry.queries("e20_pattern_match")(spark, sf)
    // the row_number cap must not buy a second shuffle: the groupBy's
    // required hashpartitioning(user_id) is satisfied by the window's
    val hashEx = physical(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    assert(hashEx.size == 1,
      s"expected one hash exchange on user_id, got ${hashEx.size}")
  }

  test("p12: funnel is monotone, stages reconcile with standalone operators") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("p12_corpus_funnel")(spark, sf)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // doc counts shrink monotonically through the doc-level stages
    val chain = Seq("input", "quality", "exact_dedup", "near_dedup",
      "decontaminated", "mixture_sampled").map(rows(_)._1)
    assert(chain.zip(chain.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: $chain")
    assert(chain.last > 0, "funnel emptied — vacuous")
    // packed tokens conserve stage-6 tokens exactly (packing drops nothing)
    assert(rows("packed")._2 == rows("mixture_sampled")._2)
    // the shard count is p11's formula over the stage-6 survivors
    assert(rows("training_order")._1 ==
      PipelineOps.p11ShardCount(rows("mixture_sampled")._1))
  }

  test("p12: document text never rides a shuffle") {
    val df = PipelineOps.p12CorpusFunnelPlan(spark, sf, checkpoint = false)
    val exchanges = physical(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected shuffles in the funnel plan")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name)
      assert(!cols.contains("text"),
        s"document text rides a shuffle: $cols")
    }
  }

  test("q39: loop reaches an exact integer fix-point within the cap") {
    import spark.implicits._
    val res = graft.SparkEntry.queries("q39_graph_converge")(spark, sf).collect()
    assert(res.length == 50)
    val rounds = res.map(_.getInt(3)).distinct
    assert(rounds.length == 1, "rounds must be a constant column")
    assert(rounds.head < RelationalOps.Q39MaxRounds,
      s"hit the round cap (${rounds.head}) — convergence never exercised")
    assert(res.forall(_.getLong(2) >= 125L), "damping floor violated")
    // independent fix-point proof: re-run the superstep chain and show
    // one FURTHER superstep leaves the full vector bit-identical
    val edges = RelationalOps.q39Edges(spark, sf)
    var ranks = edges.groupBy($"u").agg(count(lit(1)).as("deg"))
      .select($"u".as("node"), $"deg", (lit(250L) * $"deg").as("rank"))
    for (_ <- 1 to rounds.head)
      ranks = RelationalOps.q39Superstep(edges, ranks).localCheckpoint()
    val again = RelationalOps.q39Superstep(edges, ranks)
    val moved = again.select($"node", $"rank")
      .join(ranks.select($"node", $"rank".as("prev")), Seq("node"))
      .filter($"rank" =!= $"prev")
    assert(moved.isEmpty, "vector still moving past the reported fix-point")
  }

  test("q39: superstep probes the bucketed edges exchange-free") {
    import spark.implicits._
    val edges = RelationalOps.q39Edges(spark, sf)
    val step = RelationalOps.q39Superstep(
      edges, edges.groupBy($"u").agg(count(lit(1)).as("deg"))
        .select($"u".as("node"), $"deg", (lit(250L) * $"deg").as("rank")))
    val shjs = physical(step).collect { case j: ShuffledHashJoinExec => j }
    assert(shjs.size == 1, s"expected one shuffle-hash join, got ${shjs.size}")
    val clean = shjs.forall(j => Seq(j.left, j.right).exists(s =>
      s.toString.contains("graft_state_q39_edges") &&
        !s.toString.contains("Exchange")))
    assert(clean, "edges probe side plans an exchange — bucketing lost")
  }

  test("s13: recall@K reconciles with a direct set comparison of s1 vs s3") {
    import spark.implicits._
    val exact = graft.SparkEntry.queries("s1_knn_brute")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val approx = graft.SparkEntry.queries("s3_knn_ivf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val rows = graft.SparkEntry.queries("s13_recall_eval")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (q, nTrue, nHit, milli) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTrue == 10, "ground truth must be full K")
      val want = (exact(q) intersect approx.getOrElse(q, Set.empty)).size
      assert(nHit == want, s"query $q: recall hits $nHit != direct $want")
      assert(milli == nHit * 1000 / nTrue)
    }
    // the eval is informative: the approximate index must be neither
    // perfect (else the planted nprobe tradeoff vanished) nor useless
    val total = rows.map(_.getLong(2)).sum
    assert(total > 30 && total < 100, s"degenerate recall total $total")
  }

  test("t19: integer surprise bits separate fluent text from garble") {
    import spark.implicits._
    // 50 fluent docs reuse the same transitions; one garble doc hits
    // only rare continuations — its bits-per-trigram must be higher
    val fluent = spark.range(50).select(
      $"id".as("doc_id"), lit("the cat sat on the mat and ran").as("text"))
    val garble = spark.range(1).select(
      lit(999L).as("doc_id"), lit("xq zvk wjf qpy hxz bnq").as("text"))
    val res = TextOps.t19LmSurpriseFrom(fluent.unionByName(garble))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(res.values.forall(_._1 >= 0), "bit gaps are nonnegative by c2 >= c3")
    val fluentMilli = res(0L)._2
    val garbleMilli = res(999L)._2
    assert(garbleMilli > fluentMilli,
      s"garble ($garbleMilli) must out-surprise fluent text ($fluentMilli)")
  }

  test("e21: planted purchases attribute to last touch within the hour, else organic") {
    import spark.implicits._
    val t0 = 1700000000000000L
    def ev(id: Long, user: String, tp: String, usOff: Long, v: Double) =
      (id, user, tp, t0 + usOff, v)
    val rows = Seq(
      ev(1, "a", "click", 0L, 0.0),
      ev(2, "a", "purchase", 30L * 60 * 1000000, 10.0),  // 30 min → click
      ev(3, "a", "purchase", 3L * 3600 * 1000000, 20.0), // 3 h → organic
      ev(4, "b", "view", 1000L, 0.0),
      ev(5, "b", "purchase", 1000L, 40.0))               // same ts → view
    val df = rows.toDF("event_id", "user_id", "event_type", "us", "value")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros($"us").as("ts"), $"value")
    val got = EventOps.e21AttributionFrom(df)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(
      "click" -> (1L, 10.0), "organic" -> (1L, 20.0), "view" -> (1L, 40.0)))
  }

  test("m7: modality pre-filter returns full K where post-filtering cannot") {
    import spark.implicits._
    val imgIds = graft.Tables(spark, sf, "documents")
      .filter($"n_chars" % 3 === 0).select($"doc_id").as[Long].collect().toSet
    val rows = graft.SparkEntry.queries("m7_crossmodal_knn")(spark, sf).collect()
    assert(rows.length == 50, "every query must get full K=5")
    assert(rows.forall(r => imgIds(r.getLong(1))),
      "a non-image asset leaked through the modality filter")
    // the naive composition (unfiltered top-5, then WHERE image)
    // under-returns: most nearest neighbors are audio/video
    val post = graft.SparkEntry.queries("s1_knn_brute")(spark, sf)
      .filter($"rnk" <= 5).collect()
      .count(r => imgIds(r.getLong(1)))
    assert(post < 50, s"post-filter kept $post rows — planted case lost")
  }

  test("q41: additive IVM merge equals the from-scratch aggregate; calls are idempotent") {
    import spark.implicits._
    val first = graft.SparkEntry.queries("q41_ivm_day2")(spark, sf)
      .collect().map(_.toSeq)
    // the standing summary holds only the day-1 (standing) side: the
    // delta fold-in is read-time, so repeated calls never double-count
    val again = graft.SparkEntry.queries("q41_ivm_day2")(spark, sf)
      .collect().map(_.toSeq)
    assert(first.sameElements(again), "IVM read must be idempotent")
    val aggT = graft.sources.LayoutOps.stateTable("graft_state_q41_agg", sf)
    val standingRows = spark.table(aggT).agg(sum($"n_rows")).as[Long].head()
    val totalRows = graft.Tables(spark, sf, "lineitem").count()
    assert(standingRows < totalRows,
      "standing summary must exclude the day-2 batch")
    // merged output reconciles with the full fact table, group by group
    val counts = first.map(r => (r(0), r(1)) -> r(2).asInstanceOf[Long]).toMap
    val direct = graft.Tables(spark, sf, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus").count()
      .collect().map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    assert(counts == direct, "merged counts diverge from from-scratch")
  }

  test("q40: day-2 maintained dimension equals a from-scratch rebuild") {
    import spark.implicits._
    // run the shipped path: init(v0,v1) + MERGE(v2)
    graft.SparkEntry.queries("q40_scd2_day2")(spark, sf).collect()
    val maintained = graft.sources.LayoutOps
      .stateTable("graft_state_q40_dim", sf)
    // rebuild from scratch with all three versions at once
    val rebuilt = "q40_rebuild_spec"
    spark.sql(s"DROP TABLE IF EXISTS $rebuilt")
    Scd2Ops.initDim(spark, rebuilt,
      RelationalOps.q40DimVersions(spark, sf, Seq(0, 1, 2)))
    def rows(t: String) = spark.table(t)
      .collect().map(_.toSeq).toSet
    assert(rows(maintained) == rows(rebuilt),
      "MERGE path diverged from the from-scratch dimension")
    spark.sql(s"DROP TABLE $rebuilt")
    // and the lookup result is byte-identical to q38's inline form
    val got = graft.SparkEntry.queries("q40_scd2_day2")(spark, sf)
      .collect().map(_.toSeq)
    val want = graft.SparkEntry.queries("q38_scd2_pit")(spark, sf)
      .collect().map(_.toSeq)
    assert(got.sameElements(want))
  }

  test("Scd2Ops: intra-day churn collapses to end-of-day state, one current row per key") {
    import spark.implicits._
    val tbl = "scd2_churn_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def ts(us: Long) = timestamp_micros(lit(us))
    Scd2Ops.initDim(spark, tbl, Seq((1L, "A#0", 1000L), (2L, "B#0", 1000L))
      .toDF("k", "seg_v", "us")
      .select($"k", $"seg_v", timestamp_micros($"us").as("valid_from")))
    // key 1 churns twice in one batch; only the LATEST version lands
    Scd2Ops.upsertDim(spark, tbl,
      Seq((1L, "A#1", 2000L), (1L, "A#2", 3000L))
        .toDF("k", "seg_v", "us")
        .select($"k", $"seg_v", timestamp_micros($"us").as("valid_from")))
    val cur = spark.table(tbl).filter($"is_current")
      .select($"k", $"seg_v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur == Map(1L -> "A#2", 2L -> "B#0"),
      s"end-of-day state wrong: $cur")
    assert(spark.table(tbl).count() == 3, "exactly one new version per churned key")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("q40: fact lookup probes the bucketed dimension exchange-free") {
    val df = graft.SparkEntry.queries("q40_scd2_day2")(spark, sf)
    val shjs = physical(df).collect { case j: ShuffledHashJoinExec => j }
    assert(shjs.size == 1, s"expected one shuffle-hash join, got ${shjs.size}")
    val clean = shjs.forall(j => Seq(j.left, j.right).exists(s =>
      s.toString.contains("graft_state_q40_dim") &&
        !s.toString.contains("Exchange")))
    assert(clean, "dimension side plans an exchange — bucketing lost")
  }

  test("t20: BM25 ranks rare terms and short docs first (planted corpus)") {
    import spark.implicits._
    // 'apple' is rare (df=2), 'banana' common (df=3). doc 10 matches both
    // and is short; doc 12 matches apple with the same tf but 4x the
    // length; docs 11/13 match only the common term.
    val docs = Seq(
      (10L, "apple banana"),
      (11L, "banana banana banana banana banana banana banana banana"),
      (12L, "apple cherry date egg fig grape kiwi lemon"),
      (13L, "banana cherry")).toDF("doc_id", "text")
    val q = Seq((0L, "apple"), (0L, "banana")).toDF("qid", "term")
    val got = TextOps.t20Bm25From(docs, q)
      .select($"rank", $"doc_id").as[(Int, Long)].collect().toSeq
    assert(got.head == (1, 10L), s"rare+short doc must rank first: $got")
    // length normalization: same tf('apple'), dl 2 vs 8
    val byDoc = got.toMap.map(_.swap)
    assert(byDoc(10L) < byDoc(12L), s"shorter doc must outrank longer: $got")
    // idf: the apple-only long doc still beats banana-only docs
    assert(byDoc(12L) < byDoc(11L) && byDoc(12L) < byDoc(13L),
      s"rare-term match must outrank common-term matches: $got")
  }

  test("t20: query side broadcasts; no cartesian beyond the 1-row stats") {
    val df = graft.SparkEntry.queries("t20_bm25")(spark, sf)
    val plan = physical(df)
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "the (qid, term, df) probe side must broadcast")
    val cart = plan.collect { case c: CartesianProductExec => c }
    assert(cart.isEmpty, "stats must join as a broadcast, never cartesian")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getLong(0)).distinct.length == 3,
      "all three derived queries must return results at sf0.001")
  }

  test("s14: kNN graph is blocked (no cartesian), deduped, and well-ranked") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("s14_knn_graph")(spark, sf)
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    assert(physical(df).collect { case c: CartesianProductExec => c }.isEmpty,
      "the self-join must block on the band bucket, never all-pairs")
    val rows = df.select($"qid", $"rnk", $"nid", $"cos_micro")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // a dual-band hit must not produce a duplicate edge
    assert(rows.map(r => (r._1, r._3)).distinct.size == rows.size,
      "duplicate (qid, nid) edge survived the band union")
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to g.size), s"ranks not contiguous for $qid")
      assert(sorted.map(_._4).sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }, s"cos_micro not non-increasing for $qid")
    }
    // true recall@5 vs the exact graph (the corpus is near-uniform —
    // LSH's worst case — so the floor is deliberately modest; 4 bands
    // measure ~0.44 here at ~23% of the all-pairs scoring cost)
    import graft.functions.EngineFns.{dot, micro, registerAll}
    registerAll(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot($"v", $"v")))
    val exW = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos_micro".desc, $"nid".asc)
    val exact = e.select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"))
      .join(e.select($"vec_id".as("nid"), $"v".as("nv"), $"nrm".as("nnrm")),
        $"qid" =!= $"nid")
      .select($"qid", $"nid",
        micro(dot($"qv", $"nv") / ($"qnrm" * $"nnrm")).as("cos_micro"))
      .withColumn("rnk", row_number().over(exW)).filter($"rnk" <= 5)
      .select($"qid", $"nid")
    val nExact = exact.count()
    val hit = df.select($"qid", $"nid").join(exact, Seq("qid", "nid"),
      "left_semi").count()
    val recall = hit.toDouble / nExact
    assert(recall > 0.35, s"recall@5 vs exact graph too low: $recall")
  }

  test("s15: RRF fuses both lists; dual-list docs outrank equal single hits") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("s15_hybrid_rrf")(spark, sf)
      .select($"qid", $"rank", $"doc_id", $"rrf_micro", $"n_lists")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.map(_._1).distinct.sorted == Seq(0L, 1L, 2L))
    // fusion math: a doc in both lists carries the sum of both
    // contributions — verify the exact integer identity for every row
    // against the two input rankings recomputed here
    val lex = TextOps.t20Bm25(spark, sf)
      .select($"qid", $"doc_id", $"rank").as[(Long, Long, Int)]
      .collect().map { case (q, d, r) => (q, d) -> (1000000L / (60 + r)) }.toMap
    rows.foreach { case (q, _, d, micro, nLists) =>
      val fromLex = lex.get((q, d))
      assert(nLists >= 1 && nLists <= 2)
      if (nLists == 2)
        assert(fromLex.exists(_ < micro), s"dual-list doc ($q,$d) must sum both")
    }
    // every query's fused list must actually contain a vector-only hit
    // or a lexical-only hit somewhere — i.e. fusion isn't degenerate
    assert(rows.exists(_._5 == 1), "all fused docs claim both lists — suspicious")
  }

  test("q42: merged KMV sketch is bit-identical to from-scratch, and idempotent") {
    val fromScratch = graft.SparkEntry.queries("q33_kmv_sketch")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val merged1 = graft.SparkEntry.queries("q42_kmv_day2")(spark, sf)
      .collect().map(_.toSeq).toSeq
    // KMV theorem: min-k(min-k(A) ∪ min-k(B)) == min-k(A ∪ B)
    assert(merged1 == fromScratch,
      s"merge diverged from from-scratch:\n$merged1\nvs\n$fromScratch")
    // the read is idempotent: the standing state was written once and
    // the delta never persists, so a second call cannot drift
    val merged2 = graft.SparkEntry.queries("q42_kmv_day2")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(merged2 == merged1, "second read drifted — state not idempotent")
    // scale guard: bottom-k must come from the bounded aggregator, not a
    // per-group window (a window sorts a group's every distinct hash in
    // one task — corpus-sized at 100 TB; the aggregator's buffer caps at
    // k longs and combines map-side)
    val plan = physical(graft.SparkEntry.queries("q42_kmv_day2")(spark, sf))
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"q42 must not sort per-group via a window: $windows")
  }

  test("q43: planted violations are counted per check, clean tables audit zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    val ts = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    Seq(
      (1L, 1, 5.0, 0.5, Option(ts)),   // ok, but duplicated PK below
      (1L, 1, 5.0, 0.5, Option(ts)),   // dup of (1,1)
      (2L, 1, -3.0, 1.5, Option.empty[java.sql.Timestamp]), // bad qty+disc+null ship
      (99L, 1, 2.0, 0.0, Option(ts)))  // orphan orderkey
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 10L, 100.0), (1L, 10L, 50.0), // dup PK
        (2L, 77L, 30.0),                   // orphan custkey
        (3L, 11L, -5.0))                   // bad price
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "Alice"), (11L, "")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    val got = RelationalOps.q43QualityAudit(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("lineitem_quantity_positive") == (1L, 4L))
    assert(got("lineitem_discount_in_range") == (1L, 4L))
    assert(got("lineitem_shipdate_not_null") == (1L, 4L))
    assert(got("lineitem_pk_unique") == (2L, 4L), "both dup rows count")
    assert(got("lineitem_orderkey_refs_orders") == (1L, 4L))
    assert(got("orders_pk_unique") == (2L, 4L))
    assert(got("orders_totalprice_positive") == (1L, 4L))
    assert(got("orders_custkey_refs_customer") == (1L, 4L))
    assert(got("customer_name_not_null") == (1L, 2L))
    // the real corpus: 8 checks audit clean, and the audit correctly
    // surfaces the testdata's one real quirk — (l_orderkey,
    // l_linenumber) is NOT unique in the synthetic lineitem. Cross-check
    // the reported count against an independent computation.
    val real = graft.SparkEntry.queries("q43_quality_audit")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(real.size == 9)
    assert(real.filterNot(_._1 == "lineitem_pk_unique").values.forall(_ == 0L),
      s"unexpected violations in testdata: $real")
    val trueDups = graft.Tables(spark, sf, "lineitem")
      .groupBy($"l_orderkey", $"l_linenumber").count()
      .filter($"count" > 1).agg(sum($"count")).as[Long].head()
    assert(real("lineitem_pk_unique") == trueDups,
      s"audit miscounted dup PK rows: ${real("lineitem_pk_unique")} vs $trueDups")
  }

  test("p13: no near-dup pair straddles the train/holdout split") {
    import spark.implicits._
    val split = graft.SparkEntry.queries("p13_leakage_split")(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(split.size == nDocs, "every document must be assigned a split")
    // the contamination check a per-doc coin fails: every LSH near-dup
    // pair must land on the same side
    val pairs = DedupOps.d4MinhashLsh(spark, sf)
      .select($"i", $"j").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus should contain near-dup pairs")
    val straddling = pairs.filter { case (i, j) => split(i) != split(j) }
    assert(straddling.isEmpty, s"leaking pairs: ${straddling.take(5).toSeq}")
    // and the coin is honest: holdout is a real, minority slice
    val holdout = split.values.count(_ == "holdout")
    assert(holdout > 0 && holdout < nDocs / 4,
      s"holdout fraction off: $holdout of $nDocs")
  }

  test("q39: per-round checkpoints are released (no storage leak)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    graft.SparkEntry.queries("q39_graph_converge")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val leaked = (sc.getPersistentRDDs.keySet -- before).toSeq.sorted
    // ONE retained block allowed: the eager checkpoint backing the
    // returned frame; every round's vector and deg must be gone.
    assert(leaked.size <= 1, s"leaked persistent RDDs: $leaked")
    leaked.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = true)))
  }
}
