package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the properties that make these queries scale are
  * asserted on the optimized physical plans, so a refactor that silently
  * loses pushdown/broadcast/partial-agg fails CI, not a 100 TB run. */
class ScaleSpec extends AnyFunSuite {
  import SharedSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(FormattedMode)

  test("q2: filters and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"predicates not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    // only the needed columns are read (6 of 16: 4 output + 2 filter-only)
    assert("ReadSchema: struct<[^>]*>".r.findFirstIn(p).get.count(_ == ',') == 5,
      s"read schema too wide:\n$p")
  }

  test("q3: dimension joins broadcast; no dimension-side shuffle") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dimension join should not sort-merge:\n$p")
  }

  test("q1: aggregation is partial (map-side) before the exchange") {
    val p = plan("q1_agg")
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && p.indexOf("HashAggregate", aggIdx + 1) > aggIdx,
      s"expected two-phase aggregate:\n$p")
  }

  test("q4: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q4_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("d3: gram self-join is shuffle-hash, never a broadcast of the stream") {
    // AQE wraps everything in AdaptiveSparkPlan, so asserting on the plan
    // string being "adaptive" is vacuous. Look inside the initial plan for
    // the join nodes themselves: the hinted gram self-join must be
    // shuffle-hash (one exchange, reused for both sides) and the gram
    // stream must not appear under a BroadcastExchange.
    val p = SparkEntry.queries("d3_ngram_jaccard")(spark, sf).queryExecution
      .executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"gram stream must not be broadcast:\n$p")
  }

  test("salted join returns exactly the rows of the plain join") {
    import org.apache.spark.sql.functions._
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").collect().toSet
    val salted = graft.operators.SkewOps.saltedJoin(
        orders, customer, col("o_custkey"), col("c_custkey"), 8)
      .select("o_orderkey", "c_custkey").collect().toSet
    assert(salted == plain)
  }

  test("p1: pipeline dedup stages are hash aggregates — no window sort anywhere") {
    val p = SparkEntry.queries("p1_prep_pipeline")(spark, sf).queryExecution
      .executedPlan.toString
    assert(!p.contains("Window"),
      s"p1 must keep-first/keep-best via min_by/max_by aggregates, not window sorts:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in p1:\n$p")
  }

  test("p2/p3: hash-sampling and chunking are map-side — no hash shuffle") {
    for (q <- Seq("p2_hash_sample", "p3_chunk_windows")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution
        .executedPlan.toString
      // the only exchange allowed is the output sort's range partitioning
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle on a hash key:\n$p")
    }
  }

  test("t15: quality rules are one map pass — no hash shuffle, no window") {
    // the top-token frequency is computed inside the row (nested lambda),
    // not via explode + shuffled re-aggregation; the only exchange is the
    // output sort's range partitioning
    val p = SparkEntry.queries("t15_gopher_rules")(spark, sf).queryExecution
      .executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"t15 must not shuffle on a hash key:\n$p")
    assert(!p.contains("Window"), s"t15 must not use a window:\n$p")
  }

  test("p5: rank window sorts only the histogram-cut sliver, never the full stratum") {
    import org.apache.spark.sql.functions._
    // 1. plan shape: the per-stratum cut filter sits BELOW the rank
    // window — the window's sort input is the post-cut sliver, so no
    // full-stratum row stream ever enters a sort.
    val p = SparkEntry.queries("p5_stratified_quota")(spark, sf)
      .queryExecution.executedPlan.toString
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0 && p.indexOf("cut_b", wIdx) > wIdx,
      s"no histogram cut below the rank window:\n$p")
    // 2. the sliver really is a sliver: ≈ Quota + bucket occupancy per
    // stratum (never the stratum), yet still covers the quota.
    val slv = graft.operators.PipelineOps.p5Sliver(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables(spark, sf, "documents").groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      val s = slv.getOrElse(lang, 0L)
      assert(s >= math.min(40L, n), s"sliver misses quota for $lang: $s of $n")
      assert(s <= math.min(n, 40L + 8L * (n >> 12) + 64L),
        s"sliver not a sliver for $lang: $s of $n rows")
    }
    // 3. output identity with the declarative full-window formulation
    import graft.functions.EngineFns.md5Long
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h").asc, col("doc_id").asc)
    val legacy = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        md5Long(concat(col("doc_id").cast("string"), lit(":strat"))).as("h"))
      .withColumn("strat_rank", row_number().over(w).cast("int"))
      .filter(col("strat_rank") <= 40)
      .select(col("lang"), col("strat_rank"), col("doc_id"), col("h"))
      .collect().map(_.toString).sorted.toSeq
    val got = SparkEntry.queries("p5_stratified_quota")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got == legacy)
  }

  test("m5: frame-sig self-join is shuffle-hash, never a broadcast of the frame stream") {
    // the shipped query checkpoints its (persisted-subtree) result, which
    // collapses the plan string to an RDD scan — audit the un-persisted
    // plan builder instead
    val p = graft.operators.MultimodalOps.m5Plan(spark, sf).queryExecution
      .executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin:\n$p")
    assert(!p.contains("CartesianProduct"), s"m5 degraded to cartesian:\n$p")
  }

  test("s8: shortlist broadcasts into the re-rank scan; corpus is never broadcast") {
    // The re-rank stage must be a BroadcastHashJoin with the tiny
    // (qid, nid) shortlist on the build side — if the corpus scan ever
    // becomes the broadcast side (or the join degrades to a cartesian),
    // the second pass stops being a map-side point fetch and re-ranking
    // is no longer free at scale.
    val p = SparkEntry.queries("s8_knn_rerank")(spark, sf).queryExecution
      .executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"expected shortlist BroadcastHashJoin:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"re-rank join degraded:\n$p")
  }

  test("e6: bucketed range join is an equi-join, never a cartesian product") {
    val p = SparkEntry.queries("e6_range_join")(spark, sf).queryExecution
      .executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian product in e6:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in e6 (range predicate not riding the bucket equi-key?):\n$p")
  }

  test("q25: positions join has no broadcast hint; ranked side never broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // the generic exactPercentiles API must not pin `need` to the driver
    // with an unconditional hint — AQE decides at runtime
    val df = SparkEntry.queries("q25_percentiles")(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, s"unexpected join hints in q25 plan: $hints")
    // Simulate "every side is too big to broadcast" (threshold -1, AQE
    // off): with no hint pinning a side, the whole plan must fall back to
    // shuffle joins. At test SF the planner MAY broadcast either side by
    // size — that's correct size-based behavior, not a hint — so the
    // guard is that nothing survives when size-based broadcast is off.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("q25_percentiles")(spark, sf)
        .queryExecution.executedPlan
      val bad = p.collect { case b: BroadcastExchangeExec => b }
      assert(bad.isEmpty, s"hint-pinned broadcast in q25:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }

  test("q25: percentile rank sort is bucket-local (distributed selection), never per-group") {
    val p = SparkEntry.queries("q25_percentiles")(spark, sf)
      .queryExecution.executedPlan.toString
    // the row_number window must partition by (group, __pct_b bucket) and
    // order by the value — i.e. the only sort over data rows is the
    // needed-buckets sliver, parallel across buckets; a window spec of
    // this shape cannot be the old full-group rank
    val bucketLocal = "row_number\\(\\)[^\\n]*__pct_b[^\\n]*__pct_v".r
    assert(bucketLocal.findFirstIn(p).isDefined,
      s"rank window not partitioned by selection bucket:\n$p")
  }

  test("q52: no broadcast hint on any deletion-batch-derived frame") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // affected sizes with the DELETION BATCH (a GDPR sweep = millions of
    // labels) — a hard broadcast hint there OOMs the driver at exactly
    // the scale q52Fold's doc targets. AQE must decide at runtime.
    val removed = Seq((1L, 2L)).toDF("a", "b")
    val survived = Seq((3L, 4L), (1L, 5L)).toDF("a", "b")
    val standing = Seq((1L, 1L), (3L, 3L), (5L, 1L)).toDF("id", "lbl")
    val (affected, affEdges) =
      graft.operators.RelationalOps.q52AffectedEdges(removed, survived, standing)
    Seq(affected, affEdges).foreach { df =>
      val bcast = df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
      assert(bcast.isEmpty, s"broadcast hint on deletion-derived frame: $bcast")
    }
    // q25's shape: with size-based broadcast off and AQE off, nothing may
    // survive as a BroadcastExchange — proof no hint pins a side.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = graft.operators.RelationalOps
        .q52AffectedEdges(removed, survived, standing)._2
        .queryExecution.executedPlan
      val bad = p.collect { case b: BroadcastExchangeExec => b }
      assert(bad.isEmpty, s"hint-pinned broadcast in q52 repair path:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }

  test("d8 label propagation frees superseded checkpoints (no per-round leak)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    SparkEntry.queries("d8_dup_clusters")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val leaked = (sc.getPersistentRDDs.keySet -- before).toSeq.sorted
    // exactly ONE retained block is allowed: the checkpointed final
    // result (it backs the returned frame); every round's label table
    // and the edge cache must already be gone.
    assert(leaked.size <= 1, s"leaked persistent RDDs: $leaked")
    leaked.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = true)))
  }

  test("salted join spreadDuplicates: duplicate-heavy hot key spreads over min(k,n) buckets, rows preserved") {
    import org.apache.spark.sql.functions._
    import graft.operators.SkewOps
    // 64 byte-identical copies of one hot-key row + 10 distinct rows
    val big = spark.range(64).select(lit(1L).as("k"), lit("dup").as("payload"))
      .union(spark.range(2, 12).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("payload")))
    val small = spark.range(1, 12).select(col("id").as("k2"),
      concat(lit("dim"), col("id")).as("attr"))
    // multiset identity with the plain join (duplicates must survive)
    val proj = Seq("k", "payload", "attr")
    val plain = big.join(small, col("k") === col("k2"))
      .select(proj.map(col): _*).collect().map(_.toString).sorted.toSeq
    val salted = SkewOps.saltedJoin(big, small, col("k"), col("k2"), 8,
        spreadDuplicates = true)
      .select(proj.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    // content-hash alone sends all 64 identical copies to ONE bucket...
    val noSpread = big.withColumn("s", SkewOps.saltExpr(big, 8, spreadDuplicates = false))
      .filter(col("k") === 1).select("s").distinct().count()
    assert(noSpread == 1L)
    // ...spreadDuplicates numbers them 1..64, hitting all min(64,8)=8
    val spread = big.withColumn("s", SkewOps.saltExpr(big, 8, spreadDuplicates = true))
      .filter(col("k") === 1).select("s").distinct().count()
    assert(spread == 8L, s"expected 8 salt buckets for 64 duplicates, got $spread")
  }

  test("planted 1000x hot key: AQE skew split fires unsalted; salting composes cleanly") {
    import org.apache.spark.sql.functions._
    import graft.operators.SkewOps
    // one key carries 50k rows, a thousand cold keys carry one each
    val big = spark.range(50000)
      .select(lit(1L).as("k"), concat(lit("p"), col("id")).as("p"))
      .union(spark.range(2, 1002)
        .select(col("id").as("k"), lit("cold").as("p")))
    val dim = spark.range(1, 1002).select(col("id").as("k2"),
      concat(lit("d"), col("id")).as("attr"))
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled to the test frame so the 50k-row partition
      // counts as skewed against its ~1-row siblings
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      // UNSALTED: AQE alone must detect and split the skewed partition.
      // collect() (not count()) so THIS Dataset's QueryExecution runs and
      // its AdaptiveSparkPlan finalizes — count() builds a separate plan.
      val unsalted = big.join(dim, col("k") === col("k2"))
      val n = unsalted.collect().length.toLong
      assert(n == 50000L + 1000L)
      val p = unsalted.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$p")
      // SALTED under the same AQE conf: identical rows out — salting
      // pre-spreads the hot key so the two mitigations compose (AQE just
      // sees balanced partitions) instead of corrupting results
      val salted = SkewOps.saltedJoin(big, dim, col("k"), col("k2"), 16,
        spreadDuplicates = true)
      assert(salted.count() == n)
      val saltedSum = salted.agg(sum(length(col("attr")))).collect()(0).getLong(0)
      val plainSum = unsalted.agg(sum(length(col("attr")))).collect()(0).getLong(0)
      assert(saltedSum == plainSum)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without an exchange on the bucketed key") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables(spark, sf, "orders").write
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables(spark, sf, "customer").write
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .hint("merge") // force SMJ so bucketing (not broadcast) is exercised
      .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(joined.count() == Tables(spark, sf, "orders").count())
  }

  test("partitioned parquet write + filtered read prunes partitions") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables(spark, sf, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("yr") === 1995)
    val p = read.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(yr"), s"no partition pruning:\n$p")
    assert(read.count() > 0)
  }

  test("q56: skyline plans pure window passes — no join of any kind, " +
      "in particular never the naive arm's nested-loop") {
    val p = plan("q56_skyline")
    assert(p.contains("Window"), s"expected window passes:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"skyline must not join:\n$p")
  }

  test("d22: candidate generation is an equi-join on segment content " +
      "— never a cartesian/nested-loop pass over the corpus — and the " +
      "hot-key cap's broadcast anti-joins are structurally in the plan") {
    import spark.implicits._
    import graft.operators.DedupOps
    // the SHIPPED query eagerly checkpoints (its plan is an RDD scan),
    // so the guard inspects the un-checkpointed core over the same base
    val base = graft.Tables(spark, sf, "documents")
      .filter($"n_chars" >= DedupOps.D22PrefixLen)
      .select($"doc_id", $"lang",
        org.apache.spark.sql.functions
          .substring($"text", 1, DedupOps.D22PrefixLen).as("pre"))
    val p = DedupOps.d22From(base).queryExecution.executedPlan.toString
    // the single sanctioned nested-loop is the 1-row n_capped_keys
    // cross join; the corpus-sized sides must never cartesian
    assert(!p.contains("CartesianProduct"),
      s"blocking join degenerated:\n$p")
    assert(p.contains("LeftAnti"),
      s"hot-key cap anti-join missing — d22 is uncapped:\n$p")
  }

  test("e28: every streak window is user-partitioned — no " +
      "single-partition stage anywhere") {
    val p = plan("e28_streaks")
    assert(p.contains("Window"), s"expected windows:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a global window/exchange crept in:\n$p")
  }

  test("t27: the exact recount joins the candidate list broadcast — " +
      "the occurrence stream is never shuffled by key space") {
    val p = plan("t27_heavy_bigrams")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate semi-join must broadcast the metadata side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"recount must not shuffle-join the stream:\n$p")
  }

  test("q59: the retraction fold is metadata-only — the final plan " +
      "reads the two layer tables and never the corpus parquet") {
    val p = plan("q59_skyline_retract")
    assert(!p.contains("part.parquet"),
      s"retraction fold rescans the corpus:\n$p")
    assert(p.contains("graft_state_q59_l1") &&
      p.contains("graft_state_q59_l2"),
      s"fold must read both skyline layers:\n$p")
  }

  test("q58: the day-2 fold scans the delta and the standing skyline " +
      "only — the standing corpus parquet is read exactly once") {
    val p = plan("q58_skyline_day2")
    val partScans = "part\\.parquet".r.findAllIn(p).length
    assert(partScans <= 1, s"fold rescans the corpus ($partScans scans):\n$p")
    assert(p.contains("graft_state_q58_skyline"),
      s"fold must read the standing skyline state:\n$p")
  }

  test("q63: the k-deletion fold is metadata-only — the final plan " +
      "reads the three layer tables and never the corpus parquet") {
    val p = plan("q63_skyline_batch_retract")
    assert(!p.contains("part.parquet"),
      s"batch-retraction fold rescans the corpus:\n$p")
    assert(p.contains("graft_state_q63_l1") &&
      p.contains("graft_state_q63_l2") && p.contains("graft_state_q63_l3"),
      s"fold must read all k+1 skyline layers:\n$p")
  }

  test("e31: the day-2 decay refresh reads the standing daily table " +
      "plus the delta slice only — history is never rescanned") {
    val p = plan("e31_decayed_day2")
    assert(p.contains("graft_state_e31_daily"),
      s"fold must read the standing daily table:\n$p")
    // the delta slice feeds both the fold and the as-of derivation —
    // two bounded scans of events; a third would mean the corpus-wide
    // rebuild leaked into the steady-state path
    val evScans = "events\\.parquet".r.findAllIn(p).length
    assert(evScans <= 2, s"e31 rescans events ($evScans scans):\n$p")
    // exactly ONE fold join: the as-of date derives from the fold's
    // INPUTS (two single-column scans), never by re-running the join
    // for a 1-row max (the plan-audit regression r15 caught)
    val foldIds = "\\((\\d+)\\)\\s+(?:SortMergeJoin|ShuffledHashJoin)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(foldIds.size == 1,
      s"e31 runs the fold join ${foldIds.size} times:\n$p")
  }

  test("standing-state bucket count is a CONFIG — writers honor " +
      "graft.state.buckets and delta-side folds track the table's " +
      "actual spec, not the current conf (r14 verdict item 5)") {
    import spark.implicits._
    val saved = spark.conf.getOption("graft.state.buckets")
    val tbl = "graft_state_bucketcfg_spec"
    try {
      spark.conf.set("graft.state.buckets", "7")
      graft.sources.LayoutOps.writeBucketed(
        Seq((1L, 2L, 3L, 0L)).toDF("a", "b", "n", "n_old")
          .select($"a", $"b", $"n"),
        tbl, Seq("a", "b"), graft.sources.LayoutOps.stateBuckets(spark))
      assert(graft.sources.LayoutOps.tableBuckets(spark, tbl) == 7,
        "writer did not honor graft.state.buckets")
      // move the conf AFTER the table exists: the fold must still
      // repartition its delta to the TABLE's 7, or the standing side
      // re-shuffles and the whole zero-exchange contract dies
      spark.conf.set("graft.state.buckets", "13")
      val fold = graft.operators.RelationalOps.q50Fold(tbl,
        Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L)).toDF("o", "p"))
      val p = fold.queryExecution.executedPlan.toString
      assert("hashpartitioning\\([^)]*\\b7\\)".r.findFirstIn(p).isDefined,
        s"delta side not repartitioned to the table's 7 buckets:\n$p")
      assert("hashpartitioning\\([^)]*\\b13\\)".r.findFirstIn(p).isEmpty,
        s"delta side followed the conf instead of the table spec:\n$p")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("graft.state.buckets", v)
        case None => spark.conf.unset("graft.state.buckets")
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
