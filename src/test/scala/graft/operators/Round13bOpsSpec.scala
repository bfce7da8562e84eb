package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Round-13 second batch: q56 skyline (local-skyline-then-merge vs the
  * quadratic NOT EXISTS truth arm), e28 gaps-and-islands streaks, and
  * d22 PassJoin edit-distance self-join (partition blocking vs the
  * quadratic truth arm, including the max-displacement indel case). */
class Round13bOpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  private def digest(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  // ------------------------------------------------------------- q56

  /** Planted dominance structure (price, size):
    *  - (0.50, 3): cheapest — on the skyline.
    *  - (1.00, 5) × 2 identical: duplicates never dominate each other
    *    (one strict inequality required) — BOTH on the skyline.
    *  - (1.00, 4): same price as the 5s, strictly smaller — dominated
    *    by the peer rule (max_eq > size).
    *  - (1.50, 10): biggest at its price — on the skyline.
    *  - (2.00, 10): same size as (1.50, 10) but pricier — dominated
    *    by the strictly-cheaper rule (max_lt >= size).
    *  - (0.75, 2): cheaper than the 5s but smaller than (0.50, 3)'s
    *    max at lower price — dominated. */
  private def plantedParts = {
    import spark.implicits._
    Seq(
      (1L, 0.50, 3), (2L, 1.00, 5), (3L, 1.00, 5), (4L, 1.00, 4),
      (5L, 1.50, 10), (6L, 2.00, 10), (7L, 0.75, 2)
    ).toDF("p_partkey", "p_retailprice", "p_size")
  }

  test("q56: planted dominance chains, price ties, and duplicate " +
      "points resolve exactly (merged arm)") {
    assert(digest(RelationalOps.q56From(plantedParts)) == Seq(
      Seq(1L, 0.50, 3), Seq(2L, 1.00, 5), Seq(3L, 1.00, 5),
      Seq(5L, 1.50, 10)))
  }

  test("q56: merged two-pass arm is output-identical to the NOT " +
      "EXISTS truth arm on planted and real data") {
    assert(digest(RelationalOps.q56From(plantedParts)) ==
      digest(RelationalOps.q56SkylineNaive(plantedParts)))
    val part = graft.Tables(spark, sf, "part")
    assert(digest(RelationalOps.q56From(part)) ==
      digest(RelationalOps.q56SkylineNaive(part)))
  }

  test("q56: local-skyline parallelism tracks the session's " +
      "spark.sql.shuffle.partitions — never a hardcoded width") {
    val conf = spark.conf
    val old = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      val df = RelationalOps.q56From(plantedParts)
      val reps = df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical
            .RepartitionByExpression => r
      }
      assert(reps.nonEmpty, "expected an explicit local-skyline hash " +
        "repartition in the plan")
      assert(reps.forall(_.optNumPartitions.contains(7)),
        s"partition widths: ${reps.map(_.optNumPartitions)}")
    } finally conf.set("spark.sql.shuffle.partitions", old)
  }

  // ------------------------------------------------------------- e28

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  /** user 1: purchase days 1,2,3 then 10,11 (plus a same-day double
    * purchase on day 2 and an ignored view on day 6) → best 3 @ Jan 1,
    * 2 streaks. user 2: two equal-length streaks (days 5,6 and 1,2) →
    * tie broken to the EARLIEST start. user 3: views only → absent. */
  private def plantedEvents = {
    import spark.implicits._
    (Seq(1, 2, 2, 3, 10, 11).map(d => (1L, ts(d), "purchase")) ++
      Seq((1L, ts(6), "view")) ++
      Seq(5, 6, 1, 2).map(d => (2L, ts(d), "purchase")) ++
      Seq((3L, ts(4), "view"), (3L, ts(5), "view")))
      .toDF("user_id", "ts", "event_type")
  }

  test("e28: islands split on gaps, same-day repeats collapse, ties " +
      "break to the earliest start, non-purchasers are absent") {
    val got = digest(EventOps.e28From(plantedEvents))
    assert(got == Seq(
      Seq(1L, 3L, java.sql.Date.valueOf("2024-01-01"), 2L),
      Seq(2L, 2L, java.sql.Date.valueOf("2024-01-01"), 2L)))
  }

  // ------------------------------------------------------------- d22

  /** Textbook Levenshtein DP — the spec's independent distance
    * oracle, so planted expectations are computed, not hand-derived. */
  private def lev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  private val r80: String =
    (0 until 80).map(i => ('A' + i % 26).toChar).mkString

  test("d22: planted pairs at distance 1, K, K+1, max-displacement " +
      "indels, and a cross-lang twin resolve exactly") {
    import spark.implicits._
    val k = DedupOps.D22MaxDist
    def subst(s: String, n: Int, off: Int, c: Char): String =
      (0 until n).foldLeft(s)((acc, i) => acc.updated(off + i * 8, c))
    val d1 = subst(r80, 1, 3, '#')
    val dk = subst(r80, k, 3, '#')
    // k+1 edits at DISJOINT positions and a different char, so dk1 is
    // past the threshold from EVERY planted neighbor, not just r80
    val dk1 = subst(r80, k + 1, 7, '%')
    // 4 deletions early + 4 insertions late: distance 8 with the
    // middle 46 chars displaced by 4 — the pigeonhole's shifted-match
    // window must still catch a verbatim segment.
    val shifted = r80.take(10) + r80.slice(14, 60) + "####" +
      r80.slice(60, 80)
    assert(shifted.length == 80)
    assert(lev(r80, d1) == 1 && lev(r80, dk) == k &&
      lev(r80, shifted) == k)
    for (s <- Seq(r80, d1, dk, shifted)) assert(lev(dk1, s) > k)
    val base = Seq(
      (1L, "en", r80), (2L, "en", d1), (3L, "en", dk),
      (4L, "en", dk1), (5L, "de", r80), (6L, "en", shifted)
    ).toDF("doc_id", "lang", "pre")
    val full = digest(DedupOps.d22From(base))
    // the tiny corpus has no hot keys — the cap reports 0 everywhere
    assert(full.forall(_(3) == 0L))
    val got = full.map(_.take(3))
    // every en-pair among {r80, d1, dk, shifted} within K; dk1 only
    // reaches d1's single-# neighborhood nowhere under K; the de twin
    // is excluded by language despite distance 0
    val expect = digest(DedupOps.d22Naive(base))
    assert(got == expect)
    assert(got.contains(Seq(1L, 2L, 1)) && got.contains(Seq(1L, 3L, k)) &&
      got.contains(Seq(1L, 6L, k)))
    assert(!got.exists(r => r(0) == 4L || r(1) == 4L ||
      r(0) == 5L || r(1) == 5L))
  }

  test("d22: UNCAPPED PassJoin blocking is output-identical to the " +
      "quadratic truth arm on the real corpus (completeness)") {
    import spark.implicits._
    val base = graft.Tables(spark, sf, "documents")
      .filter($"n_chars" >= DedupOps.D22PrefixLen)
      .select($"doc_id", $"lang",
        substring($"text", 1, DedupOps.D22PrefixLen).as("pre"))
      .localCheckpoint()
    try
      assert(digest(DedupOps.d22From(base, Int.MaxValue)
          .drop("n_capped_keys")) ==
        digest(DedupOps.d22Naive(base)))
    finally DedupOps.unpersistCheckpointed(base)
  }

  test("d22: a 300-doc template-prefix cohort yields BOUNDED " +
      "candidates (not cohort²) while a true 1-edit pair still " +
      "surfaces through its rare shared segment") {
    import spark.implicits._
    // 300 docs sharing one 80-char boilerplate prefix verbatim — the
    // crawl-template pathology the docstring's old defense waved away.
    val cohort = (100L until 400L).map(id => (id, "en", r80))
    // A and B: template prefix with segment 5 (chars 46..54, 1-based)
    // replaced by a distinctive rare block, and B one edit off A in
    // segment 2 — dist(A,B)=1, their shared rare segment survives the
    // cap, so the pair must surface even though every template key is
    // capped away.
    val preA = r80.take(45) + "ZZZZZZZZZ" + r80.drop(54)
    val preB = preA.updated(20, '#')
    assert(preA.length == 80 && preB.length == 80 && lev(preA, preB) == 1)
    val base = (cohort ++ Seq((1L, "en", preA), (2L, "en", preB)))
      .toDF("doc_id", "lang", "pre")
    val (cand, hot) = DedupOps.d22CandidatesAndHot(base, DedupOps.D22KeyCap)
    val nCand = cand.count()
    // uncapped, the cohort alone is C(300,2) = 44_850 candidate pairs;
    // capped, only rare-segment collisions survive — orders smaller.
    assert(nCand < 100L, s"candidates not bounded: $nCand")
    // at least the 9 template segment keys are reported capped
    assert(hot.count() >= 9L)
    val out = digest(DedupOps.d22From(base))
    assert(out.contains(Seq(1L, 2L, 1, out.head(3))))
    // no cohort-internal pair survives (those are d1/d2's job)
    assert(!out.exists(r => r(0).asInstanceOf[Long] >= 100L &&
      r(1).asInstanceOf[Long] >= 100L))
  }

  // ------------------------------------------------------------- t27

  test("misra-gries: an item just above the N/(k+1) guarantee line " +
      "survives an adversarial flood of distinct fillers") {
    val agg = new graft.functions.MisraGriesAgg(4)
    // N = 100: "hot" appears 21 > 100/5 times among 79 unique fillers
    // — the worst case for a width-4 sketch (every filler miss forces
    // counter pressure). The MG bound says hot MUST survive.
    val stream = new scala.util.Random(7).shuffle(
      (Seq.fill(21)("hot") ++ (1 to 79).map(i => s"f$i")).toList)
    val sketch = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(sketch).contains("hot"))
    // split-and-merge path preserves the guarantee too
    val (l, r) = stream.splitAt(41)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged).contains("hot"))
  }

  test("t27: sketch-guided two-pass equals the full-shuffle truth arm " +
      "at both the default and a trim-stressing sketch width") {
    val d = graft.Tables(spark, sf, "documents")
    val truth = digest(TextOps.t27Naive(d))
    assert(truth.nonEmpty)
    assert(digest(TextOps.t27From(d, TextOps.T27K)) == truth)
    // k = 1200 still satisfies k+1 > 1/0.001 — exactness must hold
    // even with the buffer 3.3x tighter and trims actually firing
    assert(digest(TextOps.t27From(d, 1200)) == truth)
  }

  // ------------------------------------------------------------- q57

  test("q57: small audiences (union < k) make every sketch estimate " +
      "EXACT — set algebra on full sets") {
    import spark.implicits._
    // A = users 1-10 (view), B = users 6-15 (purchase):
    // |A|=10, |B|=10, |A∪B|=15, |A∩B|=5, J=1/3
    val ev = ((1L to 10L).map(u => (u, ts(1), "view")) ++
      (6L to 15L).map(u => (u, ts(2), "purchase")))
      .toDF("user_id", "ts", "event_type")
    val r = RelationalOps.q57From(ev, "view", "purchase").collect().head
    assert(r.getInt(0) == 10 && r.getInt(1) == 10)       // n_a, n_b
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 10.0)
    assert(r.getInt(4) == 15 && r.getDouble(5) == 15.0)  // union
    assert(r.getLong(6) == 5L)                           // rho
    assert(r.getLong(7) == 333L)                         // jaccard_milli
    assert(r.getDouble(8) == 5.0 / 15.0 * 15.0)          // est_intersect
  }

  test("q57: full-sketch estimates land within KMV error bounds of " +
      "the exact counts on the real events table") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf, "events")
    val exact = ev.filter($"event_type".isin("view", "purchase"))
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactU = ev.filter($"event_type".isin("view", "purchase"))
      .select($"user_id").distinct().count()
    val r = RelationalOps.q57From(ev, "view", "purchase").collect().head
    // KMV relative standard error ~ 1/sqrt(k-2) ≈ 12.7% at k=64;
    // 3 s.e. gate, same shape as the q33 spec (exact path if < k)
    def ok(est: Double, truth: Long): Boolean =
      math.abs(est - truth) <= math.max(1.0, 0.39 * truth)
    assert(ok(r.getDouble(2), exact.getOrElse("view", 0L)))
    assert(ok(r.getDouble(3), exact.getOrElse("purchase", 0L)))
    assert(ok(r.getDouble(5), exactU))
  }

  // ------------------------------------------------------------- q58

  test("q58: the IVM identity skyline(A ∪ Δ) = skyline(skyline(A) ∪ Δ) " +
      "holds when the delta both evicts standing points and is rejected") {
    import spark.implicits._
    // (0.40, 6) dominates the standing (0.50,3)/(1.00,5)x2 — EVICTS;
    // (3.00, 1) is dominated by everything — REJECTED
    val delta = Seq((8L, 0.40, 6), (9L, 3.00, 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
    val all = plantedParts.unionByName(delta)
    val maintained = digest(RelationalOps.q56From(
      RelationalOps.q56From(plantedParts).unionByName(delta)))
    assert(maintained == digest(RelationalOps.q56From(all)))
    assert(maintained == Seq(
      Seq(8L, 0.40, 6), Seq(5L, 1.50, 10)))
  }

  test("q58: maintained skyline equals from-scratch rebuild on the " +
      "real table (state built, then folded)") {
    assert(digest(RelationalOps.q58SkylineDay2(spark, sf)) ==
      digest(RelationalOps.q56Skyline(spark, sf)))
  }

  // ------------------------------------------------------------- s22

  test("s22: on a non-normalized corpus MIPS disagrees with cosine " +
      "(the high-norm off-angle vector wins the dot, loses the angle) " +
      "and the norm-augmentation reduction reproduces MIPS exactly") {
    import spark.implicits._
    // query 0 = [1,0]; nid 11 = [0.9,0.1] (cos .994, dot 0.9);
    // nid 12 = [3,3] (cos .707, dot 3.0) → MIPS: 12 first; cosine: 11
    val e = Seq(
      (0L, Array(1.0, 0.0)), (11L, Array(0.9, 0.1)),
      (12L, Array(3.0, 3.0))
    ).toDF("vec_id", "v")
    val mips = digest(SimilarityOps.s22From(e)
      .select($"qid", $"nid", $"rnk"))
    assert(mips == Seq(Seq(0L, 12L, 1), Seq(0L, 11L, 2)))
    assert(digest(SimilarityOps.s22AugFrom(e)) == mips)
  }

  // ------------------------------------------------------------- q59

  test("q59: retracting the cheapest frontier point promotes from L2 " +
      "exactly — fold over layers equals recompute minus the point") {
    import spark.implicits._
    val l1 = RelationalOps.q56From(plantedParts)
    val rest = plantedParts.join(l1.select($"p_partkey"),
      Seq("p_partkey"), "left_anti")
    val l2 = RelationalOps.q56From(rest)
    // deleted x = (1, 0.50, 3); (7, 0.75, 2) must PROMOTE from L2
    // (it was hidden only by x), (4, 1.00, 4) and (6, 2.00, 10) must
    // stay rejected (their dominators survive)
    val folded = digest(RelationalOps.q59Fold(l1, l2))
    assert(folded == Seq(
      Seq(7L, 0.75, 2), Seq(2L, 1.00, 5), Seq(3L, 1.00, 5),
      Seq(5L, 1.50, 10)))
    assert(folded == digest(RelationalOps.q56From(
      plantedParts.filter($"p_partkey" =!= 1L))))
  }

  test("q59: layered fold equals from-scratch recompute on the real " +
      "table") {
    import spark.implicits._
    val part = graft.Tables(spark, sf, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size")
    val x = RelationalOps.q56From(part)
      .limit(1).select($"p_partkey").as[Long].collect().head
    assert(digest(RelationalOps.q59SkylineRetract(spark, sf)) ==
      digest(RelationalOps.q56From(part.filter($"p_partkey" =!= x))))
  }

  // ------------------------------------------------------------- q60

  test("q60: planted snapshots classify insert/delete/update and drop " +
      "unchanged rows; null-safe compares survive null values") {
    import spark.implicits._
    val old = Seq((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 30.0),
      (5L, null.asInstanceOf[String], 50.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val now = Seq((2L, "F", 25.0), (3L, "O", 30.0), (4L, "P", 40.0),
      (5L, null.asInstanceOf[String], 50.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    assert(digest(RelationalOps.q60DiffFrom(old, now)) == Seq(
      Seq(1L, "delete"), Seq(2L, "update"), Seq(4L, "insert")))
  }

  test("q60: all three change classes appear on the real table and " +
      "unchanged keys stay out") {
    import spark.implicits._
    val d = RelationalOps.q60SyncDiff(spark, sf)
    val byClass = d.groupBy($"change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass.keySet == Set("insert", "delete", "update"))
    val total = graft.Tables(spark, sf, "orders").count()
    assert(byClass.values.sum < total / 2) // diff ≪ table, not a dump
  }

  // ------------------------------------------------------------- q61

  test("q61: the bootstrap interval brackets the point mean and the " +
      "Poissonized weights have the right mass (mean 1, P(0) = 1/e)") {
    import spark.implicits._
    val r = RelationalOps.q61BootstrapCi(spark, sf).collect().head
    val (point, lo, hi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(lo < point && point < hi, s"interval [$lo, $hi] vs $point")
    assert((hi - lo) / point < 0.2, "interval implausibly wide")
    // weight-mass check on a direct recomputation of the weights
    import graft.functions.EngineFns.md5Long
    val w = graft.Tables(spark, sf, "orders")
      .select($"o_orderkey",
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("u",
        pmod(md5Long(concat($"o_orderkey".cast("string"), lit(":"),
          $"b".cast("string"), lit(":q61"))), lit(1000000000L))
          .cast("double") / lit(1000000000.0))
      .agg(avg(when($"u" < 0.36787944117144233, 1.0).otherwise(0.0))
        .as("p0"))
      .collect().head.getDouble(0)
    assert(math.abs(w - math.exp(-1.0)) < 0.01,
      s"P(weight=0) = $w, expected ~1/e")
  }

  // ------------------------------------------------------------- q62

  test("q62: a planted exact line y = 3x + 5 recovers slope 3 and " +
      "intercept 5 to the double's last bit; a flat group gives 0") {
    import spark.implicits._
    // yc in cents: y = 3x + 5 dollars → yc = 300x + 500 exactly
    val o = ((0L to 9L).map(x => ("line", x, 300L * x + 500L)) ++
      (0L to 9L).map(x => ("flat", x, 700L)))
      .toDF("o_orderpriority", "x", "yc")
    val got = digest(RelationalOps.q62From(o))
    assert(got == Seq(
      Seq("flat", 10L, 0.0, 7.0),
      Seq("line", 10L, 3.0, 5.0)))
  }

  // ------------------------------------------------------------- s23

  test("s23: planted contingencies — a perfect clustering scores " +
      "1000/1000, a single merged cluster scores by pair counting") {
    import spark.implicits._
    // perfect: clusters == labels (4 + 4)
    val perfect = Seq.fill(4)((0L, 0)) ++ Seq.fill(4)((1L, 1))
    val p = SimilarityOps.s23EvalFrom(perfect.toDF("cid", "label"))
      .collect().head
    assert(p.getLong(2) == 1000L && p.getLong(3) == 1000L)
    // merged: one cluster, two labels 2+2: purity = 500;
    // agree-pairs = allPairs(6) + 2·sameBoth(2·2) − sameClus(6)
    //   − sameLab(2) = 2 → RI = 2/6 → 333
    val merged = Seq.fill(2)((0L, 0)) ++ Seq.fill(2)((0L, 1))
    val m = SimilarityOps.s23EvalFrom(merged.toDF("cid", "label"))
      .collect().head
    assert(m.getLong(1) == 1L && m.getLong(2) == 500L &&
      m.getLong(3) == 333L)
  }

  // ------------------------------------------------------------- e29

  test("e29: planted monotone R/F/M dimensions score the expected " +
      "quintile grid (interpolated boundaries, strict comparisons)") {
    import spark.implicits._
    // user i (1..5): i purchases, all on day 10-i, value 10.0 each →
    // recency_days = i-1 over [0..4], frequency = i, monetary = 10i.
    // Quintile boundaries of [0..4] are 0.8/1.6/2.4/3.2 (lerp), of
    // [1..5] are 1.8/2.6/3.4/4.2 — strict-compare scores fall out as
    // the diagonal grid below.
    val ev = (1 to 5).flatMap { i =>
      (1 to i).map(_ => (i.toLong, ts(10 - i), "purchase", 10.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val got = digest(EventOps.e29From(ev)
      .select($"user_id", $"r_score", $"f_score", $"m_score", $"segment"))
    assert(got == Seq(
      Seq(1L, 5, 1, 1, "511"), Seq(2L, 4, 2, 2, "422"),
      Seq(3L, 3, 3, 3, "333"), Seq(4L, 2, 4, 4, "244"),
      Seq(5L, 1, 5, 5, "155")))
  }

  test("s22: the augmentation arm reproduces the MIPS ranking on the " +
      "real (unit-norm) corpus too") {
    import spark.implicits._
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    assert(digest(SimilarityOps.s22AugFrom(e)) ==
      digest(SimilarityOps.s22From(e).select($"qid", $"nid", $"rnk")))
  }
}
