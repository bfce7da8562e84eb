package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SharedSpark, SparkEntry, Tables}

/** Semantic invariants for the round-5 operator batch (t9, t10, p5, q34,
  * s4). Value-level correctness is the DuckDB oracle gate; these specs
  * assert the structural properties a hash-equal oracle wouldn't
  * localize when broken. */
class Round5OpsSpec extends AnyFunSuite {
  import SharedSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("t9: ratios are permille-bounded and consistent with t1 counts") {
    val rows = q("t9_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dupTok, topTok, dupBg) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dupTok >= 0 && dupTok < 1000)
      assert(topTok > 0 && topTok <= 1000)
      assert(dupBg >= 0 && dupBg < 1000)
      // a doc can't have duplicate tokens without its top token repeating
      if (dupTok > 0) assert(topTok >= 2000 / r.getLong(1).max(1))
    }
    // n_tokens agrees with t1's independent tokenization
    val t1 = q("t1_token_stats").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach(r => assert(r.getLong(1) == t1(r.getLong(0))))
  }

  test("t10: dup counts are bounded by shingle counts; flags match ratio") {
    val rows = q("t10_corpus_shingles").collect()
    assert(rows.nonEmpty)
    var anyDup = false
    rows.foreach { r =>
      val (n, d, milli, flag) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))
      assert(d <= n)
      assert(flag == (milli >= 300))
      if (n == 0) assert(d == 0 && milli == 0)
      if (d > 0) anyDup = true
    }
    // the corpus contains near-duplicate docs, so duplicated shingles exist
    assert(anyDup)
  }

  test("t10: a duplicated shingle implies at least two docs share it") {
    // symmetric by construction: total dup-shingle incidences across docs
    // can never be 1 (each duplicated hash contributes >= 2)
    val total = q("t10_corpus_shingles").agg(sum("n_dup")).collect()(0).getLong(0)
    assert(total != 1 && total >= 0)
  }

  test("p5: exactly the quota per stratum, ranks dense, hash-ordered") {
    val rows = q("p5_stratified_quota").collect()
    val byLang = rows.groupBy(_.getString(0))
    val langs = Tables(spark, sf, "documents").select("lang").distinct().count()
    assert(byLang.size == langs)
    byLang.foreach { case (_, rs) =>
      assert(rs.length == 40 ||
        rs.length < 40) // a stratum smaller than the quota keeps all rows
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      // selection order follows the hash, not doc_id
      val inRankOrder = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(inRankOrder.sameElements(inRankOrder.sorted))
    }
    // deterministic: a re-run picks the identical sample
    val again = q("p5_stratified_quota").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q34: a Bloom filter has no false negatives; totals cover all custkeys") {
    val rows = q("q34_bloom_prefilter").collect()
    // (maybe=false, actual=true) must not exist
    assert(!rows.exists(r => !r.getBoolean(0) && r.getBoolean(1)))
    val totalKeys = rows.map(_.getLong(2)).sum
    val expected = Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(totalKeys == expected)
    // every actual member is flagged maybe
    val members = Tables(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables(spark, sf, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    val maybeTrue = rows.filter(r => r.getBoolean(0) && r.getBoolean(1))
      .map(_.getLong(2)).sum
    assert(maybeTrue == members)
  }

  test("s4: PQ codes are one of the label codebook entries; ranks dense") {
    val rows = q("s4_knn_pq").collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      // ADC distances are non-decreasing in rank
      val inOrder = rs.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(inOrder.sameElements(inOrder.sorted))
    }
    assert(byQ.keySet == (0L until 10L).toSet)
  }

  test("s4: ADC top-10 recalls a reasonable share of the exact top-10") {
    // PQ is lossy by design, but the compressed distances must still be
    // informative: mean overlap with s1's exact top-10 well above chance.
    val exact = q("s1_knn_brute").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val pq = q("s4_knn_pq").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val overlaps = exact.keys.map(k => (pq(k) & exact(k)).size).toSeq
    val mean = overlaps.sum.toDouble / overlaps.size
    assert(mean >= 2.0, s"mean exact-top10 overlap $mean; per-query $overlaps")
  }

  test("t11: benchmark docs excluded; counts bounded; flag matches count") {
    val rows = q("t11_decontaminate").collect()
    val docs = Tables(spark, sf, "documents")
    val nTrain = docs.filter(col("source") =!= "src0").count()
    assert(rows.length == nTrain)
    rows.foreach { r =>
      assert(r.getString(1) != "src0")
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getBoolean(5) == (r.getLong(3) > 0))
    }
    // the corpus has cross-source near-dups, so contamination exists
    assert(rows.exists(_.getBoolean(5)))
  }

  test("t11: the benchmark shingle set rides a broadcast, not a shuffle join") {
    val p = q("t11_decontaminate").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q34/s4/t10: no cartesian product in any plan") {
    Seq("q34_bloom_prefilter", "s4_knn_pq", "t10_corpus_shingles").foreach { n =>
      val p = q(n).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product")
    }
  }

  test("s5: composition is consistent — shared pairs carry s4's exact ADC") {
    // s5 = s4's scoring over s3-pruned candidates, so any (qid, nid) pair
    // ranked by BOTH must have the identical fixed-point ADC distance.
    val s4 = q("s4_knn_pq").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val s5 = q("s5_knn_ivfpq").collect()
    assert(s5.nonEmpty)
    val shared = s5.filter(r => s4.contains((r.getLong(0), r.getLong(1))))
    assert(shared.nonEmpty, "pruning removed every s4 top-10 pair — implausible")
    shared.foreach { r =>
      assert(r.getLong(3) == s4((r.getLong(0), r.getLong(1))),
        s"ADC mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // per-query ranks dense, distances non-decreasing in rank
    s5.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      val inOrder = rs.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(inOrder.sameElements(inOrder.sorted))
    }
  }

  test("e14: transition counts conserve events; probabilities are permille") {
    val rows = q("e14_transitions").collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user with k events contributes exactly k-1 transitions
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    // floor(1000·n/total) is legitimately 0 for a transition rarer than
    // 1/1000 of its source type — lower bound is 0, not 1
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000))
    // per-source floor-permilles sum to (1000 - fanout, 1000]
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s <= 1000 && s > 1000 - rs.length)
    }
  }

  test("t12: subword pieces refine words; ratios are conserved") {
    val rows = q("t12_subword_tokens").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, pieces, distinct, letters) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      // every word is at least one piece; pieces never exceed letters
      assert(pieces >= words && pieces <= letters)
      assert(distinct <= pieces)
      // milli ratios recompute from the counts they were derived from
      assert(r.getLong(5) == math.floor(1000.0 * letters / pieces).toLong)
      assert(r.getLong(6) == math.floor(1000.0 * pieces / words).toLong)
    }
  }

  test("p6: temperature rebalances toward the tail; shares conserve") {
    val rows = q("p6_mixture_weights").collect()
    val nLangs = rows.length
    assert(nLangs >= 2)
    // micro shares each sum to 1e6 up to floor loss (< 1 per row)
    val shareSum = rows.map(_.getLong(2)).sum
    val targetSum = rows.map(_.getLong(3)).sum
    assert(shareSum > 1000000L - nLangs && shareSum <= 1000000L)
    assert(targetSum > 1000000L - nLangs && targetSum <= 1000000L)
    // α=0.5 flattens: below-natural-share langs gain, the dominant loses
    rows.foreach { r =>
      val (share, target) = (r.getLong(2), r.getLong(3))
      if (share * nLangs < 1000000L) assert(target >= share,
        s"${r.getString(0)}: tail language must be upweighted")
      else if (share * nLangs > 1000000L) assert(target <= share,
        s"${r.getString(0)}: dominant language must be downweighted")
      assert(r.getLong(4) <= 1000000L && r.getLong(4) > 0)
    }
  }

  test("s5: query-compiled plan — no joins, exchanges only for top-k + sort") {
    // the index artifacts ride as literals, so the corpus pass must plan
    // as pure projections: any Join node means a broadcast/shuffle crept
    // back in; >2 exchanges means the map pass itself started shuffling
    val p = q("s5_knn_ivfpq").queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"s5 must not plan a join:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"s5 planned $exchanges exchanges (want <=2):\n$p")
  }

  test("d10: containment bounds hold and subsume high-Jaccard d3 pairs") {
    val rows = q("d10_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // ca/cb widened to long when d10 moved onto the df-capped
      // candidate path (count() of capped grams, not size() of an array)
      val (shared, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(shared <= math.min(ca, cb), "intersection can't exceed a side")
      assert(math.max(r.getLong(5), r.getLong(6)) >= 800,
        "below the containment threshold")
      // the smaller side always has the larger containment
      assert((ca <= cb) == (r.getLong(5) >= r.getLong(6)) ||
        r.getLong(5) == r.getLong(6))
    }
    // containment >= Jaccard pointwise, so jac >= 0.8 pairs must appear
    val d10pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    q("d3_ngram_jaccard").collect()
      .filter(_.getLong(4) >= 800)
      .foreach(r => assert(d10pairs((r.getLong(0), r.getLong(1))),
        s"high-Jaccard pair missing from containment: $r"))
  }

  test("t12: pure map pass — the only exchange is the output sort") {
    val p = q("t12_subword_tokens").queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"t12 planned $exchanges exchanges (want <=1):\n$p")
    assert(!p.contains("Join") && !p.contains("Generate"),
      s"t12 must not join or explode:\n$p")
  }

  test("e15: z-scores center and flag matches threshold") {
    val rows = q("e15_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(4) == (math.abs(r.getLong(3)) >= 3000)))
    // per type, z-scores must straddle zero (they are centered residuals)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val zs = rs.map(_.getLong(3))
      assert(zs.min <= 0 && zs.max >= 0, s"$t z-scores not centered: $zs")
    }
    // row count equals the hourly aggregate's (one z per type-hour)
    assert(rows.length ==
      q("e1_hourly_agg").select("hour", "event_type").distinct().count())
  }

  test("q35: melt is the exact inverse of q18's pivot") {
    val wide = q("q18_pivot").collect()
      .map(r => r.getInt(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val long = q("q35_unpivot").collect()
    assert(long.length == wide.size * 3)
    long.groupBy(_.getInt(0)).foreach { case (yr, rs) =>
      val got = rs.sortBy(_.getString(1)).map(_.getDouble(2)).toSeq
      assert(got == wide(yr), s"yr $yr: $got != ${wide(yr)}")
    }
  }
}
