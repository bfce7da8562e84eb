package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 second batch: the connected-component family (q49 batch,
  * q50 incremental day-2) — planted-graph semantics, the contracted-
  * graph relabel, read idempotence, and the zero-exchange fold guard. */
class Round11bOpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Planted basket corpus (see test bodies): three day-1 components,
    * a sub-threshold seed pair, and a day-2 batch that (a) crosses the
    * seed pair over the support threshold, (b) chains a second crossing
    * to a brand-new node, (c) plants a wholly-new component, and (d)
    * re-supports an existing edge WITHOUT crossing anything. */
  private def plOld = {
    import spark.implicits._
    Seq(
      (101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),     // comp {1,2}
      (103L, 10L), (103L, 11L), (104L, 10L), (104L, 11L), // comp {10,11}
      (105L, 20L), (105L, 21L), (106L, 20L), (106L, 21L), // comp {20,21}
      (107L, 2L), (107L, 10L),                            // seed (2,10) n=1
      (108L, 11L), (108L, 40L)                            // seed (11,40) n=1
    ).toDF("o", "p")
  }

  private def plNew = {
    import spark.implicits._
    Seq(
      (201L, 2L), (201L, 10L),   // (2,10) crosses → merges {1,2}+{10,11}
      (205L, 11L), (205L, 40L),  // (11,40) crosses → chains new node 40 in
      (202L, 30L), (202L, 31L),  // }
      (203L, 30L), (203L, 31L),  // } brand-new component {30,31}
      (204L, 20L), (204L, 21L)   // (20,21) 2→3: already qualified, no-op
    ).toDF("o", "p")
  }

  test("q50: contracted-graph relabel equals the from-scratch q49") {
    val cntT = graft.sources.LayoutOps.stateTable("graft_state_q50spec_cnt", "a")
    val lblT = graft.sources.LayoutOps.stateTable("graft_state_q50spec_lbl", "a")
    val trT = graft.sources.LayoutOps.stateTable("graft_state_q50spec_tr", "a")
    val got = RelationalOps.q50From(cntT, lblT, trT, plOld, plNew)
      .collect().map(_.toSeq).toSeq
    // transitive merge through TWO crossing edges lands 40 in the
    // merged component; min part key (1) is the label on both paths
    assert(got == Seq(
      Seq(1L, 5L, 4L, 3L, 0L),    // {1,2,10,11,40}: edges (1,2)(10,11)(2,10)(11,40)
      Seq(20L, 2L, 1L, 3L, 0L),   // untouched
      Seq(30L, 2L, 1L, 3L, 0L)),  // brand-new
      s"unexpected q50 output: $got")
    // maintained-equals-derived: q49 over the union, modulo n_new_edges
    val derived = RelationalOps.q49ComponentsFrom(plOld.unionByName(plNew))
      .collect().map(_.toSeq).toSeq
    assert(got.map(r => r.patch(3, Nil, 1)) == derived)
    // read idempotence (q41's discipline: the delta never persists)
    val again = RelationalOps.q50From(cntT, lblT, trT, plOld, plNew)
      .collect().map(_.toSeq).toSeq
    assert(again == got, "second read diverged — fold persisted something")
  }

  test("q50: empty delta is a true no-op (empty contracted graph)") {
    import spark.implicits._
    val cntT = graft.sources.LayoutOps.stateTable("graft_state_q50spec2_cnt", "b")
    val lblT = graft.sources.LayoutOps.stateTable("graft_state_q50spec2_lbl", "b")
    val trT = graft.sources.LayoutOps.stateTable("graft_state_q50spec2_tr", "b")
    val none = Seq.empty[(Long, Long)].toDF("o", "p")
    val got = RelationalOps.q50From(cntT, lblT, trT, plOld, none)
      .collect().map(_.toSeq).toSeq
    val derived = RelationalOps.q49ComponentsFrom(plOld)
      .collect().map(_.toSeq).toSeq
    assert(got.map(r => r.patch(3, Nil, 1)) == derived)
    assert(got.forall(_(3) == 0L), "no edge crossed, n_new_edges must be 0")
  }

  test("q50: fold joins the standing counts with zero standing-side exchange") {
    val cntT = graft.sources.LayoutOps.stateTable("graft_state_q50spec3_cnt", "c")
    val lblT = graft.sources.LayoutOps.stateTable("graft_state_q50spec3_lbl", "c")
    val trT = graft.sources.LayoutOps.stateTable("graft_state_q50spec3_tr", "c")
    RelationalOps.q50From(cntT, lblT, trT, plOld, plNew).collect() // build state
    val df = RelationalOps.q50Fold(cntT, plNew)
    val plan = physical(df)
    def cntScan(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("graft_state_q50spec3_cnt")) => s
    }
    val scans = cntScan(plan)
    assert(scans.nonEmpty, "fold does not scan the standing counts table")
    assert(scans.forall(_.bucketedScan),
      "standing counts scan is not reading the bucket layout")
    // the LOWEST join over the standing scan is the fold; its standing-
    // side child must contain no shuffle (the delta side pays the one
    // delta-sized repartition)
    val folds = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if cntScan(j).nonEmpty => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if cntScan(j).nonEmpty => j
    }
    assert(folds.nonEmpty, "no shuffled join over the standing counts scan")
    val fold = folds.minBy(_.collect { case p => p }.size)
    val standingSide = fold.children.filter(c => cntScan(c).nonEmpty)
    assert(standingSide.nonEmpty)
    standingSide.foreach { side =>
      val ex = side.collect { case e: ShuffleExchangeExec => e }
      assert(ex.isEmpty,
        s"standing side of the fold rides ${ex.size} exchange(s)")
    }
  }

  test("q50: randomized corpora agree with from-scratch q49 (seeded)") {
    import spark.implicits._
    // six seeded corpora: 40 baskets over a 12-item pool → dense support
    // graph with organic threshold crossings, multi-component merges and
    // first-seen nodes across the 70/30 split — the planted test's cases
    // arise here in arbitrary combination
    var newEdgesSeen = 0L
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val baskets = (1L to 40L).map { o =>
        o -> Seq.fill(2 + rnd.nextInt(4))(1L + rnd.nextInt(12)).distinct
      }
      def plOf(bs: Seq[(Long, Seq[Long])]) =
        bs.flatMap { case (o, ps) => ps.map(o -> _) }.toDF("o", "p")
      val (oldB, newB) = baskets.partition(_._1 <= 28)
      def st(p: String) = graft.sources.LayoutOps.stateTable(p, s"q50rnd$seed")
      val rows = RelationalOps.q50From(st("graft_state_q50r_cnt"),
          st("graft_state_q50r_lbl"), st("graft_state_q50r_tr"),
          plOf(oldB), plOf(newB)).collect()
      val got = rows.map(_.toSeq.patch(3, Nil, 1)).toSeq
      val want = RelationalOps.q49ComponentsFrom(plOf(baskets))
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"seed $seed: maintained != derived")
      newEdgesSeen += rows.headOption.map(_.getAs[Long]("n_new_edges")).getOrElse(0L)
    }
    // the generator must actually exercise the incremental path
    assert(newEdgesSeen > 0L, "no seed produced a threshold crossing")
  }

  test("m9: randomized corpora agree with from-scratch m5 (seeded)") {
    import spark.implicits._
    // docs are 2-4 frames from a 12-frame pool (16-char frame + 48-char
    // pad per 64-char block, so only the frames hash) → per-sig df spans
    // the cap and crossings occur organically across the 70/30 split
    var crossingsSeen = 0L
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pool = (0 until 12).map(k => f"F$k%02dxxxxxxxxxxxx".take(16))
      val docs = (1L to 25L).map { id =>
        val text = Seq.fill(2 + rnd.nextInt(3))(pool(rnd.nextInt(12)))
          .map(_ + "_" * 48).mkString
        (id, text, text.length.toLong)
      }
      val (oldD, newD) = docs.partition(_._1 <= 18)
      def df(d: Seq[(Long, String, Long)]) = d.toDF("doc_id", "text", "n_chars")
      def st(p: String) = graft.sources.LayoutOps.stateTable(p, s"m9rnd$seed")
      val rows = MultimodalOps.m9From(st("graft_state_m9r_post"),
          st("graft_state_m9r_df"), st("graft_state_m9r_pair"),
          st("graft_state_m9r_n"), df(oldD), df(newD)).collect()
      val got = rows.map(_.toSeq.dropRight(1)).toSeq
      val want = MultimodalOps.m5PairsFrom(MultimodalOps.m9SigsFrom(df(docs)))
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"seed $seed: maintained != derived")
      crossingsSeen += rows.headOption
        .map(_.getAs[Long]("n_crossing_sigs")).getOrElse(0L)
    }
    // the generator must actually exercise the churn (retraction) path
    assert(crossingsSeen > 0L, "no seed produced a cap crossing")
  }

  test("d21: degenerate LSH buckets are capped and surfaced per config") {
    import spark.implicits._
    // 260 byte-identical boilerplate docs (> cap): one band bucket per
    // band holds all 260 in EVERY config — excluded from pairing,
    // surfaced as `bands` capped buckets. One honest dup pair survives.
    val boiler = (0L until 260L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val pair = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog tonight"),
      (1001L, "the quick brown fox jumps over the lazy dog tonight"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val rows = DedupOps.d21BandTuningFrom(docs).collect()
    assert(rows.length == 5)
    val nTrue = 260L * 259L / 2L + 1L
    rows.foreach { r =>
      val bands = r.getAs[Int]("bands")
      assert(r.getAs[Long]("n_capped_buckets") == bands.toLong,
        s"config $bands: expected one capped bucket per band")
      assert(r.getAs[Long]("n_candidates") == 1L,
        s"config $bands: capped bucket leaked candidates")
      assert(r.getAs[Long]("n_hit") == 1L)
      assert(r.getAs[Long]("n_true") == nTrue,
        "ground truth must ignore the cap (it reports what LSH missed)")
    }
  }

  test("componentsFrom: superstep loop agrees with the driver union-find") {
    import spark.implicits._
    // chain, 3-cycle, isolated edge — forced down BOTH arms: the
    // production bound sends every testbed graph to the driver
    // union-find, so without forcing bound=0 the distributed loop
    // would be dead code under test
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)).toDF("i", "j")
    val want = Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
    val viaDriver = DedupOps.componentsFrom(pairs)
    val viaLoop = DedupOps.componentsFrom(pairs, driverBound = 0)
    try {
      def toSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(toSet(viaDriver) == want)
      assert(toSet(viaLoop) == want, "superstep arm diverged from union-find")
    } finally {
      DedupOps.unpersistCheckpointed(viaDriver)
      DedupOps.unpersistCheckpointed(viaLoop)
    }
  }

  test("q51: histogram quantile equals the binned exact order statistic") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q51_quantile_day2")(spark, sf).collect()
    assert(out.nonEmpty)
    // independent derivation: the first bin whose cumulative count
    // reaches ceil(kN/100) is by definition the bin holding the
    // ceil(kN/100)-th smallest value — so pXX_cents must equal that
    // order statistic's own bin edge
    val byFlag = graft.Tables(spark, sf, "lineitem")
      .select($"l_returnflag".as("f"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)).sorted }
    out.foreach { r =>
      val f = r.getString(0)
      val vs = byFlag(f)
      assert(r.getAs[Long]("n_rows") == vs.length.toLong)
      Seq(50, 90, 99).foreach { k =>
        val target = (vs.length.toLong * k + 99) / 100 // ceil(kN/100)
        val exact = vs((target - 1).toInt)
        assert(r.getAs[Long](s"p${k}_cents") == exact / 12800L * 12800L,
          s"flag $f p$k")
      }
    }
    // read idempotence: the delta never persists
    val again = graft.SparkEntry.queries("q51_quantile_day2")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(_.toSeq).toSeq)
  }

  test("m9: a sig crossing the df-cap retracts standing pairs") {
    import spark.implicits._
    // frames are 16-char substrings at 64-char stride; texts are built
    // so frame boundaries land exactly on shared/unique 16+48 blocks
    val A = "A" * 16; val B = "B" * 16; val F = "F" * 16; val G = "G" * 16
    def doc(id: Long, text: String) = (id, text, text.length.toLong)
    val old = Seq(
      // docs 1,2: sigs {A,B,D_i} — pair (1,2) shares {A,B}, jac 500‰
      doc(1L, A + "u1".padTo(48, '_') + B + "v1".padTo(48, '_') + "D1" * 8),
      doc(2L, A + "u2".padTo(48, '_') + B + "v2".padTo(48, '_') + "D2" * 8),
      // docs 3-5: sigs {A, C_i} — df(A) lands exactly AT the cap (5)
      doc(3L, A + "u3".padTo(48, '_') + "C3" * 8),
      doc(4L, A + "u4".padTo(48, '_') + "C4" * 8),
      doc(5L, A + "u5".padTo(48, '_') + "C5" * 8)
    ).toDF("doc_id", "text", "n_chars")
    val nu = Seq(
      // doc 10 carries A → df(A) = 6 > cap: A CROSSES
      doc(10L, A + "uA".padTo(48, '_') + "XX" * 8),
      // docs 11,12: a fresh near-dup pair {F,G}
      doc(11L, F + "p1".padTo(48, '_') + G),
      doc(12L, F + "p2".padTo(48, '_') + G)
    ).toDF("doc_id", "text", "n_chars")
    def st(p: String) = graft.sources.LayoutOps.stateTable(p, "m9spec")
    val ts = (st("graft_state_m9s_post"), st("graft_state_m9s_df"),
      st("graft_state_m9s_pair"), st("graft_state_m9s_n"))
    // day 1 + empty batch: output IS from-scratch m5 over the old docs —
    // pair (1,2) stands at exactly the 500‰ threshold via {A,B}
    val empty = old.limit(0)
    val d1 = MultimodalOps.m9From(ts._1, ts._2, ts._3, ts._4, old, empty)
      .collect().map(_.toSeq).toSeq
    assert(d1 == Seq(Seq(1L, 2L, 2L, 500L, 0L)), s"day-1: $d1")
    // fold the batch: A crosses the cap → (1,2) loses A (jac 333‰,
    // RETRACTED — the assertion an append-only maintainer fails);
    // (11,12) arrives at 1000‰; doc 10's A is already hot (no pairs)
    val d2 = MultimodalOps.m9From(ts._1, ts._2, ts._3, ts._4, old, nu)
      .collect().map(_.toSeq).toSeq
    assert(d2 == Seq(Seq(11L, 12L, 2L, 1000L, 1L)), s"day-2: $d2")
    // maintained-equals-derived: from-scratch m5 over the union
    val scratch = MultimodalOps.m5PairsFrom(
        MultimodalOps.m9SigsFrom(old.unionByName(nu)))
      .collect().map(_.toSeq).toSeq
    assert(d2.map(_.dropRight(1)) == scratch)
    // read idempotence
    val again = MultimodalOps.m9From(ts._1, ts._2, ts._3, ts._4, old, nu)
      .collect().map(_.toSeq).toSeq
    assert(again == d2)
  }

  test("q49: planted graph labels by component minimum") {
    import spark.implicits._
    // chain 1-2-3 (each pair twice), isolated pair (9,8) twice, and a
    // noise pair (5,6) once — below support, must not appear
    val pl = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 2L), (4L, 3L),
      (5L, 8L), (5L, 9L), (6L, 8L), (6L, 9L),
      (7L, 5L), (7L, 6L)
    ).toDF("o", "p")
    val got = RelationalOps.q49ComponentsFrom(pl)
      .collect().map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(1L, 3L, 2L, 0L),   // {1,2,3}, edges (1,2)(2,3)
      Seq(8L, 2L, 1L, 0L)))  // {8,9}
  }
}
