package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** The transactional contract of [[EpochStore]] (r11 verdict #5): a
  * maintainer's multi-table batch commits atomically at the pointer
  * flip. The crash tests kill a batch AFTER its data tables land but
  * BEFORE the flip (the exact window the r11 duals could only
  * document) and prove (a) a reader still sees the pre-batch state in
  * FULL, (b) plain re-delivery converges to the from-scratch rebuild. */
class EpochCommitSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = SharedSpark.sf

  private def baskets() = {
    import spark.implicits._
    val pl = graft.Tables(spark, sf, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .as[(Long, Long)].collect().toSeq
    val orders = pl.map(_._1).distinct.sorted
    val day1 = orders.take(orders.length / 2).toSet
    pl.partition { case (o, _) => day1(o) }
  }

  test("components: crash between state write and epoch flip leaves " +
       "readers on the pre-batch state; re-delivery converges") {
    import spark.implicits._
    val store = new EpochStore("graft_state_ecc", "crash",
      StreamOps.ComponentsTables)
    store.destroy(spark)
    val (b1, b2) = baskets()
    // day 1 commits normally
    StreamOps.componentsBatch(b1.toDF("o", "p"), "graft_state_ecc", "crash")
    assert(store.committed(spark)._1 == 1)
    def state() = (
      store.snap(spark, "cnt").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap,
      store.snap(spark, "lbl").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      store.log(spark, "proc").count())
    val day1State = state()
    // day 2 crashes INSIDE the multi-table write: counts, labels, and
    // the processed-id delta have all LANDED as epoch-2 tables when the
    // injected kill fires — the r11 window (counts landed, marker not)
    // is strictly contained in this one
    intercept[EpochStore.InjectedCrash] {
      StreamOps.componentsBatch(b2.toDF("o", "p"), "graft_state_ecc",
        "crash", crashBeforeCommit = true)
    }
    // the orphan epoch-2 tables exist on disk...
    assert(spark.catalog.tableExists(s"${store.tag}_cnt__e2"),
      "crash test did not land its data tables first")
    // ...but a reader resolves the pointer and sees day 1, in full
    assert(store.committed(spark)._1 == 1,
      "crash moved the committed pointer")
    assert(state() == day1State,
      "a reader observed a partially-committed batch")
    // recovery = plain re-delivery of the SAME batch: the replay guard
    // probes committed state, sees it unprocessed, recomputes, and
    // overwrites the orphans; the flip commits everything at once
    StreamOps.componentsBatch(b2.toDF("o", "p"), "graft_state_ecc", "crash")
    assert(store.committed(spark)._1 == 2, "recovery did not commit")
    // converged state == from-scratch init over the union corpus
    val c2 = "ecc_rebuild_cnt"; val l2 = "ecc_rebuild_lbl"
    Seq(c2, l2).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.operators.RelationalOps.q50InitState(
      (b1 ++ b2).toDF("o", "p"), c2, l2)
    val (gotCnt, gotLbl, _) = state()
    assert(gotCnt == spark.table(c2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap,
      "recovered counts diverged from rebuild")
    assert(gotLbl == spark.table(l2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "recovered labels diverged from rebuild")
    Seq(c2, l2).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    store.destroy(spark)
  }

  test("components: crash mid-DAY-1 leaves no committed epoch; " +
       "re-delivery initializes cleanly over the orphans") {
    import spark.implicits._
    val store = new EpochStore("graft_state_ecd1", "crash",
      StreamOps.ComponentsTables)
    store.destroy(spark)
    val (b1, _) = baskets()
    intercept[EpochStore.InjectedCrash] {
      StreamOps.componentsBatch(b1.toDF("o", "p"), "graft_state_ecd1",
        "crash", crashBeforeCommit = true)
    }
    assert(!store.exists(spark), "crashed day-1 committed a pointer")
    StreamOps.componentsBatch(b1.toDF("o", "p"), "graft_state_ecd1", "crash")
    assert(store.committed(spark)._1 == 1)
    assert(store.snap(spark, "lbl").count() > 0)
    store.destroy(spark)
  }

  test("bm25: crash before flip is invisible to readers; recovery " +
       "equals the from-scratch index") {
    import spark.implicits._
    val store = new EpochStore("graft_state_ebm", "crash",
      StreamOps.Bm25Tables)
    store.destroy(spark)
    val all = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
      .toSeq
    val (b1, b2) = all.splitAt(all.length / 2)
    StreamOps.bm25Batch(b1.toDF("doc_id", "text"), "graft_state_ebm", "crash")
    val day1Post = store.log(spark, "post").count()
    val day1Df = store.snap(spark, "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    intercept[EpochStore.InjectedCrash] {
      StreamOps.bm25Batch(b2.toDF("doc_id", "text"), "graft_state_ebm",
        "crash", crashBeforeCommit = true)
    }
    assert(store.log(spark, "post").count() == day1Post,
      "crashed batch's posting delta is visible")
    assert(store.snap(spark, "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == day1Df,
      "crashed batch's df fold is visible")
    StreamOps.bm25Batch(b2.toDF("doc_id", "text"), "graft_state_ebm", "crash")
    val tfAll = graft.operators.TextOps.bm25TfOf(
      graft.Tables(spark, sf, "documents").select($"doc_id", $"text"))
    assert(store.log(spark, "post").select($"doc_id", $"term", $"tf")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap ==
      tfAll.collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap,
      "recovered posting list diverged from rebuild")
    assert(store.snap(spark, "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      tfAll.groupBy($"term").agg(count(lit(1)).as("df")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      "recovered df diverged from rebuild")
    store.destroy(spark)
  }

  test("ivm: batchId guard makes an additive fold replay-safe; crash " +
       "before flip rolls the fold back") {
    import spark.implicits._
    val store = new EpochStore("graft_state_eivm", "crash",
      StreamOps.IvmTables)
    store.destroy(spark)
    val rows = graft.Tables(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val (h1, h2) = rows.splitAt(rows.length / 2)
    def df(rs: Seq[(String, String, Double, Double)]) =
      rs.toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice")
    def nRows() = store.snap(spark, "summary")
      .agg(sum($"n_rows")).collect()(0).getLong(0)
    StreamOps.ivmBatch(df(h1), "graft_state_eivm", "crash", batchId = 0L)
    assert(nRows() == h1.length)
    // a re-delivered batch (same batchId) must NOT double-count — the
    // additive fold has no content guard, only the committed batchId
    StreamOps.ivmBatch(df(h1), "graft_state_eivm", "crash", batchId = 0L)
    assert(nRows() == h1.length, "replayed additive batch double-counted")
    assert(store.committed(spark)._1 == 1,
      "replayed additive batch opened a new epoch")
    // crash mid-batch-2: the landed epoch-2 summary is unreachable
    intercept[EpochStore.InjectedCrash] {
      StreamOps.ivmBatch(df(h2), "graft_state_eivm", "crash",
        batchId = 1L, crashBeforeCommit = true)
    }
    assert(nRows() == h1.length, "crashed fold is visible to readers")
    assert(store.lastBatchId(spark) == 0L,
      "crash advanced the committed batchId")
    // recovery: same batchId re-delivered — the guard sees it
    // UNcommitted (the id flips only with the data) and re-runs it
    StreamOps.ivmBatch(df(h2), "graft_state_eivm", "crash", batchId = 1L)
    assert(nRows() == rows.length, "recovery lost rows")
    assert(store.lastBatchId(spark) == 1L)
    // a batchId STRICTLY below the committed one can only mean the
    // streaming checkpoint was reset while the store survived — the
    // guard must fail loudly, not silently drop batches until ids
    // catch up (share-fate contract)
    val e = intercept[IllegalStateException] {
      StreamOps.ivmBatch(df(h1), "graft_state_eivm", "crash", batchId = 0L)
    }
    assert(e.getMessage.contains("checkpoint was reset"),
      s"unhelpful reset error: ${e.getMessage}")
    assert(nRows() == rows.length,
      "post-reset batch wrote state before failing")
    store.destroy(spark)
  }

  test("scd2: crash before flip leaves the dimension on the previous " +
       "version; recovery merges once") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val store = new EpochStore("graft_state_escd", "crash",
      StreamOps.Scd2Tables)
    store.destroy(spark)
    val b1 = Seq((1L, "A#0", ts("2024-01-01 00:00:00")),
                 (2L, "B#0", ts("2024-01-01 00:00:00")))
    val b2 = Seq((1L, "A#1", ts("2024-02-01 00:00:00")))
    def df(rs: Seq[(Long, String, java.sql.Timestamp)]) =
      rs.toDF("k", "seg_v", "valid_from")
    StreamOps.scd2Batch(df(b1), "graft_state_escd", "crash")
    assert(store.snap(spark, "dim").count() == 2)
    intercept[EpochStore.InjectedCrash] {
      StreamOps.scd2Batch(df(b2), "graft_state_escd", "crash",
        crashBeforeCommit = true)
    }
    assert(store.snap(spark, "dim").count() == 2,
      "crashed merge is visible to readers")
    StreamOps.scd2Batch(df(b2), "graft_state_escd", "crash")
    val dim = store.snap(spark, "dim")
    assert(dim.count() == 3)
    assert(dim.filter($"k" === 1 && $"is_current").collect()
      .map(_.getString(1)).toSeq == Seq("A#1"),
      "recovered dimension has the wrong current version")
    store.destroy(spark)
  }

  test("triangles: crash before flip keeps edge log and counts " +
       "consistent as a pair; recovery converges") {
    import spark.implicits._
    val store = new EpochStore("graft_state_etri", "crash",
      StreamOps.TrianglesTables)
    store.destroy(spark)
    val (b1, b2) = baskets()
    StreamOps.trianglesBatch(b1.toDF("o", "p"), "graft_state_etri", "crash")
    val day1 = (store.log(spark, "edges").count(),
      store.snap(spark, "tri").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    intercept[EpochStore.InjectedCrash] {
      StreamOps.trianglesBatch(b2.toDF("o", "p"), "graft_state_etri",
        "crash", crashBeforeCommit = true)
    }
    // the CONSISTENT PAIR property — the whole point of the atomic
    // commit: after the crash, edges and counts are both day-1 (the
    // half-transaction where counts moved but edges didn't, or vice
    // versa, cannot be observed)
    assert((store.log(spark, "edges").count(),
      store.snap(spark, "tri").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap) == day1,
      "crash exposed a half-committed (edges, counts) pair")
    StreamOps.trianglesBatch(b2.toDF("o", "p"), "graft_state_etri", "crash")
    val ed = graft.operators.RelationalOps.basketPairs(
        (b1 ++ b2).toDF("o", "p")).distinct()
    val und = ed.unionByName(ed.select($"b".as("a"), $"a".as("b")))
    val want = graft.operators.RelationalOps.q44TrianglesCorners(ed,
        und.groupBy($"a".as("n")).agg(count(lit(1)).as("d")))
      .groupBy($"n").agg(count(lit(1)).as("tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(store.snap(spark, "tri").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == want,
      "recovered triangle counts diverged from rebuild")
    store.destroy(spark)
  }

  test("media dedup: crash before flip keeps all five tables on the " +
       "pre-batch epoch; recovery converges to the rebuild") {
    import spark.implicits._
    val A = "A" * 16; val B = "B" * 16
    def doc(id: Long, text: String) = (id, text, text.length.toLong)
    val b1 = Seq(
      doc(1L, A + "u1".padTo(48, '_') + B),
      doc(2L, A + "u2".padTo(48, '_') + B),
      doc(3L, A + "u3".padTo(48, '_') + "C3" * 8))
    val b2 = Seq(doc(4L, A + "u4".padTo(48, '_') + "C4" * 8))
    val store = new EpochStore("graft_state_emd", "crash",
      StreamOps.MediaDedupTables)
    store.destroy(spark)
    def df(rs: Seq[(Long, String, Long)]) =
      rs.toDF("doc_id", "text", "n_chars")
    StreamOps.mediaDedupBatch(df(b1), "graft_state_emd", "crash")
    def full() = Seq("df", "pair", "n").map(n =>
      store.snap(spark, n).collect().map(_.toSeq.mkString(",")).sorted.toSeq)
    val day1 = (full(), store.log(spark, "post").count(),
      store.log(spark, "proc").count())
    intercept[EpochStore.InjectedCrash] {
      StreamOps.mediaDedupBatch(df(b2), "graft_state_emd", "crash",
        crashBeforeCommit = true)
    }
    assert((full(), store.log(spark, "post").count(),
      store.log(spark, "proc").count()) == day1,
      "crash exposed a half-committed five-table write")
    StreamOps.mediaDedupBatch(df(b2), "graft_state_emd", "crash")
    // rebuild ground truth over the union
    val g = Seq("emd_g_post", "emd_g_df", "emd_g_pair", "emd_g_n")
    g.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.operators.MultimodalOps.m9InitState(
      df(b1 ++ b2), g(0), g(1), g(2), g(3))
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq.mkString(",")).sorted.toSeq
    assert(m(store.snap(spark, "pair")) == m(spark.table("emd_g_pair")),
      "recovered pairs diverged from rebuild")
    assert(m(store.snap(spark, "df")) == m(spark.table("emd_g_df")),
      "recovered df diverged from rebuild")
    g.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    store.destroy(spark)
  }

  test("epoch store: committed reads ADOPT unregistered directories " +
       "(the warehouse outlives the in-memory catalog); time travel " +
       "reads any un-vacuumed epoch") {
    import spark.implicits._
    val store = new EpochStore("graft_state_eadopt", "crash",
      EpochTables(snaps = Map("x" -> Nil), logs = Map("l" -> Nil)))
    store.destroy(spark)
    // a PRIOR PROCESS committed epochs 1 and 2: its tables exist as
    // warehouse directories but this process's catalog has no entries —
    // write them as bare paths and hand-flip the pointer
    def pathOf(t: String) = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(
      pathOf(s"${store.tag}_x__e1"))
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(
      pathOf(s"${store.tag}_x__e2"))
    Seq(10L).toDF("o").write.parquet(pathOf(s"${store.tag}_l__d1"))
    Seq(20L).toDF("o").write.parquet(pathOf(s"${store.tag}_l__d2"))
    store.flip(spark, 2, 0, -1L)
    // committed reads resolve through adoption — no catalog entries yet
    assert(store.snap(spark, "x").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))
    assert(store.log(spark, "l").collect().map(_.getLong(0)).toSet
      == Set(10L, 20L))
    // time travel: epoch 1 is un-vacuumed, so AS OF 1 still reads
    assert(store.snapAt(spark, "x", 1).collect().map(_.getLong(0)).toSet
      == Set(1L))
    intercept[IllegalArgumentException] { store.snapAt(spark, "x", 3) }
    // vacuum drops the superseded epoch; the committed one survives
    store.vacuum(spark)
    assert(store.snap(spark, "x").count() == 2)
    store.destroy(spark)
  }

  test("retractions: crash between subtraction fold and flip is " +
       "invisible; recovery converges to the rebuild over the " +
       "surviving corpus") {
    import spark.implicits._
    val store = new EpochStore("graft_state_eret", "crash",
      StreamOps.RetractTables)
    store.destroy(spark)
    val (b1, b2) = baskets()
    val all = b1 ++ b2
    // whole baskets per deletion batch (the operator's contract):
    // split b2's ORDERS, not its rows
    val delOrdersAll = b2.map(_._1).distinct.sorted
    val del1Orders = delOrdersAll.take(delOrdersAll.length / 2).toSet
    val del1 = b2.filter { case (o, _) => del1Orders(o) }
    val del2 = b2.filterNot { case (o, _) => del1Orders(o) }
    def corpus = all.toDF("o", "p")
    // day 1 init + first deletion batch commit normally
    StreamOps.retractBatch(del1.toDF("o", "p"), corpus,
      "graft_state_eret", "crash")
    def state() = (
      store.snap(spark, "cnt").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap,
      store.snap(spark, "lbl").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      store.snap(spark, "tr").collect()(0).getLong(0),
      store.log(spark, "proc").count())
    val afterDel1 = state()
    val epochAfterDel1 = store.committed(spark)._1
    // replay of the committed deletion batch: TRUE no-op — a re-
    // delivered retraction must never double-delete
    StreamOps.retractBatch(del1.toDF("o", "p"), corpus,
      "graft_state_eret", "crash")
    assert(store.committed(spark)._1 == epochAfterDel1,
      "replayed deletion batch opened a new epoch")
    assert(state() == afterDel1, "replayed deletion batch double-deleted")
    // second deletion batch crashes AFTER all four tables land, BEFORE
    // the flip — the kill window the epoch commit closes
    intercept[EpochStore.InjectedCrash] {
      StreamOps.retractBatch(del2.toDF("o", "p"), corpus,
        "graft_state_eret", "crash", crashBeforeCommit = true)
    }
    assert(state() == afterDel1,
      "a reader observed a partially-committed retraction")
    // recovery = plain re-delivery
    StreamOps.retractBatch(del2.toDF("o", "p"), corpus,
      "graft_state_eret", "crash")
    // maintained state ≡ from-scratch build over corpus MINUS deletions
    // (the equivalence q52's batch oracle certifies) — i.e. exactly b1
    val surviving = all.filterNot { case (o, _) =>
      delOrdersAll.contains(o) }
    val c2 = "eret_rebuild_cnt"; val l2 = "eret_rebuild_lbl"
    Seq(c2, l2).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.operators.RelationalOps.q50InitState(
      surviving.toDF("o", "p"), c2, l2)
    val (gotCnt, gotLbl, gotTr, _) = state()
    assert(gotCnt == spark.table(c2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap,
      "retracted counts diverged from rebuild over the surviving corpus")
    assert(gotLbl == spark.table(l2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "retracted labels diverged from rebuild over the surviving corpus")
    assert(gotTr == graft.operators.RelationalOps
      .truncatedBaskets(surviving.toDF("o", "p")).collect()(0).getLong(0),
      "folded truncation count diverged from rebuild")
    Seq(c2, l2).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    store.destroy(spark)
  }

  test("epoch store: two writers racing the same epoch — exactly one " +
       "commits and the loser throws (create-exclusive commit fence)") {
    import spark.implicits._
    val store = new EpochStore("graft_state_erace", "crash",
      EpochTables(snaps = Map("x" -> Nil), logs = Map.empty))
    store.destroy(spark)
    store.transact(spark, 0L)(_.writeSnap("x", Seq(1L).toDF("k")))
    assert(store.committed(spark)._1 == 1)
    // writer A opens epoch 2 and writes; before A's flip, writer B runs
    // a COMPLETE transaction for the same epoch (the interleaving a
    // second streaming query against one store would produce). B's
    // commit lands; A's flip must fail loudly, never last-write-win.
    intercept[EpochStore.ConcurrentCommitException] {
      store.transact(spark, 1L) { tx =>
        tx.writeSnap("x", Seq(2L, 3L).toDF("k"))
        store.transact(spark, 1L)(_.writeSnap("x", Seq(9L).toDF("k")))
      }
    }
    // exactly one commit: readers see B's epoch 2 in full
    assert(store.committed(spark)._1 == 2,
      "the racing commit did not land exactly once")
    assert(store.snap(spark, "x").collect().map(_.getLong(0)).toSet
      == Set(9L), "loser's write leaked into the committed epoch")
    store.destroy(spark)
  }

  test("epoch store: post-restart adoption re-registers the bucket " +
       "spec; the standing-side fold stays exchange-free") {
    import spark.implicits._
    val store = new EpochStore("graft_state_ebkt", "crash",
      EpochTables(snaps = Map("cnt" -> Seq("a", "b")), logs = Map.empty))
    store.destroy(spark)
    val day1 = (1L to 200L).map(i => (i, i % 7, 1L)).toDF("a", "b", "n")
    store.transact(spark, 0L)(_.writeSnap("cnt", day1))
    val t = s"${store.tag}_cnt__e1"
    // simulate a process restart: the warehouse survives, the catalog
    // entry (and with it the bucket-spec metadata) does not — move the
    // directory aside, drop the entry, move the files back
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(t)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(loc.getParent,
      loc.getName + "_aside")
    assert(fs.rename(loc, aside))
    spark.sql(s"DROP TABLE IF EXISTS $t")
    assert(fs.rename(aside, loc))
    assert(!spark.catalog.tableExists(t), "restart simulation leaked")
    // adoption must restore CLUSTERED/SORTED BY from the store's own
    // declaration — the fold shape every maintainer relies on: merge
    // join with the standing side scanning bucketed, zero exchange.
    // The COUNT must be the count the files were WRITTEN with (the
    // epoch pointer records it; r16): this session writes with
    // stateBuckets = 4, and an adoption re-declaring any other count
    // (the old hardcoded 32) would misdescribe every file's bucket id —
    // co-partitioned probes would silently MISS matches.
    val written = graft.sources.LayoutOps.stateBuckets(spark)
    store.snap(spark, "cnt") // triggers adoption
    val adopted = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.map(_.numBuckets)
    assert(adopted.contains(written),
      s"adopted bucket count $adopted != written $written")
    val delta = Seq((1L, 1L, 5L)).toDF("a", "b", "n_del")
    val fold = store.snap(spark, "cnt").hint("merge")
      .join(delta.repartition(
        graft.sources.LayoutOps.tableBuckets(spark, t), $"a", $"b"),
        Seq("a", "b"), "left")
    val plan = fold.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def cntScan(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths
          .exists(_.toString.contains(s"${store.tag}_cnt__e1")) => s
    }
    val scans = cntScan(plan)
    assert(scans.nonEmpty && scans.forall(_.bucketedScan),
      s"adopted standing table not scanned bucketed:\n$plan")
    val folds = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if cntScan(j).nonEmpty => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if cntScan(j).nonEmpty => j
    }
    assert(folds.nonEmpty, s"no fold join over the adopted table:\n$plan")
    folds.minBy(_.collect { case p => p }.size)
      .children.filter(c => cntScan(c).nonEmpty).foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(ex.isEmpty,
          s"post-restart standing side rides ${ex.size} exchange(s):\n$plan")
      }
    // and the adopted content is intact — including JOIN CORRECTNESS
    // through the bucketed path: a co-partitioned probe under a
    // misdeclared count loses exactly the rows whose hash%written
    // placement differs from hash%declared, so every key must match
    val probe = (1L to 200L).map(i => (i, i % 7)).toDF("a", "b")
      .repartition(graft.sources.LayoutOps.tableBuckets(spark, t),
        $"a", $"b")
    val hit = store.snap(spark, "cnt").hint("merge")
      .join(probe, Seq("a", "b"), "inner").count()
    assert(hit == 200, s"bucketed probe found $hit of 200 rows — " +
      "adopted bucket spec misdescribes the files")
    assert(store.snap(spark, "cnt").count() == 200)
    store.destroy(spark)
  }

  test("epoch store: vacuum reclaims epochs stranded by a prior " +
       "process (warehouse enumeration, not catalog-only); retain " +
       "keeps the time-travel window") {
    import spark.implicits._
    val store = new EpochStore("graft_state_evac", "crash",
      EpochTables(snaps = Map("x" -> Nil), logs = Map.empty))
    store.destroy(spark)
    def pathOf(t: String) = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).toString
    // a prior process committed epochs 1..3; NOTHING is in this
    // process's catalog (bare-path writes + hand flip)
    (1 to 3).foreach(k => Seq(k.toLong).toDF("k")
      .write.parquet(pathOf(s"${store.tag}_x__e$k")))
    store.flip(spark, 1, 0, -1L); store.flip(spark, 2, 0, -1L)
    store.flip(spark, 3, 0, -1L)
    val fs = new org.apache.hadoop.fs.Path(pathOf(s"${store.tag}_x__e1"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def onDisk(k: Int) = fs.exists(
      new org.apache.hadoop.fs.Path(pathOf(s"${store.tag}_x__e$k")))
    // retain=1 keeps the last superseded epoch for snapAt/in-flight
    // readers, reclaims older strays — from DISK, not the catalog
    store.vacuum(spark, retain = 1)
    assert(!onDisk(1), "catalog-only vacuum stranded a prior process's epoch")
    assert(onDisk(2) && onDisk(3), "vacuum ate the retained window")
    assert(store.snapAt(spark, "x", 2).collect().map(_.getLong(0)).toSeq
      == Seq(2L), "retained epoch not readable via time travel")
    store.vacuum(spark)
    assert(!onDisk(2) && onDisk(3), "default vacuum semantics changed")
    store.destroy(spark)
    assert(!onDisk(3), "destroy left a stranded directory")
  }

  test("components: compaction folds the proc-log chain into one base; " +
       "day-3 folds against the compacted store identically") {
    import spark.implicits._
    val store = new EpochStore("graft_state_ecpt", "crash",
      StreamOps.ComponentsTables)
    store.destroy(spark)
    val (b1, rest) = baskets()
    val orders2 = rest.map(_._1).distinct.sorted
    val day2 = orders2.take(orders2.length / 2).toSet
    val (b2, b3) = rest.partition { case (o, _) => day2(o) }
    StreamOps.componentsBatch(b1.toDF("o", "p"), "graft_state_ecpt", "crash")
    StreamOps.componentsBatch(b2.toDF("o", "p"), "graft_state_ecpt", "crash")
    val procBefore = store.log(spark, "proc").count()
    store.compact(spark)
    assert(store.log(spark, "proc").count() == procBefore,
      "compaction changed the processed-id log content")
    // the log is now ONE bucketed base table
    val (e, b, _) = store.committed(spark)
    assert(b == e, "compaction did not reset the log base")
    assert(spark.catalog.tableExists(s"${store.tag}_proc__b$b"))
    // day 3 maintains against the compacted store
    StreamOps.componentsBatch(b3.toDF("o", "p"), "graft_state_ecpt", "crash")
    val c2 = "ecpt_rebuild_cnt"; val l2 = "ecpt_rebuild_lbl"
    Seq(c2, l2).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.operators.RelationalOps.q50InitState(
      (b1 ++ b2 ++ b3).toDF("o", "p"), c2, l2)
    assert(store.snap(spark, "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap ==
      spark.table(c2).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap,
      "post-compaction fold diverged from rebuild")
    Seq(c2, l2).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    store.destroy(spark)
  }

  test("skyline: compaction folds the ins/delx/proc log chains into " +
      "bases; folds and repair against the compacted store are " +
      "identical") {
    import spark.implicits._
    val store = new EpochStore("graft_state_csky", "crash",
      StreamOps.SkylineTables)
    store.destroy(spark)
    val corpus = Seq((1L, 1.0, 10), (2L, 2.0, 9), (3L, 3.0, 8),
      (4L, 4.0, 7), (5L, 5.0, 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
    def batch(rows: (Long, Double, Int, String)*) =
      rows.toDF("p_partkey", "p_retailprice", "p_size", "op")
    def serve() = StreamOps
      .skylineServe(spark, "graft_state_csky", "crash")
      .select($"p_partkey").as[Long].collect().toSet
    StreamOps.skylineBatch(batch((6L, 0.5, 11, "insert")), corpus,
      "graft_state_csky", "crash")
    StreamOps.skylineBatch(batch((6L, 0.0, 0, "delete"),
      (1L, 0.0, 0, "delete")), corpus, "graft_state_csky", "crash")
    val before = (store.log(spark, "ins").count(),
      store.log(spark, "delx").count(), store.log(spark, "proc").count())
    store.compact(spark)
    assert((store.log(spark, "ins").count(),
      store.log(spark, "delx").count(),
      store.log(spark, "proc").count()) == before,
      "compaction changed log contents")
    val (e, b, _) = store.committed(spark)
    assert(b == e, "compaction did not reset the log base")
    assert(serve() == Set(2L))
    // a post-compaction deletion pushes past the budget → the REPAIR
    // reads the COMPACTED delx log; dropping history here would
    // resurrect keys 6/1
    StreamOps.skylineBatch(batch((2L, 0.0, 0, "delete")), corpus,
      "graft_state_csky", "crash")
    assert(serve() == Set(3L),
      "repair against the compacted deletion log diverged")
    store.destroy(spark)
  }

  test("skyline: cascade inserts, budgeted deletions, crash " +
      "invisibility, replay inertness, and the repair pass that " +
      "recovers a dropped layer point — all against from-scratch") {
    import spark.implicits._
    val store = new EpochStore("graft_state_esky", "crash",
      StreamOps.SkylineTables)
    store.destroy(spark)
    // the planted chain: each point dominates the next, so the three
    // stored layers hold exactly {1}, {2}, {3}; 4 and 5 sit below
    val corpus = Seq((1L, 1.0, 10), (2L, 2.0, 9), (3L, 3.0, 8),
      (4L, 4.0, 7), (5L, 5.0, 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
    def serve() = StreamOps
      .skylineServe(spark, "graft_state_esky", "crash")
      .select($"p_partkey").as[Long].collect().toSeq.sorted
    def truth(live: org.apache.spark.sql.DataFrame) =
      graft.operators.RelationalOps.q56From(live)
        .select($"p_partkey").as[Long].collect().toSeq.sorted
    def batch(rows: (Long, Double, Int, String)*) =
      rows.toDF("p_partkey", "p_retailprice", "p_size", "op")
    // batch 1: an insert that EVICTS the standing frontier — the
    // cascade must demote 1→L2, 2→L3 and drop 3 from state
    StreamOps.skylineBatch(batch((6L, 0.5, 11, "insert")), corpus,
      "graft_state_esky", "crash")
    val c1 = corpus.unionByName(Seq((6L, 0.5, 11))
      .toDF("p_partkey", "p_retailprice", "p_size"))
    assert(serve() == truth(c1) && serve() == Seq(6L))
    assert(store.snap(spark, "l2").select($"p_partkey")
      .as[Long].collect().toSeq == Seq(1L), "cascade did not demote")
    // batch 2: two deletions — within the k = 2 budget, so the fold is
    // metadata-only (no repair) and the count is carried
    val del2 = batch((6L, 0.0, 0, "delete"), (1L, 0.0, 0, "delete"))
    StreamOps.skylineBatch(del2, corpus, "graft_state_esky", "crash")
    val live2 = c1.filter(!$"p_partkey".isin(6L, 1L))
    assert(serve() == truth(live2) && serve() == Seq(2L))
    assert(store.snap(spark, "meta").select($"n_del")
      .as[Long].head() == 2L, "deletion budget not carried")
    val epoch2 = store.committed(spark)._1
    // replay of the committed deletion batch: TRUE no-op
    StreamOps.skylineBatch(del2, corpus, "graft_state_esky", "crash")
    assert(store.committed(spark)._1 == epoch2,
      "replayed batch opened a new epoch")
    // batch 3 (crash first): one more deletion pushes past the budget
    // → the REPAIR path, which must also RECOVER point 3 (dropped from
    // state by the cascade, recoverable only from corpus + logs)
    val del3 = batch((2L, 0.0, 0, "delete"))
    intercept[EpochStore.InjectedCrash] {
      StreamOps.skylineBatch(del3, corpus, "graft_state_esky", "crash",
        crashBeforeCommit = true)
    }
    assert(store.committed(spark)._1 == epoch2,
      "crash moved the committed pointer")
    assert(serve() == truth(live2),
      "a reader observed a partially-committed repair")
    // recovery = plain re-delivery; repair rebuilds the true layers
    StreamOps.skylineBatch(del3, corpus, "graft_state_esky", "crash")
    val live3 = live2.filter($"p_partkey" =!= 2L)
    assert(serve() == truth(live3) && serve() == Seq(3L),
      "repair did not recover the dropped layer point")
    assert(store.snap(spark, "meta").select($"n_del")
      .as[Long].head() == 0L, "repair did not reset the budget")
    assert(store.snap(spark, "del").count() == 0L,
      "repair did not clear the pending-deletion set")
    store.destroy(spark)
  }

  test("epoch snapshots honor graft.state.buckets: every epoch's " +
      "bucketed snap carries the configured count and the fold's " +
      "delta side tracks it (r14 verdict item 5, EpochStore arm)") {
    import spark.implicits._
    val saved = spark.conf.getOption("graft.state.buckets")
    val store = new EpochStore("graft_state_ebkt", "crash",
      StreamOps.DecayTables)
    store.destroy(spark)
    def ev(id: Long, u: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-0${id} 12:00:00"), u, v)
    try {
      spark.conf.set("graft.state.buckets", "5")
      StreamOps.decayBatch(
        Seq(ev(1, 1, 2.0)).toDF("event_id", "ts", "user_id", "value"),
        "graft_state_ebkt", "crash")
      assert(graft.sources.LayoutOps.tableBuckets(spark,
        store.snapName(spark, "daily")) == 5,
        "epoch-1 snapshot ignored graft.state.buckets")
      // the day-2 fold must keep the count across the epoch flip
      StreamOps.decayBatch(
        Seq(ev(2, 2, 3.0)).toDF("event_id", "ts", "user_id", "value"),
        "graft_state_ebkt", "crash")
      assert(graft.sources.LayoutOps.tableBuckets(spark,
        store.snapName(spark, "daily")) == 5,
        "epoch-2 snapshot lost the configured bucket count")
      assert(store.snap(spark, "daily").count() == 2)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("graft.state.buckets", v)
        case None => spark.conf.unset("graft.state.buckets")
      }
      store.destroy(spark)
    }
  }

  test("log(): identical keys spread across MULTIPLE deltas fold into " +
      "ONE group and anti-joins see every part — a multi-part log must " +
      "not expose per-table bucketing claims (a union of same-spec " +
      "bucketed scans concatenates partitions, so a subset-key " +
      "aggregate planned exchange-free splits groups)") {
    import spark.implicits._
    val store = new EpochStore("graft_state_logu", "spec",
      EpochTables(snaps = Map.empty, logs = Map("l" -> Seq("g"))))
    store.destroy(spark)
    store.transact(spark) { tx =>
      tx.writeLogDelta("l",
        Seq((1L, 1.0, 1L), (2L, 2.0, 1L)).toDF("g", "x", "w"))
    }
    store.transact(spark) { tx =>
      tx.writeLogDelta("l", Seq((1L, 1.0, -1L)).toDF("g", "x", "w"))
    }
    val folded = store.log(spark, "l")
      .groupBy($"g", $"x").agg(sum($"w").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(folded == Map((1L, 1.0) -> 0L, (2L, 2.0) -> 1L),
      s"cross-delta groups did not merge: $folded")
    // the replay-guard shape: an anti-join must drop keys from EVERY
    // part of the chain, not just the ones sharing a claimed partition
    val remaining = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("g", "y")
      .join(store.log(spark, "l").select($"g").distinct(),
        Seq("g"), "left_anti")
      .collect().map(_.getLong(0)).toSeq
    assert(remaining == Seq(3L),
      s"anti-join missed keys across the delta chain: $remaining")
    store.destroy(spark)
  }
}
