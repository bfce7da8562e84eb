package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Maintainer #14 — streaming top-k per group under a mixed CDC feed,
  * maintained through the threshold invariant (buf = survivors ≥ θ).
  * The invariant every test pins: after ANY batch prefix, serve equals
  * the per-group top-k of exactly the net surviving rows. The planted
  * drive walks the precise sequence that corrupts a naive buffer-merge
  * (a below-θ add entering a deletion-shrunk buffer). */
class TopkStreamSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val K = graft.operators.RelationalOps.Q64K

  private def digest(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  /** Per-group top-k of the net survivors, straight from the fact log. */
  private def truth(rows: Seq[(Long, Long, Double)]) = // (id, g, v)
    rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._1)).take(K).zipWithIndex.map {
        case (r, i) => Seq[Any](g, (i + 1).toLong, r._1, r._3)
      }
    }.sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

  private def at(day: Int) = Timestamp.valueOf(
    java.time.LocalDate.of(2024, 7, 1).plusDays(day.toLong).atTime(12, 0))

  private def cdc(rows: Seq[(Long, Long, Double, Int, String)]) =
    rows.map(r => (r._1, r._2, r._3, at(r._4), r._5))
      .toDF("event_id", "g", "v", "ts", "op")

  test("streaming top-k: a below-θ add stays out of the buffer, a " +
      "deletion-driven underflow refills from the ledger (resurfacing " +
      "that add), overflow re-trims and tightens θ — serve equals the " +
      "net top-k after every batch; crash invisible; replay no-op") {
    val prefix = "graft_state_topk"
    val store = new EpochStore(prefix, "spec", StreamOps.TopkTables)
    store.destroy(spark)
    def serve() = digest(StreamOps.topkServe(spark, prefix, "spec"))
    def buf() = store.snap(spark, "buf").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet // (g, id)
    // b1: g1 gets ids 1..8 with v = 100,90,...,30; g2 a bystander
    val b1 = (1L to 8L).map(i => (i, 1L, 110.0 - 10 * i, 0, "add")) ++
      Seq((100L, 2L, 7.0, 0, "add"))
    StreamOps.topkBatch(cdc(b1), prefix, "spec")
    val live1 = b1.map(r => (r._1, r._2, r._3))
    assert(serve() == truth(live1), "b1 serve diverged")
    assert(store.snap(spark, "thr").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSet == Set((1L, 50.0)),
      "g1's full prefix must set θ = the 6th value; g2 (1 row) must not")
    // b2: delete ids 4,5,6 (70,60,50) — buffer shrinks to 3 ≥ K, no
    // refill; serve still correct from the buffer alone
    val b2 = Seq((4L, 1L, 70.0, 1, "del"), (5L, 1L, 60.0, 1, "del"),
      (6L, 1L, 50.0, 1, "del"))
    StreamOps.topkBatch(cdc(b2), prefix, "spec")
    val live2 = live1.filterNot(r => Set(4L, 5L, 6L).contains(r._1))
    assert(serve() == truth(live2), "b2 serve diverged")
    // b3: add id 9 at v=45 — BELOW θ=50: must go to the ledger only.
    // A naive merge would admit it and later serve it over the
    // below-prefix rows the buffer no longer holds.
    StreamOps.topkBatch(cdc(Seq((9L, 1L, 45.0, 2, "add"))), prefix, "spec")
    val live3 = live2 :+ ((9L, 1L, 45.0))
    assert(!buf().contains((1L, 9L)), "a below-θ add entered the buffer")
    assert(serve() == truth(live3), "b3 serve diverged")
    // b4: delete ids 1,2 — buffer underflows (1 row < K) with a finite
    // θ: refill from the ledger must resurface 45 AND 40/30, and g1's
    // θ must clear (its 4 survivors all fit the prefix now)
    val b4 = Seq((1L, 1L, 100.0, 3, "del"), (2L, 1L, 90.0, 3, "del"))
    StreamOps.topkBatch(cdc(b4), prefix, "spec")
    val live4 = live3.filterNot(r => Set(1L, 2L).contains(r._1))
    assert(serve() == truth(live4), "b4 refill diverged")
    assert(serve().filter(_.head == 1L).map(_(3)) == Seq(80.0, 45.0, 40.0),
      s"refill must resurface the below-θ rows: ${serve()}")
    assert(!store.snap(spark, "thr").collect().exists(_.getLong(0) == 1L),
      "a refilled group holding ALL its survivors must drop θ")
    // b5: 8 high adds overflow the prefix — trim back to k+s and set a
    // fresh θ; the bystander g2 is untouched through all of it
    val b5 = (20L to 27L).map(i => (i, 1L, 150.0 + i, 4, "add"))
    StreamOps.topkBatch(cdc(b5), prefix, "spec")
    val live5 = live4 ++ b5.map(r => (r._1, r._2, r._3))
    assert(serve() == truth(live5), "b5 serve diverged")
    assert(buf().count(_._1 == 1L) == 6, "overflow did not trim to k+s")
    assert(store.snap(spark, "thr").collect()
      .exists(r => r.getLong(0) == 1L && r.getDouble(1) == 172.0),
      "overflow must tighten θ to the new 6th value")
    assert(serve().filter(_.head == 2L) == Seq(Seq(2L, 1L, 100L, 7.0)),
      "the bystander group moved")
    // crash-before-commit stays invisible; the retry lands exactly once
    val b6 = Seq((30L, 2L, 9.0, 5, "add"))
    intercept[EpochStore.InjectedCrash] {
      StreamOps.topkBatch(cdc(b6), prefix, "spec", crashBeforeCommit = true)
    }
    assert(serve() == truth(live5), "crashed batch became visible")
    StreamOps.topkBatch(cdc(b6), prefix, "spec")
    val live6 = live5 :+ ((30L, 2L, 9.0))
    assert(serve() == truth(live6), "post-crash retry did not land once")
    // replaying a processed add AFTER its del must not resurrect it
    val epochBefore = store.committed(spark)._1
    StreamOps.topkBatch(cdc(b2 ++ Seq((4L, 1L, 70.0, 1, "add"))),
      prefix, "spec")
    assert(store.committed(spark)._1 == epochBefore,
      "replayed batch opened a new epoch")
    assert(serve() == truth(live6), "replay moved the state")
    store.destroy(spark)
  }

  test("streaming top-k: deleting a θ'd group's ENTIRE buffer in one " +
      "batch (no same-batch adds) still refills from the ledger — the " +
      "empty group produces no count row, which a count-driven refill " +
      "set silently skips") {
    val prefix = "graft_state_etopk"
    val store = new EpochStore(prefix, "spec", StreamOps.TopkTables)
    store.destroy(spark)
    def serve() = digest(StreamOps.topkServe(spark, prefix, "spec"))
    // 8 rows: buffer = top 6 (100..50), θ = 50; 40 and 30 below θ
    val b1 = (1L to 8L).map(i => (i, 1L, 110.0 - 10 * i, 0, "add"))
    StreamOps.topkBatch(cdc(b1), prefix, "spec")
    // one batch deletes ALL SIX buffer rows
    val b2 = (1L to 6L).map(i => (i, 1L, 110.0 - 10 * i, 1, "del"))
    StreamOps.topkBatch(cdc(b2), prefix, "spec")
    val live = b1.map(r => (r._1, r._2, r._3)).filterNot(r => r._1 <= 6L)
    assert(serve() == truth(live),
      s"whole-buffer erasure did not refill the below-θ survivors: ${serve()}")
    assert(serve().map(_(3)) == Seq(40.0, 30.0), s"got ${serve()}")
    assert(!store.snap(spark, "thr").collect().exists(_.getLong(0) == 1L),
      "the refilled 2-row group must drop its stale θ")
    store.destroy(spark)
  }

  test("streaming top-k: seeded-random mixed CDC drive with a " +
      "mid-drive ledger compaction — serve equals the net top-k after " +
      "EVERY batch (seeds 1..2)") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- 1 to 2) {
      val rng = new scala.util.Random(1800 + seed)
      val prefix = s"graft_state_rtopk$seed"
      val store = new EpochStore(prefix, "spec", StreamOps.TopkTables)
      store.destroy(spark)
      var nextId = 1L
      var live = Vector.empty[(Long, Long, Double)] // (id, g, v)
      var deleted = Set.empty[Long]
      val input = MemoryStream[(Long, Long, Double, Timestamp, String)]
      val q = StreamOps.streamingTopk(
        input.toDF().toDF("event_id", "g", "v", "ts", "op"),
        prefix, "spec").start()
      try {
        for (step <- 1 to 8) {
          val adds = (1 to (3 + rng.nextInt(12))).map { _ =>
            val r = (nextId, 1L + rng.nextInt(5),
              (rng.nextInt(500) + 1).toDouble)
            nextId += 1; r
          }
          live ++= adds
          val dels = rng.shuffle(live.filterNot(r => deleted(r._1)))
            .take(rng.nextInt(4))
          deleted ++= dels.map(_._1)
          val replays = rng.shuffle(live.take(5)).take(rng.nextInt(2))
            .map(r => (r._1, r._2, r._3, at(0), "add"))
          input.addData(rng.shuffle(
            adds.map(r => (r._1, r._2, r._3, at(step), "add")) ++
              dels.map(r => (r._1, r._2, r._3, at(step), "del")) ++
              replays): _*)
          q.processAllAvailable()
          if (step == 4) {
            StreamOps.topkCompact(spark, prefix, "spec", horizonDays = 365)
            val net = live.filterNot(r => deleted(r._1))
            val ledgerIds = store.log(spark, "base").collect()
              .map(_.getLong(1)).toSet
            assert(ledgerIds == net.map(_._1).toSet,
              s"compaction did not fold the ledger to its survivors: " +
                s"extra=${ledgerIds -- net.map(_._1).toSet} " +
                s"missing=${net.map(_._1).toSet -- ledgerIds}")
          }
          val net = live.filterNot(r => deleted(r._1))
          assert(digest(StreamOps.topkServe(spark, prefix, "spec"))
            == truth(net),
            s"serve diverged at seed $seed step $step")
        }
      } finally q.stop()
      store.destroy(spark)
    }
  }
}
