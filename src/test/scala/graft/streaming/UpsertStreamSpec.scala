package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Maintainer #13 — BIDIRECTIONAL streaming sessionization (e35's
  * mixed CDC fold behind EpochStore). The invariant every test pins:
  * after ANY batch prefix, serve equals the from-scratch sessionization
  * of exactly the net surviving events — adds minus processed dels —
  * including batches that merge, split, and cancel in one delivery,
  * replays of adds AND dels, crashes, compaction, and the horizon trim. */
class UpsertStreamSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def digest(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def truth(rows: Seq[(Long, Timestamp, Long)]) =
    digest(graft.operators.EventOps.e32Shape(
        graft.operators.EventOps.e32Sessions(
          rows.toDF("event_id", "ts", "user_id")))
      .orderBy($"user_id", $"sess_id"))

  private def at(day: Int, h: Int, m: Int) = Timestamp.valueOf(
    java.time.LocalDate.of(2024, 6, 1).plusDays(day.toLong).atTime(h, m))

  private def cdc(rows: Seq[(Long, Timestamp, Long, String)]) =
    rows.toDF("event_id", "ts", "user_id", "op")

  test("streaming upserts: one CDC feed merges (bridge add), splits " +
      "(bridge del), and cancels (same-batch add+del) — serve equals " +
      "the net rebuild; replaying a processed ADD after its DEL is a " +
      "true no-op; crash invisible; compaction keeps the guard") {
    implicit val sqlCtx = spark.sqlContext
    val prefix = "graft_state_usess"
    val store = new EpochStore(prefix, "spec", StreamOps.UpsertSessionTables)
    store.destroy(spark)
    // u1: two sessions 80 min apart (merged by b2's bridge adds);
    // u2: one session via a 30-min boundary gap (split by b2's del)
    val b1adds = Seq((1L, at(0, 10, 0), 1L), (2L, at(0, 10, 10), 1L),
      (3L, at(0, 11, 30), 1L), (4L, at(0, 11, 40), 1L),
      (5L, at(0, 9, 0), 2L), (6L, at(0, 9, 10), 2L), (7L, at(0, 9, 40), 2L))
    val b1 = b1adds.map(e => (e._1, e._2, e._3, "add"))
    // b2: bridge adds for u1; del of u2's 9:10 bridge (event 6);
    // u3: an add AND its del in the same batch — must cancel
    val b2new = Seq((8L, at(0, 10, 35), 1L), (9L, at(0, 11, 5), 1L))
    val b2 = b2new.map(e => (e._1, e._2, e._3, "add")) ++ Seq(
      (6L, at(0, 9, 10), 2L, "del"),
      (10L, at(0, 14, 0), 3L, "add"), (10L, at(0, 14, 0), 3L, "del"))
    val net12 = b1adds.filterNot(_._1 == 6L) ++ b2new
    def serve() = digest(StreamOps.upsertSessionServe(spark, prefix, "spec"))
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamOps.streamingSessionUpserts(
      input.toDF().toDF("event_id", "ts", "user_id", "op"),
      prefix, "spec").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(serve() == truth(b1adds), "day-1 serve diverged from rebuild")
      assert(serve().count(_.head == 1L) == 2, "expected 2 standing sessions")
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(serve() == truth(net12), "post-merge/split serve diverged")
      assert(serve().count(_.head == 1L) == 1, "bridge adds did not merge")
      assert(serve().count(_.head == 2L) == 2, "the del did not split")
      assert(!serve().exists(_.head == 3L),
        "a same-batch add+del pair did not cancel")
      val epochBefore = store.committed(spark)._1
      // replay the ENTIRE b1 — including the add of event 6, whose del
      // is already processed: the (id, op) guard must no-op it, not
      // resurrect the deleted event
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(store.committed(spark)._1 == epochBefore,
        "replayed batch opened a new epoch")
      assert(serve() == truth(net12),
        "replaying a processed add resurrected a deleted event")
    } finally q.stop()
    val b3 = Seq((11L, at(3, 12, 10), 3L, "add"))
    intercept[EpochStore.InjectedCrash] {
      StreamOps.upsertSessionBatch(cdc(b3), prefix, "spec",
        crashBeforeCommit = true)
    }
    assert(serve() == truth(net12),
      "crashed batch became visible before the epoch flip")
    StreamOps.upsertSessionBatch(cdc(b3), prefix, "spec")
    val net123 = net12 :+ ((11L, at(3, 12, 10), 3L))
    assert(serve() == truth(net123),
      "post-crash retry did not land exactly once")
    store.compact(spark)
    StreamOps.upsertSessionBatch(cdc(b1 ++ b2), prefix, "spec")
    assert(serve() == truth(net123),
      "compaction dropped the replay guard: day-1 replay re-folded")
    store.destroy(spark)
  }

  test("streaming upserts: seeded-random mixed CDC batches — fresh " +
      "adds, dels of live events (same batch included), duplicate " +
      "re-deliveries of both ops — serve equals the net rebuild after " +
      "EVERY batch (seeds 1..2)") {
    for (seed <- 1 to 2) {
      val rng = new scala.util.Random(1700 + seed)
      val prefix = s"graft_state_rusess$seed"
      val store = new EpochStore(prefix, "spec", StreamOps.UpsertSessionTables)
      store.destroy(spark)
      val all = (1L to 80L).map { id =>
        (id, at(rng.nextInt(3), rng.nextInt(24), rng.nextInt(60)),
          1L + rng.nextInt(5))
      }
      val byId = all.map(e => e._1 -> e).toMap
      var delivered = Vector.empty[Long] // processed adds, in order
      var deleted = Set.empty[Long]      // processed dels
      var cursor = 0
      while (cursor < all.length) {
        val fresh = all.slice(cursor, cursor + 1 + rng.nextInt(20))
        cursor += fresh.length
        delivered ++= fresh.map(_._1)
        // dels target LIVE events — possibly ones added this batch
        val dels = rng.shuffle(delivered.filterNot(deleted)).take(rng.nextInt(4))
        deleted ++= dels
        val addRows = fresh.map(e => (e._1, e._2, e._3, "add"))
        val delRows = dels.map { id =>
          val e = byId(id); (e._1, e._2, e._3, "del")
        }
        // replays: random already-processed adds and dels
        val replayAdds = rng.shuffle(delivered).take(rng.nextInt(3))
          .map { id => val e = byId(id); (e._1, e._2, e._3, "add") }
        val replayDels = rng.shuffle(deleted.toSeq).take(rng.nextInt(2))
          .map { id => val e = byId(id); (e._1, e._2, e._3, "del") }
        StreamOps.upsertSessionBatch(
          cdc(rng.shuffle(addRows ++ delRows ++ replayAdds ++ replayDels)),
          prefix, "spec")
        val net = delivered.filterNot(deleted).map(byId)
        assert(digest(StreamOps.upsertSessionServe(spark, prefix, "spec"))
          == truth(net),
          s"serve diverged from net rebuild at seed $seed cursor $cursor")
      }
      store.destroy(spark)
    }
  }

  test("total erasure: deleting every surviving event leaves an EMPTY " +
      "snapshot that serves, trims (whole log kept — no reference day), " +
      "and still no-ops replays of both ops") {
    val prefix = "graft_state_eusess"
    val store = new EpochStore(prefix, "spec", StreamOps.UpsertSessionTables)
    store.destroy(spark)
    val adds = Seq((1L, at(0, 10, 0), 1L, "add"), (2L, at(1, 11, 0), 2L, "add"))
    val dels = adds.map(e => (e._1, e._2, e._3, "del"))
    StreamOps.upsertSessionBatch(cdc(adds), prefix, "spec")
    StreamOps.upsertSessionBatch(cdc(dels), prefix, "spec")
    assert(digest(StreamOps.upsertSessionServe(spark, prefix, "spec")).isEmpty,
      "total erasure left surviving sessions")
    StreamOps.upsertSessionTrim(spark, prefix, "spec", horizonDays = 7)
    assert(store.log(spark, "proc").count() == 4,
      "trim with no reference day must keep the whole guard log")
    val epochBefore = store.committed(spark)._1
    StreamOps.upsertSessionBatch(cdc(adds ++ dels), prefix, "spec")
    assert(store.committed(spark)._1 == epochBefore,
      "replay into the erased state opened a new epoch")
    assert(digest(StreamOps.upsertSessionServe(spark, prefix, "spec")).isEmpty,
      "replay resurrected erased events")
    store.destroy(spark)
  }

  test("upsertSessionTrim: the (event_id, op) guard log is bounded by " +
      "the horizon; in-horizon replays of BOTH ops stay true no-ops") {
    val prefix = "graft_state_tusess"
    val store = new EpochStore(prefix, "spec", StreamOps.UpsertSessionTables)
    store.destroy(spark)
    val b1 = Seq((1L, at(0, 10, 0), 1L, "add"), (2L, at(100, 10, 0), 2L, "add"),
      (3L, at(100, 10, 5), 2L, "add"))
    val b2 = Seq((4L, at(200, 10, 0), 1L, "add"), (3L, at(100, 10, 5), 2L, "del"))
    StreamOps.upsertSessionBatch(cdc(b1), prefix, "spec")
    StreamOps.upsertSessionBatch(cdc(b2), prefix, "spec")
    val before = digest(StreamOps.upsertSessionServe(spark, prefix, "spec"))
    StreamOps.upsertSessionTrim(spark, prefix, "spec", horizonDays = 150)
    // max end_us day = 200, cutoff = 50: entries dated <50 drop (event
    // 1's add); 2/3's add, 3's del (d=100) and 4's add (d=200) stay
    assert(store.log(spark, "proc")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((2L, "add"), (3L, "add"), (3L, "del"), (4L, "add")))
    assert(digest(StreamOps.upsertSessionServe(spark, prefix, "spec"))
      == before, "trim changed the served sessions")
    val epochBefore = store.committed(spark)._1
    StreamOps.upsertSessionBatch(cdc(b2), prefix, "spec")
    assert(store.committed(spark)._1 == epochBefore,
      "in-horizon replay after trim opened a new epoch")
    store.destroy(spark)
  }
}
