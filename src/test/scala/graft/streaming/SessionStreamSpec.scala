package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Maintainer #12 — streaming sessionization through e32's
  * non-additive fold. The invariant every test pins: after ANY batch
  * prefix, serve equals the from-scratch sessionization of exactly the
  * delivered events — including batches that MERGE standing sessions,
  * replays, crashes, and compaction. */
class SessionStreamSpec extends AnyFunSuite {
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
    java.time.LocalDate.of(2024, 5, 1).plusDays(day.toLong).atTime(h, m))

  test("streaming sessions: micro-batches fold through the interval " +
      "sweep — a later batch MERGES two standing sessions through a " +
      "bridge event; serve equals rebuild; replay idempotent; crash " +
      "before commit invisible; compaction keeps the replay guard") {
    implicit val sqlCtx = spark.sqlContext
    val prefix = "graft_state_ssess"
    val store = new EpochStore(prefix, "spec", StreamOps.SessionTables)
    store.destroy(spark)
    // b1: user 1 gets two sessions 80 min apart; b2's bridge events
    // (25/30/25-minute gaps) collapse them into ONE — the fold case no
    // additive state can express
    val b1 = Seq((1L, at(0, 10, 0), 1L), (2L, at(0, 10, 10), 1L),
      (3L, at(0, 11, 30), 1L), (4L, at(0, 11, 40), 1L),
      (5L, at(0, 9, 0), 2L))
    val b2 = Seq((6L, at(0, 10, 35), 1L), (7L, at(0, 11, 5), 1L),
      (8L, at(3, 12, 0), 3L))
    def serve() = digest(StreamOps.sessionServe(spark, prefix, "spec"))
    val input = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamOps.streamingSessions(
      input.toDF().toDF("event_id", "ts", "user_id"), prefix, "spec").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(serve() == truth(b1), "day-1 serve diverged from rebuild")
      assert(serve().count(_.head == 1L) == 2, "expected 2 standing sessions")
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(serve() == truth(b1 ++ b2), "post-merge serve diverged")
      assert(serve().count(_.head == 1L) == 1,
        "bridge events did not merge the standing sessions")
      val epochBefore = store.committed(spark)._1
      input.addData(b2: _*) // verbatim re-delivery
      q.processAllAvailable()
      assert(store.committed(spark)._1 == epochBefore,
        "replayed batch opened a new epoch")
      assert(serve() == truth(b1 ++ b2), "replayed batch moved the state")
    } finally q.stop()
    val b3 = Seq((9L, at(3, 12, 10), 3L))
    intercept[EpochStore.InjectedCrash] {
      StreamOps.sessionBatch(b3.toDF("event_id", "ts", "user_id"),
        prefix, "spec", crashBeforeCommit = true)
    }
    assert(serve() == truth(b1 ++ b2),
      "crashed batch became visible before the epoch flip")
    StreamOps.sessionBatch(b3.toDF("event_id", "ts", "user_id"),
      prefix, "spec")
    assert(serve() == truth(b1 ++ b2 ++ b3),
      "post-crash retry did not land exactly once")
    store.compact(spark)
    StreamOps.sessionBatch(b1.toDF("event_id", "ts", "user_id"),
      prefix, "spec") // day-one replay after compaction
    assert(serve() == truth(b1 ++ b2 ++ b3),
      "compaction dropped the replay guard: day-1 replay re-folded")
    store.destroy(spark)
  }

  test("streaming sessions: seeded-random batches with duplicate " +
      "re-deliveries and same-batch conflicting duplicates — serve " +
      "equals rebuild after EVERY batch (seeds 1..2)") {
    for (seed <- 1 to 2) {
      val rng = new scala.util.Random(1600 + seed)
      val prefix = s"graft_state_rsess$seed"
      val store = new EpochStore(prefix, "spec", StreamOps.SessionTables)
      store.destroy(spark)
      // dense minute-grain events so ~30-min gaps (merges!) are common
      val all = (1L to 90L).map { id =>
        (id, at(rng.nextInt(3), rng.nextInt(24), rng.nextInt(60)),
          1L + rng.nextInt(5))
      }
      val delivered = scala.collection.mutable.ArrayBuffer[Long]()
      var cursor = 0
      while (cursor < all.length) {
        val fresh = all.slice(cursor, cursor + 1 + rng.nextInt(25))
        cursor += fresh.length
        val replays = if (delivered.isEmpty) Seq.empty
          else rng.shuffle(delivered.toList).take(rng.nextInt(4))
            .map(id => all((id - 1).toInt))
        delivered ++= fresh.map(_._1)
        StreamOps.sessionBatch(
          rng.shuffle(fresh ++ replays).toDF("event_id", "ts", "user_id"),
          prefix, "spec")
        assert(digest(StreamOps.sessionServe(spark, prefix, "spec")) ==
          truth(all.take(cursor)),
          s"serve diverged from rebuild at seed $seed cursor $cursor")
      }
      store.destroy(spark)
    }
  }

  test("sessionTrim: the processed-id log is bounded by the horizon; " +
      "an in-horizon replay after the trim is still a true no-op") {
    val prefix = "graft_state_tsess"
    val store = new EpochStore(prefix, "spec", StreamOps.SessionTables)
    store.destroy(spark)
    val b1 = Seq((1L, at(0, 10, 0), 1L), (2L, at(100, 10, 0), 2L))
    val b2 = Seq((3L, at(200, 10, 0), 1L))
    StreamOps.sessionBatch(b1.toDF("event_id", "ts", "user_id"),
      prefix, "spec")
    StreamOps.sessionBatch(b2.toDF("event_id", "ts", "user_id"),
      prefix, "spec")
    val before = digest(StreamOps.sessionServe(spark, prefix, "spec"))
    StreamOps.sessionTrim(spark, prefix, "spec", horizonDays = 150)
    // max day = 200, cutoff = 50: ids 2 (d=100) and 3 (d=200) retained
    assert(store.log(spark, "proc").collect().map(_.getLong(0)).toSet
      == Set(2L, 3L))
    assert(digest(StreamOps.sessionServe(spark, prefix, "spec")) == before,
      "trim changed the served sessions")
    val epochBefore = store.committed(spark)._1
    StreamOps.sessionBatch(b2.toDF("event_id", "ts", "user_id"),
      prefix, "spec")
    assert(store.committed(spark)._1 == epochBefore,
      "in-horizon replay after trim opened a new epoch")
    store.destroy(spark)
  }
}
