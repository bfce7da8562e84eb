package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Seeded-random drive of the decay maintainer — the planted spec pins
  * the designed behaviors; this sweeps batch slicings, duplicate
  * deliveries, out-of-order days, negative values, and ancient events
  * (k > 61) the designer did not enumerate. Every generator is seeded,
  * so failures reproduce. */
class DecayRandomSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def digest(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("streaming decay: over random event streams with duplicate " +
      "re-deliveries, out-of-order days, refunds, and >61-halflife-old " +
      "events, serve equals from-scratch after EVERY batch (seeds 1..3)") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(900 + seed)
      val prefix = s"graft_state_rdecay$seed"
      val store = new EpochStore(prefix, "spec", StreamOps.DecayTables)
      store.destroy(spark)
      // event pool: ids 1..N, days spread over 500 (some beyond the
      // 61-half-life horizon once the max day arrives), values in
      // [-20, 300] cents-ish with refunds mixed in
      val all = (1L to 120L).map { id =>
        val day = rng.nextInt(500)
        val v = math.round((rng.nextDouble() * 320.0 - 20.0) * 100) / 100.0
        (id, Timestamp.valueOf(java.time.LocalDate.of(2023, 1, 1)
          .plusDays(day).atTime(rng.nextInt(24), 0)), 1L + rng.nextInt(8), v)
      }
      val delivered = scala.collection.mutable.ArrayBuffer[Long]()
      var cursor = 0
      var batchNo = 0
      while (cursor < all.length) {
        batchNo += 1
        val take = 1 + rng.nextInt(30)
        val fresh = all.slice(cursor, cursor + take)
        cursor += fresh.length
        // re-deliver a random slice of already-processed events inside
        // the same batch (at-least-once delivery, the guard's job)
        val replays = if (delivered.isEmpty) Seq.empty
          else rng.shuffle(delivered.toList).take(rng.nextInt(5))
            .map(id => all((id - 1).toInt))
        delivered ++= fresh.map(_._1)
        StreamOps.decayBatch(
          rng.shuffle(fresh ++ replays)
            .toDF("event_id", "ts", "user_id", "value"),
          prefix, "spec")
        val want = graft.operators.EventOps.e31Score(
          graft.operators.EventOps.e31Daily(
            all.take(cursor).toDF("event_id", "ts", "user_id", "value")
              .select($"user_id", $"ts", $"value")))
        assert(digest(StreamOps.decayServe(spark, prefix, "spec")) ==
          digest(want),
          s"serve diverged from rebuild at seed $seed batch $batchNo")
      }
      // full-stream verbatim replay after everything: true no-op
      val epochBefore = store.committed(spark)._1
      StreamOps.decayBatch(all.toDF("event_id", "ts", "user_id", "value"),
        prefix, "spec")
      assert(store.committed(spark)._1 == epochBefore,
        s"full replay opened a new epoch, seed $seed")
      store.destroy(spark)
    }
  }

  test("streaming decay: two same-batch deliveries of ONE event_id with " +
      "DIFFERING payloads fold exactly once — the deterministic arg-max " +
      "winner, not a double count (r15 ADVICE)") {
    val prefix = "graft_state_dupdecay"
    val store = new EpochStore(prefix, "spec", StreamOps.DecayTables)
    store.destroy(spark)
    val t1 = Timestamp.valueOf("2024-01-01 08:00:00")
    val t2 = Timestamp.valueOf("2024-01-01 20:00:00")
    // id 7 arrives twice in the SAME batch with different ts+value:
    // full-row distinct() would keep both rows (2.00 + 9.00 = 11.00
    // folded) while the proc log records the id once — the guard now
    // picks one winner: max (ts, user_id, value) struct ⇒ (t2, 9.00)
    StreamOps.decayBatch(
      Seq((7L, t1, 1L, 2.00), (7L, t2, 1L, 9.00), (8L, t1, 2L, 5.00))
        .toDF("event_id", "ts", "user_id", "value"),
      prefix, "spec")
    val got = digest(StreamOps.decayServe(spark, prefix, "spec"))
    val want = digest(graft.operators.EventOps.e31Score(
      graft.operators.EventOps.e31Daily(
        Seq((1L, t2, 9.00), (2L, t1, 5.00)).toDF("user_id", "ts", "value"))))
    assert(got == want, s"conflicting duplicate double-counted: $got")
    // and a LATER re-delivery of id 7 with yet another payload is a
    // true no-op: the processed-id guard wins over the new payload
    val epochBefore = store.committed(spark)._1
    StreamOps.decayBatch(
      Seq((7L, t1, 1L, 123.45)).toDF("event_id", "ts", "user_id", "value"),
      prefix, "spec")
    assert(store.committed(spark)._1 == epochBefore,
      "cross-batch conflicting re-delivery opened a new epoch")
    assert(digest(StreamOps.decayServe(spark, prefix, "spec")) == want)
    store.destroy(spark)
  }

  test("decayTrim: the processed-id log is bounded by the re-delivery " +
      "horizon — beyond-horizon ids drop, serve is untouched, and an " +
      "in-horizon replay after the trim is still a true no-op") {
    val prefix = "graft_state_trimdecay"
    val store = new EpochStore(prefix, "spec", StreamOps.DecayTables)
    store.destroy(spark)
    def at(day: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(2023, 1, 1).plusDays(day.toLong).atTime(12, 0))
    // ids 1..6 spread over 200 days; horizon 50 ⇒ only days ≥ 150 stay
    val batches = Seq(
      Seq((1L, at(0), 1L, 3.00), (2L, at(40), 2L, 4.00)),
      Seq((3L, at(120), 1L, 5.00), (4L, at(150), 3L, 6.00)),
      Seq((5L, at(190), 2L, 7.00), (6L, at(200), 3L, 8.00)))
    batches.foreach(b => StreamOps.decayBatch(
      b.toDF("event_id", "ts", "user_id", "value"), prefix, "spec"))
    val before = digest(StreamOps.decayServe(spark, prefix, "spec"))
    assert(store.log(spark, "proc").count() == 6)
    StreamOps.decayTrim(spark, prefix, "spec", horizonDays = 50)
    // max day = 200, cutoff = 150: ids 4 (d=150), 5, 6 retained
    val kept = store.log(spark, "proc").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(4L, 5L, 6L), s"trimmed log kept $kept")
    assert(digest(StreamOps.decayServe(spark, prefix, "spec")) == before,
      "trim changed the served scores")
    // in-horizon replay (id 6) stays a true no-op post-trim
    val epochBefore = store.committed(spark)._1
    StreamOps.decayBatch(
      Seq((6L, at(200), 3L, 8.00)).toDF("event_id", "ts", "user_id", "value"),
      prefix, "spec")
    assert(store.committed(spark)._1 == epochBefore,
      "in-horizon replay after trim opened a new epoch")
    assert(digest(StreamOps.decayServe(spark, prefix, "spec")) == before)
    store.destroy(spark)
  }
}
