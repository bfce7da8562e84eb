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
}
