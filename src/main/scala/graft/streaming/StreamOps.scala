package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming transforms for the `events` shape (ts, user_id, event_type,
  * value). Each takes and returns a DataFrame so the SAME logic runs on a
  * batch frame or a `readStream` frame — the batch duals are oracle-checked
  * in [[graft.operators.EventOps]], and the streaming specs drive these
  * through MemoryStream with watermarks.
  *
  * The reference is one-shot batch only (Boot.java:17-20); streaming is
  * north-star extension surface (Structured Streaming + JDBC sinks).
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type with a watermark: late
    * events beyond `lateness` are dropped and state is bounded — the
    * standard unbounded-stream aggregation shape. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  lateness: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupBy(window($"ts", windowLen).as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           sum($"value".cast("decimal(28,8)")).cast("double").as("total_value"))
      .select($"w.start".as("win_start"), $"event_type", $"n_events", $"total_value")
  }

  /** Session windows (30-minute gap) per user via Spark's native
    * session_window — state is merged incrementally in streaming mode. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 lateness: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window($"ts", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("sess_start"), $"w.end".as("sess_end"),
              $"user_id", $"n_events")
  }
}
