package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): per-group top-k ids by
  * (score desc, id asc). The buffer is a sorted, k-bounded list, so
  * partial aggregation merges k-element buffers — a shuffle of k rows
  * per group regardless of group size (the scalable per-group top-k,
  * same contract as window row_number + filter but with map-side
  * reduction).
  */
class TopKIdsAgg(k: Int)
  extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
                      in: (Double, Long)): List[(Double, Long)] =
    (in :: buf).sorted(ord).take(k)

  override def merge(a: List[(Double, Long)],
                     b: List[(Double, Long)]): List[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: List[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
