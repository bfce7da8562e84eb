package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: Misra-Gries frequent-items sketch (Misra & Gries 1982;
  * merge semantics per Agarwal et al., "Mergeable Summaries", PODS'12
  * — both public). The buffer is a counter map trimmed to `k` entries
  * whenever it exceeds `2k`: subtract the (k+1)-th largest counter
  * from every entry and drop the non-positives. Each trim removes the
  * subtracted delta from ≥ k+1 entries, so the sum of all deltas —
  * the maximum undercount of ANY item, across partials and merges —
  * is ≤ N/(k+1). Hence every item with true frequency > N/(k+1)
  * has a positive counter in the final sketch: the output key set is
  * a SUPERSET of the true heavy hitters, which is exactly what the
  * two-pass exact heavy-hitter operator (candidate sweep → exact
  * recount) needs. Amortized O(log k) per row; the shuffle carries
  * one ≤ 2k-entry map per partition instead of the full key space —
  * the reason this beats a raw groupBy at 100 TB, where the distinct
  * n-gram count is itself data-sized.
  */
class MisraGriesAgg(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[String]] {

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= 2 * k) m
    else {
      val vs = m.valuesIterator.toArray
      java.util.Arrays.sort(vs)
      val delta = vs(vs.length - k - 1) // (k+1)-th largest
      m.iterator
        .map { case (w, c) => (w, c - delta) }
        .filter(_._2 > 0)
        .toMap
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long],
                      w: String): Map[String, Long] =
    trim(buf.updated(w, buf.getOrElse(w, 0L) + 1L))

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    trim(small.foldLeft(large) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    })
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
