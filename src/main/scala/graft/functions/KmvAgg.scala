package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV ("k minimum values" / bottom-k) distinct-count sketch as a typed
  * `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer is the sorted set of the k SMALLEST DISTINCT 60-bit hashes
  * seen so far — bounded at k longs regardless of input size, so partial
  * (map-side) aggregation works and the shuffle carries ≤ k values per
  * group; `merge` is exactly KMV sketch union. The estimator is the
  * classic unbiased bottom-k form (Bar-Yossef et al. 2002):
  * D̂ = (k-1) · 2^60 / h_(k), with the degenerate n<k case exact by
  * construction (the buffer IS the distinct set then).
  *
  * Unlike HLL/KLL (q15: rows-only, estimates are engine-specific), every
  * step here — md5-based hashing ([[EngineFns.md5Long]]), set semantics,
  * kth-order statistic — is deterministic and expressible in ANSI SQL, so
  * the whole sketch is DuckDB-oracle-checkable bit for bit.
  *
  * Output: (n = buffer size, kth = largest retained hash). The estimate
  * itself is derived in the query so the formula lives next to its
  * oracle SQL.
  */
object KmvAgg {
  /** 2^60 as an exact double — the hash-space size of
    * [[EngineFns.md5Long]] (a power of two, exactly representable as a
    * double; the 6-significant-bits note applies to (k-1)·2^60 products,
    * discussed at the q33 estimator). */
  val HashSpace: Double = 1152921504606846976.0

  /** The estimator, in one place for every consumer (batch q33 mirrors
    * this as a Column expression next to its oracle SQL; streaming and
    * the specs call it directly): exact when the buffer wasn't full,
    * (k-1)·2^60/h_(k) otherwise. */
  def estimate(k: Int, n: Int, kth: Long): Double =
    if (n < k) n.toDouble else (k - 1).toDouble * HashSpace / kth.toDouble
}

/** [[KmvAgg]]'s sibling exposing the FULL k-minimum buffer instead of
  * its (size, kth) summary — the mergeable sketch STATE, for consumers
  * that persist sketches and fold new data in later (q42's day-2
  * maintenance). Same bounded buffer, same map-side partials, same
  * shuffle bound of ≤ k longs per group; the KMV union theorem makes
  * the persisted set loss-free for later merges. */
class KmvSetAgg(k: Int) extends Aggregator[Long, List[Long], List[Long]] {
  private val inner = new KmvAgg(k)
  override def zero: List[Long] = inner.zero
  override def reduce(buf: List[Long], h: Long): List[Long] = inner.reduce(buf, h)
  override def merge(a: List[Long], b: List[Long]): List[Long] = inner.merge(a, b)
  override def finish(buf: List[Long]): List[Long] = buf
  override def bufferEncoder: Encoder[List[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

class KmvAgg(k: Int) extends Aggregator[Long, List[Long], (Int, Long)] {

  override def zero: List[Long] = Nil

  // insert-if-absent into a sorted, k-bounded list; n is tiny (≤ k) and
  // reduce is per-row, so the list ops beat a heap at practical k. The
  // first branch rejects most rows once the buffer is warm (anything ≥
  // the current kth minimum can never enter) with a single O(k) walk.
  override def reduce(buf: List[Long], h: Long): List[Long] =
    if (buf.lengthCompare(k) >= 0 && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else (h :: buf).sorted.take(k)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: List[Long]): (Int, Long) =
    (buf.length, if (buf.isEmpty) 0L else buf.last)

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[(Int, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
