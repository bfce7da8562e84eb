package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Buffer-invariant tests for the KMV bottom-k sketch; the end-to-end
  * estimate accuracy and the DuckDB bit-exactness are checked by
  * OperatorSmokeSpec and the oracle gate (q33). */
class KmvAggSpec extends AnyFunSuite {

  private val agg = new KmvAgg(4)

  test("reduce keeps the k smallest distinct hashes, sorted") {
    val buf = (10L to 1L by -1L).foldLeft(agg.zero)(agg.reduce)
    assert(buf == List(1L, 2L, 3L, 4L))
  }

  test("reduce ignores values already present and values above the kth min") {
    val buf = List(1L, 2L, 3L, 4L)
    assert(agg.reduce(buf, 2L) eq buf)     // duplicate
    assert(agg.reduce(buf, 99L) eq buf)    // above kth min, buffer full
    assert(agg.reduce(buf, 0L) == List(0L, 1L, 2L, 3L))
  }

  test("duplicate-above-kth early exit is sound only because dups can't matter") {
    // 5 is ≥ the kth min of a FULL buffer, so whether it was seen before
    // is irrelevant — it can never enter. With a non-full buffer the
    // contains check must still fire:
    val part = List(1L, 7L)
    assert(agg.reduce(part, 7L) eq part)
  }

  test("merge is sketch union: distinct, sorted, k-bounded") {
    assert(agg.merge(List(1L, 5L, 7L, 9L), List(1L, 2L, 8L)) ==
      List(1L, 2L, 5L, 7L))
    assert(agg.merge(agg.zero, List(3L, 4L)) == List(3L, 4L))
    assert(agg.merge(agg.zero, agg.zero) == Nil)
  }

  test("finish reports buffer size and kth (largest retained) hash") {
    assert(agg.finish(List(1L, 2L, 9L)) == ((3, 9L)))
    assert(agg.finish(Nil) == ((0, 0L)))
  }

  test("fold order does not change the sketch (mergeability)") {
    val hashes = Seq(42L, 7L, 13L, 7L, 99L, 1L, 56L, 13L, 28L)
    val sequential = hashes.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = hashes.splitAt(4)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(sequential == merged)
    assert(sequential == hashes.distinct.sorted.take(4).toList)
  }
}
