package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Distributed-aggregation laws for the typed Aggregators. Spark is free
  * to partition a group's rows arbitrarily, reduce each partition in its
  * own order, and merge the partial buffers in any order and any
  * association — a correct Aggregator must give the same answer under
  * every such shape. These are the invariants 1000-executor map-side
  * partial aggregation rests on; violated, results become
  * partition-count-dependent and the DuckDB oracles would flap between
  * runs. Seeded randomized trials (deterministic, no flake): each trial
  * draws a random partitioning and a random merge tree and compares
  * against the straightforward sequential model.
  */
class AggregatorLawsSpec extends AnyFunSuite {

  /** Fold each random partition with reduce, then merge the partials in
    * a random order with random argument sides. */
  private def shapedAggregate[I, B](zero: B, reduce: (B, I) => B,
                                    merge: (B, B) => B,
                                    xs: Seq[I], rnd: Random): B =
    if (xs.isEmpty) zero
    else {
      val nParts = 1 + rnd.nextInt(6)
      val parts = xs.zipWithIndex.groupBy(_ => rnd.nextInt(nParts))
        .values.map(_.map(_._1)).toList
      val partials = rnd.shuffle(parts.map(_.foldLeft(zero)(reduce)))
      partials.reduceLeft((a, b) =>
        if (rnd.nextBoolean()) merge(a, b) else merge(b, a))
    }

  test("KmvAgg: any partitioning / merge tree / row duplication gives the model sketch") {
    val rnd = new Random(42)
    for (trial <- 0 until 300) {
      val k = 1 + rnd.nextInt(12)
      val agg = new KmvAgg(k)
      val base = Seq.fill(rnd.nextInt(60))(rnd.nextInt(50).toLong)
      // KMV is a DISTINCT sketch: re-delivered rows (at-least-once
      // sources, speculative tasks) must not change it
      val xs = base ++ rnd.shuffle(base).take(rnd.nextInt(base.length + 1))
      val got = agg.finish(
        shapedAggregate[Long, List[Long]](agg.zero, agg.reduce, agg.merge, xs, rnd))
      val d = xs.distinct.sorted.take(k)
      val want = (d.length, if (d.isEmpty) 0L else d.last)
      assert(got == want, s"trial $trial k=$k xs=$xs")
    }
  }

  test("KmvAgg: merge is commutative and associative on arbitrary buffers") {
    val rnd = new Random(7)
    for (trial <- 0 until 300) {
      val k = 1 + rnd.nextInt(8)
      val agg = new KmvAgg(k)
      def buf(): List[Long] =
        Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
          .foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (buf(), buf(), buf())
      assert(agg.merge(a, b) == agg.merge(b, a), s"trial $trial comm")
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)),
        s"trial $trial assoc")
    }
  }

  test("TopKIdsAgg: any partitioning / merge tree gives the model top-k") {
    val rnd = new Random(11)
    for (trial <- 0 until 300) {
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKIdsAgg(k)
      // scores from a small integer domain: ties are common, so the
      // (score desc, id asc) tie-break is actually exercised
      val xs = Seq.fill(rnd.nextInt(60))(
        (rnd.nextInt(10).toDouble, rnd.nextInt(100).toLong))
      val got = agg.finish(shapedAggregate[(Double, Long), List[(Double, Long)]](
        agg.zero, agg.reduce, agg.merge, xs, rnd))
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)
      assert(got == want, s"trial $trial k=$k xs=$xs")
    }
  }
}
