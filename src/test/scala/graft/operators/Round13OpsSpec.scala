package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: q55 bounded-hop weighted shortest paths — both
  * arms forced output-identical, the cheaper-but-longer-path relaxation
  * that distinguishes Bellman-Ford from BFS, and the hop bound. */
class Round13OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  /** Planted weighted graph, encoded as baskets (edge weight = number
    * of baskets holding exactly that pair; support threshold 2):
    *
    *  - 1—2 (w=2), 2—5 (w=2), 1—5 (w=5): the 2-hop path 1→2→5 costs 4,
    *    BEATING the direct hop-1 edge of cost 5 — the relaxation BFS
    *    cannot express (hop-1 would freeze 5 at cost 5).
    *  - 5—6 (w=2): dist(6) = 6 via the cheap path, not 7 via direct.
    *  - an 8-edge chain 1—10—11—…—17 (w=2 each): 16 and 17 sit 7 and 8
    *    hops out — PAST the Q55MaxHops=6 budget — and must be absent
    *    even though finite-cost paths to them exist. */
  private def plantedPl = {
    import spark.implicits._
    def edge(u: Long, v: Long, w: Int, base: Long) =
      (0 until w).flatMap(k => Seq((base + k, u), (base + k, v)))
    val chain = Seq(1L -> 10L, 10L -> 11L, 11L -> 12L, 12L -> 13L,
      13L -> 14L, 14L -> 15L, 15L -> 16L, 16L -> 17L)
    (edge(1L, 2L, 2, 100L) ++ edge(2L, 5L, 2, 200L) ++
      edge(1L, 5L, 5, 300L) ++ edge(5L, 6L, 2, 400L) ++
      chain.zipWithIndex.flatMap { case ((u, v), i) =>
        edge(u, v, 2, 1000L + i * 10)
      }).toDF("o", "p")
  }

  private def digest(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("q55: cheaper-but-longer path wins; hop budget excludes " +
      "finite-cost nodes past it (driver arm)") {
    val got = digest(RelationalOps.q55From(plantedPl))
    // dist: 1→0, {2,10}→2, {5,11}→4 (5 improved from the direct 5),
    // {6,12}→6, 13→8, 14→10, 15→12; 16/17 absent (7 and 8 hops)
    assert(got == Seq(
      Seq(0L, 1L, 1L, 0L),
      Seq(2L, 2L, 12L, 0L),
      Seq(4L, 2L, 16L, 0L),
      Seq(6L, 2L, 18L, 0L),
      Seq(8L, 1L, 13L, 0L),
      Seq(10L, 1L, 14L, 0L),
      Seq(12L, 1L, 15L, 0L)))
  }

  test("q55: superstep arm is output-identical to the driver arm on " +
      "the planted graph") {
    assert(digest(RelationalOps.q55From(plantedPl, driverBound = 0)) ==
      digest(RelationalOps.q55From(plantedPl)))
  }

  test("q55: both arms agree on the real co-purchase graph") {
    import spark.implicits._
    val pl = graft.Tables(spark, sf, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .localCheckpoint()
    try
      assert(digest(RelationalOps.q55From(pl, driverBound = 0)) ==
        digest(RelationalOps.q55From(pl)))
    finally DedupOps.unpersistCheckpointed(pl)
  }
}
