package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator specs: corpus-derived shard counts (p11),
  * convergence-driven graph rank, hot-entity caps. */
class Round9OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  test("p11: shard count is derived from the corpus and floors at 8") {
    // below the floor: any corpus under 8 target-shards stays at 8
    assert(PipelineOps.p11ShardCount(0) == 8)
    assert(PipelineOps.p11ShardCount(5000) == 8)
    assert(PipelineOps.p11ShardCount(8 * PipelineOps.P11TargetShardRows) == 8)
    // past the floor: exact ceil division, so every shard's window
    // input is capped at the target row count
    assert(PipelineOps.p11ShardCount(8 * PipelineOps.P11TargetShardRows + 1) == 9)
    assert(PipelineOps.p11ShardCount(1000000) == 40)
    // 100 TB sanity: ~1e11 docs → ~4M shards, each still target-sized
    assert(PipelineOps.p11ShardCount(100000000000L) == 4000000L)
  }

  test("p11: raising the shard count shrinks every per-shard window input") {
    import spark.implicits._
    val synth = spark.range(2000)
      .select($"id".cast("string").as("doc_id"))
    def maxShardRows(shards: Long): (Long, Long) = {
      val df = PipelineOps.p11TrainingOrderFrom(synth, shards)
      val per = df.groupBy($"shard").count()
      (per.agg(max($"count")).as[Long].head(), df.count())
    }
    val (max4, n4) = maxShardRows(4)
    val (max16, n16) = maxShardRows(16)
    assert(n4 == 2000 && n16 == 2000, "permutation must cover every doc")
    assert(max16 < max4,
      s"16 shards should bound the window input below 4 shards ($max16 >= $max4)")
    // hash uniformity keeps the largest shard near corpus/shards
    assert(max16 < 2 * (2000 / 16))
  }
}
