package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins.
  *
  * When one join key dominates (a hot user, a null-ish default key), the
  * task holding that key becomes the straggler. AQE's skew-join split
  * (enabled in GraftSession) handles sort-merge cases at runtime; this
  * utility is the explicit form for when the small side is
  * broadcast-averse and the skew is known: the big side gets a random
  * salt in [0, n), the small side is replicated n ways, and the join key
  * becomes (key, salt) — the hot key's rows spread over n tasks.
  */
object SkewOps {

  /** Equi-join `big ⋈ small` on `bigKey = smallKey`, salted `n` ways.
    * Row-level results are identical to the unsalted join; only the
    * partitioning of work changes.
    *
    * The salt is derived from the row CONTENT (hash of all columns), not
    * from `monotonically_increasing_id()`/`rand()`: a content hash is
    * stable under stage retry, whereas position- or RNG-derived salts can
    * be recomputed differently when a lost shuffle partition is replayed,
    * silently dropping/duplicating join output on a real cluster. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column, n: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
