package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DataType, MapType, StructType, ArrayType}

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

  /** true if hashing a value of this type fails at analysis time
    * (Spark's `hash` rejects MapType anywhere in the type). */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType       => true
    case s: StructType    => s.fields.exists(f => containsMap(f.dataType))
    case a: ArrayType     => containsMap(a.elementType)
    case _                => false
  }

  /** Equi-join `big ⋈ small` on `bigKey = smallKey`, salted `n` ways.
    * Row-level results are identical to the unsalted join; only the
    * partitioning of work changes.
    *
    * The salt is derived from the row CONTENT (hash of all hashable
    * columns — MapType columns are skipped since Spark's `hash` rejects
    * them), not from `monotonically_increasing_id()`/`rand()`: a content
    * hash is stable under stage retry, whereas position- or RNG-derived
    * salts can be recomputed differently when a lost shuffle partition
    * is replayed, silently dropping/duplicating join output on a real
    * cluster.
    *
    * LIMITATION: byte-identical duplicate rows hash to ONE salt bucket,
    * so a hot key whose rows are mostly duplicates keeps its skew. For
    * duplicate-heavy inputs set `spreadDuplicates = true`: rows are
    * additionally numbered within identical-content groups (a
    * `row_number` over a content-partitioned window), which spreads k
    * copies over min(k, n) buckets. The ordinal assignment among
    * identical rows is arbitrary, but since the rows are identical the
    * output multiset is unchanged — still retry-deterministic. Costs one
    * extra shuffle+sort of the big side, hence opt-in. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column, n: Int,
                 spreadDuplicates: Boolean = false): DataFrame = {
    val hashable = big.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
      .toIndexedSeq
    val contentHash =
      if (hashable.nonEmpty) hash(hashable: _*) else lit(0)
    val saltSrc =
      if (spreadDuplicates && hashable.nonEmpty) {
        // within identical-content groups, ordinals 1..k are assigned;
        // which copy gets which ordinal is arbitrary but harmless.
        val w = Window.partitionBy(hashable: _*).orderBy(hashable: _*)
        contentHash + row_number().over(w)
      } else contentHash
    val salted = big.withColumn("__salt", pmod(saltSrc, lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
