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

  /** The big side's salt in [0, n) — package-private so specs can assert
    * the spread directly. See [[saltedJoin]] for the contract. */
  private[graft] def saltExpr(big: DataFrame, n: Int,
                              spreadDuplicates: Boolean): Column = {
    val hashable = big.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
      .toIndexedSeq
    if (hashable.isEmpty)
      // join output stays correct, but every row lands in salt bucket 0:
      // the skew mitigation the caller asked for is silently a no-op.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "saltedJoin: every column of the big side contains a MapType — " +
          "no hashable content, salt degrades to a single bucket and " +
          "skew is NOT mitigated")
    // LongType throughout: `hash` returns Int, and under ANSI mode (the
    // Spark 4 default, on in this session) Int.MaxValue-adjacent hashes
    // + row_number would throw ArithmeticException instead of wrapping.
    val contentHash =
      if (hashable.nonEmpty) hash(hashable: _*).cast("long") else lit(0L)
    val saltSrc =
      if (spreadDuplicates && hashable.nonEmpty) {
        // within identical-content groups, ordinals 1..k are assigned;
        // which copy gets which ordinal is arbitrary but harmless.
        val w = Window.partitionBy(hashable: _*).orderBy(hashable: _*)
        contentHash + row_number().over(w).cast("long")
      } else contentHash
    pmod(saltSrc, lit(n.toLong))
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
    * output multiset is unchanged. Costs one extra shuffle+sort of the
    * big side, hence opt-in.
    *
    * RETRY-DETERMINISM CAVEAT for `spreadDuplicates`: the window
    * partitions/orders only on the HASHABLE columns, so rows that differ
    * solely in skipped MapType columns are all ties — their ordinals (and
    * salts) can come out differently when a lost partition is recomputed,
    * which is the very hazard the content-hash salt avoids. Output is
    * still correct absent retries, but on a schema with map columns
    * prefer `spreadDuplicates = false` (or drop the maps first). */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column, n: Int,
                 spreadDuplicates: Boolean = false): DataFrame = {
    val salted = big.withColumn("__salt", saltExpr(big, n, spreadDuplicates))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n - 1L))))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
