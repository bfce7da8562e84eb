package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated percentiles via distributed sort + positional pick.
  *
  * Spark's built-in `percentile` buffers every value of the group in an
  * in-memory counts map per aggregation buffer — at 100 TB a single hot
  * group OOMs the executor. This operator instead ranks rows with a
  * window sort (Tungsten radix sort, spillable), computes the two row
  * positions each requested fraction needs, and fetches just those rows
  * with a join — memory per task stays O(1) regardless of group size,
  * which is the shape a distributed exact percentile must have. (For
  * rough quantiles at scale, `percentile_approx` — q15 — is still the
  * cheaper path; this is the exact one.)
  *
  * The positions frame (`need`) carries #groups × #fractions × 2 rows.
  * It is joined WITHOUT a broadcast hint: AQE broadcasts it at runtime
  * when it is actually small, and falls back to a shuffle join when the
  * key space is high-cardinality — an unconditional `broadcast(need)`
  * would pin an unbounded frame to the driver at 100× scale.
  *
  * Interpolation is the lerp form `v_lo*(1-w) + v_hi*w` — the same
  * floating-point expression DuckDB's `quantile_cont` evaluates, so
  * results are bit-identical to the oracle. (Spark's builtin uses
  * `v_lo + (v_hi-v_lo)*w`, which differs by 1 ulp on some inputs.)
  */
object PercentileOps {

  /** Per-group exact percentiles of `value` at `fractions`, grouped by
    * the composite key `keys`. Returns (keys..., frac, pct) in long form
    * — one row per group×fraction. NULL values are ignored (like DuckDB
    * `quantile_cont` and Spark's builtin `percentile`): they are
    * excluded from both the ranking and the count n.
    *
    * ORACLE CAVEAT: a group whose values are ALL NULL yields no rows
    * here, but DuckDB's `quantile_cont ... GROUP BY` emits a
    * (key, NULL) row for it — an oracle compared on NULL-bearing data
    * must filter NULLs before grouping (`WHERE value IS NOT NULL`). */
  def exactPercentiles(df: DataFrame, keys: Seq[String], value: String,
                       fractions: Seq[Double]): DataFrame = {
    // internal working columns carry a __pct_ prefix so caller key names
    // can never collide with (or be shadowed by) them; the output columns
    // `frac`/`pct` are the one reserved part of the contract
    require(!keys.exists(k => k == "frac" || k == "pct" || k.startsWith("__pct_")),
      s"exactPercentiles: key names $keys collide with output/internal columns " +
        "(reserved: frac, pct, __pct_*)")
    val kcols: Seq[Column] = keys.map(col)
    val nonNull = df.select(kcols :+ col(value).cast("double").as("__pct_v"): _*)
      .filter(col("__pct_v").isNotNull)
    val ranked = nonNull
      .withColumn("__pct_rn",
        row_number().over(Window.partitionBy(kcols: _*).orderBy(col("__pct_v"))))
    // 0-based position p0 = frac*(n-1); rows lo=floor(p0)+1 and lo+1
    // (clamped to n) bracket it; wt is the upper-row weight.
    val need = nonNull.groupBy(kcols: _*).agg(count(lit(1)).as("__pct_n"))
      .select(kcols :+ col("__pct_n") :+
        explode(array(fractions.map(lit): _*)).as("frac"): _*)
      .withColumn("__pct_p0", col("frac") * (col("__pct_n") - 1).cast("double"))
      .withColumn("__pct_lo", floor(col("__pct_p0")).cast("long") + 1)
      .withColumn("__pct_wt", col("__pct_p0") - floor(col("__pct_p0")))
      .select(kcols ++ Seq(col("frac"), col("__pct_lo"), col("__pct_wt"),
        explode(array(col("__pct_lo"),
          least(col("__pct_lo") + 1, col("__pct_n")))).as("__pct_rn")): _*)
      .distinct()
    ranked.join(need, keys :+ "__pct_rn")
      .groupBy(kcols :+ col("frac"): _*)
      .agg(
        max(when(col("__pct_rn") === col("__pct_lo"), col("__pct_v"))).as("__pct_vlo"),
        max(when(col("__pct_rn") =!= col("__pct_lo"), col("__pct_v"))).as("__pct_vhi"),
        max(col("__pct_wt")).as("__pct_w"))
      .select(kcols ++ Seq(col("frac"),
        (col("__pct_vlo") * (lit(1.0) - col("__pct_w")) +
          coalesce(col("__pct_vhi"), col("__pct_vlo")) * col("__pct_w")).as("pct")): _*)
  }

  /** Single-key convenience form. */
  def exactPercentiles(df: DataFrame, key: String, value: String,
                       fractions: Seq[Double]): DataFrame =
    exactPercentiles(df, Seq(key), value, fractions)
}
