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
    val kcols: Seq[Column] = keys.map(col)
    val nonNull = df.select(kcols :+ col(value).cast("double").as("v"): _*)
      .filter(col("v").isNotNull)
    val ranked = nonNull
      .withColumn("rn",
        row_number().over(Window.partitionBy(kcols: _*).orderBy(col("v"))))
    // 0-based position p0 = frac*(n-1); rows lo=floor(p0)+1 and lo+1
    // (clamped to n) bracket it; wt is the upper-row weight.
    val need = nonNull.groupBy(kcols: _*).agg(count(lit(1)).as("n"))
      .select(kcols :+ col("n") :+
        explode(array(fractions.map(lit): _*)).as("frac"): _*)
      .withColumn("p0", col("frac") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("p0")).cast("long") + 1)
      .withColumn("wt", col("p0") - floor(col("p0")))
      .select(kcols ++ Seq(col("frac"), col("lo"), col("wt"),
        explode(array(col("lo"), least(col("lo") + 1, col("n")))).as("rn")): _*)
      .distinct()
    ranked.join(need, keys :+ "rn")
      .groupBy(kcols :+ col("frac"): _*)
      .agg(
        max(when(col("rn") === col("lo"), col("v"))).as("v_lo"),
        max(when(col("rn") =!= col("lo"), col("v"))).as("v_hi"),
        max(col("wt")).as("wt"))
      .select(kcols ++ Seq(col("frac"),
        (col("v_lo") * (lit(1.0) - col("wt")) +
          coalesce(col("v_hi"), col("v_lo")) * col("wt")).as("pct")): _*)
  }

  /** Single-key convenience form. */
  def exactPercentiles(df: DataFrame, key: String, value: String,
                       fractions: Seq[Double]): DataFrame =
    exactPercentiles(df, Seq(key), value, fractions)
}
