package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated percentiles via distributed sort + positional pick.
  *
  * Spark's built-in `percentile` buffers every value of the group in an
  * in-memory counts map per aggregation buffer — at 100 TB a single hot
  * group OOMs the executor. This operator instead ranks rows with a
  * window sort (Tungsten radix sort, spillable), computes the two row
  * positions each requested fraction needs, and fetches just those rows
  * with a broadcast join — memory per task stays O(1) regardless of
  * group size, which is the shape a distributed exact percentile must
  * have. (For rough quantiles at scale, `percentile_approx` — q15 — is
  * still the cheaper path; this is the exact one.)
  *
  * Interpolation is the lerp form `v_lo*(1-w) + v_hi*w` — the same
  * floating-point expression DuckDB's `quantile_cont` evaluates, so
  * results are bit-identical to the oracle. (Spark's builtin uses
  * `v_lo + (v_hi-v_lo)*w`, which differs by 1 ulp on some inputs.)
  */
object PercentileOps {

  /** Per-`key` exact percentiles of `value` at `fractions`.
    * Returns (key, frac, pct) in long form — one row per key×fraction.
    * NULL values are ignored (like DuckDB `quantile_cont` and Spark's
    * builtin `percentile`): they are excluded from both the ranking and
    * the count n. A key whose values are all NULL yields no rows. */
  def exactPercentiles(df: DataFrame, key: String, value: String,
                       fractions: Seq[Double]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val nonNull = df.select(col(key), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ranked = nonNull
      .withColumn("rn",
        row_number().over(Window.partitionBy(col(key)).orderBy(col("v"))))
    // 0-based position p0 = frac*(n-1); rows lo=floor(p0)+1 and lo+1
    // (clamped to n) bracket it; wt is the upper-row weight.
    val need = nonNull.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .select(col(key), $"n",
        explode(array(fractions.map(lit): _*)).as("frac"))
      .withColumn("p0", $"frac" * ($"n" - 1).cast("double"))
      .withColumn("lo", floor($"p0").cast("long") + 1)
      .withColumn("wt", $"p0" - floor($"p0"))
      .select(col(key), $"frac", $"lo", $"wt",
        explode(array($"lo", least($"lo" + 1, $"n"))).as("rn"))
      .distinct()
    ranked.join(broadcast(need), Seq(key, "rn"))
      .groupBy(col(key), col("frac"))
      .agg(
        max(when($"rn" === $"lo", $"v")).as("v_lo"),
        max(when($"rn" =!= $"lo", $"v")).as("v_hi"),
        max($"wt").as("wt"))
      .select(col(key), col("frac"),
        ($"v_lo" * (lit(1.0) - $"wt") +
          coalesce($"v_hi", $"v_lo") * $"wt").as("pct"))
  }
}
