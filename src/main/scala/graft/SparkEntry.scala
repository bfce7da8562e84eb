package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator surface (SURVEY.md §2); each entry
  * has a DuckDB-runnable oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ EventOps.queries ++ MultimodalOps.queries ++
      PipelineOps.queries ++ TpchSql.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ EventOps.oracles ++ MultimodalOps.oracles ++
      PipelineOps.oracles ++ TpchSql.oracles
}
