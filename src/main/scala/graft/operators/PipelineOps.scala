package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.EngineFns._

/** The operators composed end-to-end: what a user actually runs nightly
  * over a raw crawl. Quality filter (t3's heuristic) → exact dedup
  * keep-first (d1's signature) → set-normalized near-dup keep-best (d2's
  * signature, d7's selection) → per-language funnel report. One query,
  * one oracle — proof the pieces compose without driver-side glue.
  *
  * Scale shape: both dedup stages are hash aggregates on fixed-width md5
  * signatures carrying only narrow columns (doc_id, lang, counts) — the
  * document text never rides a shuffle (`min_by`/`max_by` aggregates
  * replace window sorts, so there is no per-group sort either). The
  * funnel stats are three partial-aggregated group-bys on `lang`
  * (5 groups) left-joined at the end. Everything between the two
  * signature shuffles is map-side.
  */
object PipelineOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  // ---------------------------------------------------------------- p1
  /** Per-language funnel of the prep pipeline:
    * (n_input, n_good, n_exact_kept, n_final_kept, total_tokens). */
  def p1PrepPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val nTok = size(toks)
    val nStop = size(filter(toks, tk => tk.isInCollection(TextOps.stopwords)))
    val base = docs(spark, dir)
      .select($"doc_id", $"lang", $"text", $"n_chars",
        nTok.as("n_tokens"), permille(nStop, nTok).as("stop_milli"))
      // t3's "good" bucket, as one predicate
      .withColumn("good",
        $"n_tokens" >= 20 && $"stop_milli" <= 150 && $"stop_milli" >= 10)
    val quality = base.filter($"good")
      .select($"doc_id", $"lang", $"n_chars", $"n_tokens",
        md5($"text".cast("binary")).as("sig"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens($"text"))))
          .cast("binary")).as("nsig"))
    // exact dedup, keep lowest doc_id: one hash agg on the 32-byte sig
    val k1 = quality.groupBy($"sig")
      .agg(min_by(struct($"nsig", $"lang", $"n_chars", $"n_tokens", $"doc_id"),
        $"doc_id").as("r"))
      .select($"r.*")
    // near-dup keep-best (d7 semantics): longest doc, tie lowest doc_id
    val k2 = k1.groupBy($"nsig")
      .agg(max_by(struct($"lang", $"n_tokens", $"doc_id"),
        struct($"n_chars", $"doc_id" * -1)).as("r"))
      .select($"r.*")
    val aggIn = base.groupBy($"lang").agg(
      count(lit(1)).as("n_input"),
      sum(when($"good", 1L).otherwise(0L)).as("n_good"))
    val agg1 = k1.groupBy($"lang").agg(count(lit(1)).as("n_exact_kept"))
    val agg2 = k2.groupBy($"lang").agg(
      count(lit(1)).as("n_final_kept"),
      sum($"n_tokens".cast("long")).as("total_tokens"))
    aggIn.join(agg1, Seq("lang"), "left").join(agg2, Seq("lang"), "left")
      .select($"lang", $"n_input", $"n_good",
        coalesce($"n_exact_kept", lit(0L)).as("n_exact_kept"),
        coalesce($"n_final_kept", lit(0L)).as("n_final_kept"),
        coalesce($"total_tokens", lit(0L)).as("total_tokens"))
      .orderBy($"lang")
  }

  val p1PrepPipelineSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang, text, n_chars,
       |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       |    CAST(len(list_filter(string_split(text, ' '),
       |                         tk -> tk IN (${TextOps.stopwordsSql}))) AS INT) AS n_stop
       |  FROM documents),
       |flagged AS (
       |  SELECT doc_id, lang, text, n_chars, n_tokens,
       |    (n_tokens >= 20
       |     AND ${sqlPermille("n_stop", "n_tokens")} <= 150
       |     AND ${sqlPermille("n_stop", "n_tokens")} >= 10) AS good
       |  FROM s),
       |quality AS (
       |  SELECT doc_id, lang, n_chars, n_tokens,
       |    md5(text) AS sig,
       |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS nsig
       |  FROM flagged WHERE good),
       |k1 AS (
       |  SELECT nsig, lang, n_chars, n_tokens, doc_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY sig ORDER BY doc_id) AS rn
       |    FROM quality)
       |  WHERE rn = 1),
       |k2 AS (
       |  SELECT lang, n_tokens, doc_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY nsig ORDER BY n_chars DESC, doc_id) AS rn2
       |    FROM k1)
       |  WHERE rn2 = 1),
       |agg_in AS (
       |  SELECT lang, COUNT(*) AS n_input,
       |    CAST(SUM(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS n_good
       |  FROM flagged GROUP BY lang),
       |agg1 AS (SELECT lang, COUNT(*) AS n_exact_kept FROM k1 GROUP BY lang),
       |agg2 AS (
       |  SELECT lang, COUNT(*) AS n_final_kept,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |  FROM k2 GROUP BY lang)
       |SELECT i.lang, i.n_input, i.n_good,
       |  COALESCE(a1.n_exact_kept, 0) AS n_exact_kept,
       |  COALESCE(a2.n_final_kept, 0) AS n_final_kept,
       |  COALESCE(a2.total_tokens, 0) AS total_tokens
       |FROM agg_in i
       |LEFT JOIN agg1 a1 ON i.lang = a1.lang
       |LEFT JOIN agg2 a2 ON i.lang = a2.lang
       |ORDER BY i.lang""".stripMargin

  // ------------------------------------------------------------ registry
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_prep_pipeline" -> (p1PrepPipeline _),
  )

  def oracles: Map[String, String] = Map(
    "p1_prep_pipeline" -> p1PrepPipelineSql,
  )
}
