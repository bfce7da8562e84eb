package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.EngineFns._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language ID, quality scoring, token
  * counting, fingerprinting). The reference has no text handling at all
  * (SURVEY.md §2.2), so these are north-star extension operators.
  *
  * All heuristics use engine-exact arithmetic (integer counts and
  * floor-permille ratios; see [[graft.functions.EngineFns]]) so every query
  * has a DuckDB oracle. Everything is a narrow map/aggregate over one
  * table — embarrassingly parallel, no shuffle except the final group-bys,
  * so the plans scale linearly with document count.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  private[operators] val stopwords = Seq("the", "a", "of", "and", "to")
  private[operators] val stopwordsSql = stopwords.map(s => s"'$s'").mkString(", ")

  // ---------------------------------------------------------------- t1
  /** Per-document token statistics: token count, distinct-token count,
    * character count. Whitespace tokenizer (the corpus is single-space
    * separated); size/array_distinct run inside whole-stage codegen. */
  def t1TokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select(
        $"doc_id",
        size(tokens($"text")).as("n_tokens"),
        size(array_distinct(tokens($"text"))).as("n_distinct"),
        $"n_chars")
      .orderBy($"doc_id")
  }

  val t1TokenStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
      |  n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t2
  /** Corpus profile per language: document count, token volume, mean
    * document length (permille fixed-point). */
  def t2LangProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens($"text"))).as("total_tokens"),
        sum($"n_chars").as("total_chars"))
      .withColumn("avg_chars_milli", permille($"total_chars", $"n_docs"))
      .orderBy($"lang")
  }

  val t2LangProfileSql: String =
    s"""SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  ${sqlPermille("SUM(n_chars)", "COUNT(*)")} AS avg_chars_milli
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t3
  /** Quality scoring: stopword-ratio heuristic bucketing each document.
    * Ratio is a permille integer so the bucket boundaries are exact. */
  def t3QualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val nTok = size(toks)
    val nStop = size(filter(toks, tk => tk.isInCollection(stopwords)))
    docs(spark, dir)
      .select($"doc_id", nTok.as("n_tokens"), nStop.as("n_stop"))
      .withColumn("stop_milli", permille($"n_stop", $"n_tokens"))
      .withColumn("quality",
        when($"n_tokens" < 20, "too_short")
          .when($"stop_milli" > 150, "stopword_heavy")
          .when($"stop_milli" < 10, "unnatural")
          .otherwise("good"))
      .orderBy($"doc_id")
  }

  val t3QualityScoreSql: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       |    CAST(len(list_filter(string_split(text, ' '),
       |                         tk -> tk IN ($stopwordsSql))) AS INT) AS n_stop
       |  FROM documents)
       |SELECT doc_id, n_tokens, n_stop,
       |  ${sqlPermille("n_stop", "n_tokens")} AS stop_milli,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN ${sqlPermille("n_stop", "n_tokens")} > 150 THEN 'stopword_heavy'
       |       WHEN ${sqlPermille("n_stop", "n_tokens")} < 10 THEN 'unnatural'
       |       ELSE 'good' END AS quality
       |FROM s
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t4
  /** Document fingerprinting: full md5 content hash plus a 60-bit numeric
    * projection (join-friendly fixed-width fingerprint). */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select(
        $"doc_id",
        md5($"text".cast("binary")).as("fp_md5"),
        md5Long($"text").as("fp60"))
      .orderBy($"doc_id")
  }

  val t4FingerprintSql: String =
    s"""SELECT doc_id, md5(text) AS fp_md5, ${sqlMd5Long("text")} AS fp60
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t5
  /** Language-ID heuristic: letter-frequency n-gram signal ('e' density is
    * the classic single-feature discriminator) bucketed into predictions,
    * with accuracy against the labeled lang column. The feature extraction
    * is pure per-row codegen'd string work. */
  def t5LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eCount = $"n_chars" - length(replace($"text", lit("e"), lit("")))
    docs(spark, dir)
      .select($"doc_id", $"lang", permille(eCount, $"n_chars").as("e_milli"))
      .withColumn("predicted",
        when($"e_milli" >= 70, "en")
          .when($"e_milli" >= 55, "de")
          .when($"e_milli" >= 40, "fr")
          .when($"e_milli" >= 25, "es")
          .otherwise("zh"))
      .withColumn("hit", ($"predicted" === $"lang").cast("int"))
      .orderBy($"doc_id")
  }

  val t5LangIdSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    ${sqlPermille("(n_chars - LENGTH(REPLACE(text, 'e', '')))", "n_chars")} AS e_milli
       |  FROM documents)
       |SELECT doc_id, lang, e_milli,
       |  CASE WHEN e_milli >= 70 THEN 'en'
       |       WHEN e_milli >= 55 THEN 'de'
       |       WHEN e_milli >= 40 THEN 'fr'
       |       WHEN e_milli >= 25 THEN 'es'
       |       ELSE 'zh' END AS predicted,
       |  CASE WHEN (CASE WHEN e_milli >= 70 THEN 'en'
       |                  WHEN e_milli >= 55 THEN 'de'
       |                  WHEN e_milli >= 40 THEN 'fr'
       |                  WHEN e_milli >= 25 THEN 'es'
       |                  ELSE 'zh' END) = lang THEN 1 ELSE 0 END AS hit
       |FROM s
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t6
  /** Rolling-hash document fingerprint via the native [[PolyHash]]
    * Catalyst expression (codegen'd byte fold — no UDF boxing). */
  def t6PolyHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.PolyHash.register(spark)
    docs(spark, dir)
      .select($"doc_id", expr("polyhash(text)").as("ph"))
      .orderBy($"doc_id")
  }

  val t6PolyHashSql: String =
    """SELECT doc_id,
      |  list_reduce(list_transform(string_split(text, ''),
      |                             c -> CAST(ascii(c) AS BIGINT)),
      |              (acc, c) -> (acc * 31 + c) % 2147483647) AS ph
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t7
  /** Corpus term-frequency head (Zipf profile): the 20 most frequent
    * tokens with their dense rank. The candidate cut is `ORDER BY+LIMIT`
    * (planned as TakeOrderedAndProject — each partition keeps only its
    * local top 20, no global sort); the rank window then runs on 20
    * rows, so the single-partition window is trivially safe. */
  def t7ZipfTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = docs(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"tok")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok")
      .limit(20)
    counts.withColumn("rank",
        row_number().over(Window.orderBy($"cnt".desc, $"tok")).cast("int"))
      .select($"rank", $"tok", $"cnt")
      .orderBy($"rank")
  }

  val t7ZipfTermsSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, COUNT(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok),
      |r AS (SELECT tok, cnt,
      |        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS rank
      |      FROM c)
      |SELECT rank, tok, cnt FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- t8
  /** TF-IDF-style term salience: the top-3 most characteristic terms per
    * document, scored tf/df (term frequency over document frequency — a
    * linear-idf proxy chosen because ln() is not bit-identical across
    * engines, while one IEEE divide is). Shape at scale: explode → two
    * hash aggregates (tf keyed on (doc, term), df keyed on term) → one
    * shuffle join on term → per-doc top-k window. The df side is orders
    * of magnitude smaller than the tf side (vocabulary vs corpus), so
    * the join shuffles the small stream to the big one's partitioning. */
  def t8Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = docs(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .filter($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score_micro", micro($"tf".cast("double") / $"df"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"doc_id")
          .orderBy($"score_micro".desc, $"term")).cast("int"))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank", $"term", $"tf", $"df", $"score_micro")
      .orderBy($"doc_id", $"rank")
  }

  val t8TfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       |       WHERE term <> '' GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    ${sqlMicro("CAST(tf AS DOUBLE) / df")} AS score_micro
       |  FROM tf JOIN df USING (term)),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score_micro DESC, term) AS INT) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, tf, df, score_micro
       |FROM ranked WHERE rank <= 3
       |ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------------------------ registry
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_stats"  -> (t1TokenStats _),
    "t2_lang_profile" -> (t2LangProfile _),
    "t3_quality"      -> (t3QualityScore _),
    "t4_fingerprint"  -> (t4Fingerprint _),
    "t5_langid"       -> (t5LangId _),
    "t6_polyhash"     -> (t6PolyHash _),
    "t7_zipf_terms"   -> (t7ZipfTerms _),
    "t8_tfidf"        -> (t8Tfidf _),
  )

  def oracles: Map[String, String] = Map(
    "t1_token_stats"  -> t1TokenStatsSql,
    "t2_lang_profile" -> t2LangProfileSql,
    "t3_quality"      -> t3QualityScoreSql,
    "t4_fingerprint"  -> t4FingerprintSql,
    "t5_langid"       -> t5LangIdSql,
    "t6_polyhash"     -> t6PolyHashSql,
    "t7_zipf_terms"   -> t7ZipfTermsSql,
    "t8_tfidf"        -> t8TfidfSql,
  )
}
