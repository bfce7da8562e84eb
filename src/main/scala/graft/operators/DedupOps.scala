package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.EngineFns._

/** Deduplication operators over `documents` / `embeddings` — exact,
  * set-normalized, n-gram Jaccard, MinHash+LSH, and embedding-cosine
  * near-dup. The reference has none of these (SURVEY.md §2.2); they are the
  * north-star training-data-pipeline surface.
  *
  * Scale design: exact and normalized dedup are one hash-shuffle on the
  * signature (not the full text — we group on a fixed-width md5, so the
  * shuffle carries 32 bytes/doc, not documents). Pairwise similarity is
  * never computed all-pairs at scale: Jaccard joins on shared grams,
  * MinHash joins on LSH band buckets, cosine joins on a coarse blocking
  * key — each candidate-generation join is linear in the number of
  * colliding pairs, which is the standard 100 TB-safe shape.
  */
object DedupOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  /** Free the storage blocks behind a `localCheckpoint()`'d frame.
    * `Dataset.unpersist` only talks to the CacheManager (it knows nothing
    * about checkpoint RDDs), so the block release has to happen at the
    * RDD level: a localCheckpoint'd Dataset's plan is a single
    * `LogicalRDD` wrapping the persisted RDD. Only call this once nothing
    * downstream will read the frame again — localCheckpoint blocks are
    * unrecoverable once dropped. */
  private[graft] def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case other =>
        // A silent no-op here would quietly reintroduce the d8/d9 block
        // leak if a future Spark wraps checkpointed plans differently;
        // ScaleSpec's persistent-RDD census catches it, but log too so
        // the regression is visible outside the test suite.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"unpersistCheckpointed: expected LogicalRDD, got " +
            s"${other.getClass.getSimpleName} — checkpoint blocks not freed")
    }

  // ---------------------------------------------------------------- d1
  /** Exact dedup: keep the lowest doc_id per identical text, reporting
    * group size. Grouping key is md5(text) so the shuffle is fixed-width. */
  def d1DedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", md5($"text".cast("binary")).as("sig"))
      .groupBy($"sig")
      .agg(min($"doc_id").as("kept_doc"), count(lit(1)).as("n_copies"))
      .select($"kept_doc", $"n_copies")
      .orderBy($"kept_doc")
  }

  val d1DedupExactSql: String =
    """SELECT MIN(doc_id) AS kept_doc, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY kept_doc""".stripMargin

  // ---------------------------------------------------------------- d2
  /** Set-normalized dedup: documents whose sorted distinct-token sets are
    * identical (word-order/multiplicity-insensitive near-dup lite). Only
    * groups with 2+ members are emitted. */
  def d2DedupNormSet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val normSig =
      md5(concat_ws(" ", array_sort(array_distinct(tokens($"text")))).cast("binary"))
    docs(spark, dir)
      .select($"doc_id", normSig.as("sig"))
      .groupBy($"sig")
      .agg(min($"doc_id").as("kept_doc"), count(lit(1)).as("n_members"))
      .filter($"n_members" >= 2)
      .select($"kept_doc", $"n_members")
      .orderBy($"kept_doc")
  }

  val d2DedupNormSetSql: String =
    """SELECT MIN(doc_id) AS kept_doc, COUNT(*) AS n_members
      |FROM documents
      |GROUP BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
      |HAVING COUNT(*) >= 2
      |ORDER BY kept_doc""".stripMargin

  // ---------------------------------------------------------------- d3
  /** Word-trigram Jaccard near-dup pairs (threshold 0.6). Candidate pairs
    * come from a join on shared grams (shuffle keyed on gram), so cost is
    * proportional to actual collisions, never |docs|². The threshold test
    * is cross-multiplied integer math: 10*shared >= 6*union. */
  def d3NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.TrigramHash60.register(spark)
    // Grams are hashed to 60-bit ints BEFORE the self-join (single-pass
    // native expression), so the shuffle carries (long, long, int) instead
    // of ~30-byte gram strings; the per-doc gram count rides along to
    // avoid a second join. Both engines hash identically, so results
    // agree even in the (2^-60) collision case.
    val grams = docs(spark, dir)
      .select($"doc_id", expr("trigram_hashes(text)").as("gh_arr"))
      .select($"doc_id", size($"gh_arr").as("c"), explode($"gh_arr").as("gh"))
    // shuffle-hash (not broadcast): both sides shuffle on gh with
    // IDENTICAL subplans, so AQE reuses one exchange — the gram stream is
    // computed and shuffled once, read twice. Broadcasting the gram
    // stream would collect it to the driver: fine at test SF, wrong at
    // scale (measured 2× slower here too).
    grams.as("a").join(grams.hint("shuffle_hash").as("b"),
        $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"),
               $"a.c".as("ca"), $"b.c".as("cb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("unions", $"ca" + $"cb" - $"shared")
      .filter($"shared" * 10 >= $"unions" * 6)
      .select($"i", $"j", $"shared", $"unions",
              permille($"shared", $"unions").as("jac_milli"))
      .orderBy($"i", $"j")
  }

  val d3NgramJaccardSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |gr AS (SELECT doc_id, ${sqlTrigrams("l")} AS grams FROM toks),
       |grams AS (
       |  SELECT doc_id, len(grams) AS c,
       |         unnest(list_transform(grams, g -> ${sqlMd5Long("g")})) AS gh
       |  FROM gr),
       |shared AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, a.c AS ca, b.c AS cb,
       |         COUNT(*) AS shared
       |  FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT i, j, shared, ca + cb - shared AS unions,
       |  ${sqlPermille("shared", "(ca + cb - shared)")} AS jac_milli
       |FROM shared
       |WHERE shared * 10 >= (ca + cb - shared) * 6
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- d4
  /** MinHash + LSH candidate pairs: 16 md5-derived min-hashes over distinct
    * word trigrams, banded 4×4; docs colliding in any band are candidates.
    * The only join is on (band, band-signature) — the LSH bucket — which is
    * the crossJoin-free scale path for fuzzy dedup. */
  private val P31 = 2147483647L

  /** Per-doc DISTINCT gram-hash array (60-bit md5 of each word trigram,
    * folded mod p) — ONE pass over text; signatures (d4/d9) and the
    * exact-Jaccard side (d9) both derive from it. Width is bounded by
    * document length (~4 B per gram). */
  private def gramSets(spark: SparkSession, dir: String): DataFrame =
    gramSetsFrom(docs(spark, dir))

  private def gramSetsFrom(docsDf: DataFrame): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    graft.functions.TrigramHash60.register(spark)
    docsDf.select($"doc_id",
      array_distinct(transform(expr("trigram_hashes(text)"),
        x => pmod(x, lit(P31)))).as("hs"))
  }

  /** The d4/d15 LSH band keys (doc_id, band, key) for ANY (doc_id, text)
    * frame — per-doc and stateless, so the streaming ingest dual can
    * band each micro-batch with exactly the batch pipeline's hashes. */
  private[graft] def bandKeysFor(docsDf: DataFrame): DataFrame =
    bandedKeys(minhashSigsFrom(gramSetsFrom(docsDf)))

  /** 16-slot minhash signature per doc from a (doc_id, hs) frame.
    * Cheap affine hash family h_s(x) = (a_s·x + b_s) mod p (p = 2^31-1,
    * the classic construction) over the strong 60-bit gram hashes.
    * Shape matters at scale: grams explode to (doc_id, h) LONG rows and
    * the 16 signature slots are codegen'd min() aggregates with map-side
    * partial aggregation — one narrow shuffle keyed on doc_id. (The
    * all-higher-order-function formulation re-evaluates the whole
    * signature expression once per band key after Catalyst's projection
    * collapse — measured 10× slower.) */
  private def minhashSigsFrom(hs: DataFrame): DataFrame = {
    val gramRows = hs.select(col("doc_id"), explode(col("hs")).as("h"))
    val minAggs = (0 until 16).map { s =>
      val a = md5Long60("A" + s) % (P31 - 1) + 1
      val b = md5Long60("B" + s) % P31
      min(pmod(lit(a) * col("h") + lit(b), lit(P31))).as(s"m$s")
    }
    gramRows.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
  }

  /** LSH band keys per doc: (doc_id, band, key) with key = md5 of the
    * band's 4 signature slots — shared by the d4 self-join and d15's
    * batch-vs-corpus join. */
  private def bandedKeys(sig: DataFrame): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val bandKeys = array((0 until 4).map { b =>
      md5(concat_ws(",",
        (0 until 4).map(i => col(s"m${b * 4 + i}").cast("string")): _*).cast("binary"))
    }: _*)
    sig.select($"doc_id", posexplode(bandKeys).as(Seq("band", "key")))
  }

  /** LSH banding: candidate pairs (i < j) colliding in any 4-slot band. */
  private def bandedPairs(sig: DataFrame): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val banded = bandedKeys(sig)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .distinct()
  }

  def d4MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bandedPairs(minhashSigsFrom(gramSets(spark, dir)))
      .orderBy($"i", $"j")
  }

  /** The d4 LSH banding as a reusable CTE block (`bands(doc_id, band,
    * key)`) — shared by the d4/d8 pair oracles and d15's batch-vs-corpus
    * oracle. */
  private val d4BandsCte: String =
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |gr AS (SELECT doc_id,
       |  list_transform(${sqlTrigrams("l")}, g -> ${sqlMd5Long("g")} % 2147483647) AS gh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, 15), s ->
       |      list_min(list_transform(gh, h ->
       |        (((${sqlMd5Long("'A' || CAST(s AS VARCHAR)")} % 2147483646) + 1) * h
       |          + (${sqlMd5Long("'B' || CAST(s AS VARCHAR)")} % 2147483647))
       |        % 2147483647))) AS sig
       |  FROM gr
       |  -- a <3-word doc has NO grams: the Scala side aggregates zero
       |  -- gram rows into no sig row at all, while an unfiltered SQL
       |  -- transform would yield 16 NULL slots whose band key md5('')
       |  -- collides across all such docs (r11 ADVICE) — drop them here
       |  WHERE len(gh) > 0),
       |bands AS (
       |  SELECT doc_id, u.b AS band,
       |    md5(array_to_string(list_transform(sig[u.b*4+1:u.b*4+4],
       |        x -> CAST(x AS VARCHAR)), ',')) AS key
       |  FROM sig, UNNEST(generate_series(0, 3)) AS u(b))""".stripMargin

  /** The d4 LSH candidate-pair generation as a reusable CTE block
    * (`pairs(i, j)` with i < j) — shared by the d4 oracle and the d8
    * connected-components oracle. */
  private val d4PairsCte: String =
    s"""$d4BandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  val d4MinhashLshSql: String =
    s"""WITH $d4PairsCte
       |SELECT i, j FROM pairs
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- d9
  /** Minhash Jaccard ESTIMATION, surfaced: for each d4 candidate pair,
    * the estimated similarity (fraction of agreeing signature slots —
    * the unbiased estimator LSH banding is built on: P[minhash agree] =
    * J) next to the exact trigram Jaccard, with the signed error. This
    * is the sketch-accuracy ledger of the dedup pipeline: at 100 TB the
    * exact column is what you'd drop, keeping a pure-signature pipeline
    * whose error you have measured here.
    *
    * Scale shape: signatures and candidate pairs are d4's (one narrow
    * shuffle each); the exact side joins per-doc DISTINCT gram-hash
    * arrays, bounded by document length — never a gram-level pair
    * explosion. All similarity arithmetic is integer permille. */
  def d9MinhashJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The gram-set and signature tables each feed THREE consumers (pairs,
    // est-side a/b resp. sig, exact-side i/j), so both are materialized
    // once and shared — without this the text is trigram-hashed five
    // times. d8's pattern: checkpoint the small result, then release the
    // caches before returning so nothing stays pinned for the session.
    val hs = gramSets(spark, dir).persist()
    val sig = minhashSigsFrom(hs).persist()
    // finally (not sequential unpersist): the caches must be released
    // even when materializing the result fails, or they stay pinned for
    // the session — the contamination class d8's hardening closed.
    try {
      val pairs = bandedPairs(sig)
      val agree = (0 until 16)
        .map(s => when(col(s"a.m$s") === col(s"b.m$s"), 1).otherwise(0))
        .reduce(_ + _)
      pairs
        .join(sig.as("a"), $"i" === $"a.doc_id")
        .join(sig.as("b"), $"j" === $"b.doc_id")
        .select($"i", $"j", agree.cast("int").as("agree"))
        .join(hs.select($"doc_id".as("i"), $"hs".as("hi")), Seq("i"))
        .join(hs.select($"doc_id".as("j"), $"hs".as("hj")), Seq("j"))
        .withColumn("inter", size(array_intersect($"hi", $"hj")))
        .withColumn("unions", size($"hi") + size($"hj") - $"inter")
        .select($"i", $"j", $"agree",
          permille($"agree", lit(16)).as("est_milli"),
          permille($"inter", $"unions").as("jac_milli"))
        .withColumn("err_milli", $"est_milli" - $"jac_milli")
        .orderBy($"i", $"j")
        .localCheckpoint()   // eager: materialized before the unpersists
    } finally {
      sig.unpersist(blocking = false)
      hs.unpersist(blocking = false)
    }
  }

  val d9MinhashJaccardSql: String =
    s"""WITH $d4PairsCte,
       |gsets AS (SELECT doc_id, list_distinct(gh) AS hs FROM gr),
       |ag AS (
       |  SELECT p.i, p.j,
       |    CAST(len(list_filter(generate_series(1, 16),
       |      s -> sa.sig[s] = sb.sig[s])) AS INT) AS agree
       |  FROM pairs p
       |  JOIN sig sa ON p.i = sa.doc_id
       |  JOIN sig sb ON p.j = sb.doc_id),
       |ex AS (
       |  SELECT ag.i, ag.j, ag.agree,
       |    len(list_filter(ga.hs, x -> list_contains(gb.hs, x))) AS inter,
       |    len(ga.hs) + len(gb.hs) AS tot
       |  FROM ag
       |  JOIN gsets ga ON ag.i = ga.doc_id
       |  JOIN gsets gb ON ag.j = gb.doc_id)
       |SELECT i, j, agree,
       |  ${sqlPermille("agree", "16")} AS est_milli,
       |  ${sqlPermille("inter", "(tot - inter)")} AS jac_milli,
       |  ${sqlPermille("agree", "16")} - ${sqlPermille("inter", "(tot - inter)")}
       |    AS err_milli
       |FROM ex
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- d5
  /** Embedding-cosine near-dup pairs (threshold 0.35) with coarse blocking
    * on the label column (the IVF-style candidate generation: only
    * same-block pairs are scored, so the join is |block|²·blocks, not
    * |all|²). Cosine is an engine-exact double fold; the reported value is
    * a fixed-point micro projection. */
  def d5CosineDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    registerAll(spark)
    // Norms are computed once per vector before the pair join (N folds
    // instead of 2·pairs), so each candidate pair costs one dot product.
    val e = emb(spark, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot($"v", $"v")))
    e.as("a").join(e.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"))
      .filter($"cos" >= 0.35)
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
              $"a.label".as("label"), micro($"cos").as("cos_micro"))
      .orderBy($"i", $"j")
  }

  val d5CosineDupSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |         sqrt(${sqlDot("CAST(embedding AS DOUBLE[])", "CAST(embedding AS DOUBLE[])")}) AS nrm
       |  FROM embeddings)
       |SELECT a.vec_id AS i, b.vec_id AS j, a.label AS label,
       |  ${sqlMicro(sqlDot("a.v", "b.v") + " / (a.nrm * b.nrm)")} AS cos_micro
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- d6
  /** SimHash near-dup pairs: 60-bit SimHash over distinct word-trigram
    * hashes (bit j = sign of Σ ±1 votes from (h>>j)&1), candidates
    * generated by 15-bit band LSH (pairs must share one of four bands),
    * kept at Hamming distance ≤ 3. Banding is EXACT here, not
    * approximate: ≤3 flipped bits can touch at most 3 of the 4 bands,
    * so every true pair collides in some clean band (pigeonhole) — the
    * band join only prunes false candidates. Trigram features (not
    * plain tokens) keep fingerprints discriminative on
    * small-vocabulary corpora. Same scale shape as d4: explode →
    * codegen'd sums → band-bucket join.
    *
    * Width matters at scale: 15-bit bands give 32,768 buckets per band
    * vs 256 for byte bands — on a corpus whose simhash bits are biased
    * (real text is), byte-band buckets concentrate and the candidate
    * join degenerates toward quadratic (measured 16 s at sf0.1; 15-bit
    * bands cut candidate volume ~100×). */
  private val SimhashBits = 60   // one bit per trigram-hash bit (md5-derived)
  private val SimhashBandBits = 15

  def d6Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.TrigramHash60.register(spark)
    val tok = docs(spark, dir)
      .select($"doc_id", explode(expr("trigram_hashes(text)")).as("h"))
    val bitSums = (0 until SimhashBits).map { j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sums = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until SimhashBits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val banded = sums
      .select($"doc_id", fp.as("fp"))
      .select($"doc_id", $"fp", posexplode(array(
        (0 until 4).map(b =>
          expr(s"(fp >> ${b * SimhashBandBits}) & ${(1 << SimhashBandBits) - 1}")): _*))
        .as(Seq("band", "nib")))
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.nib" === $"b.nib" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
              bit_count($"a.fp".bitwiseXOR($"b.fp")).as("hamming"))
      .filter($"hamming" <= 3)
      .distinct()
      .orderBy($"i", $"j")
  }

  val d6SimhashSql: String = {
    val sums = (0 until SimhashBits).map(j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n    ")
    val fpExpr = (0 until SimhashBits).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val mask = (1 << SimhashBandBits) - 1
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(${sqlTrigrams("l")}) AS t FROM toks),
       |th AS (SELECT doc_id, ${sqlMd5Long("t")} AS h FROM tok),
       |sums AS (SELECT doc_id,
       |    $sums
       |  FROM th GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($fpExpr AS BIGINT) AS fp FROM sums),
       |banded AS (
       |  SELECT doc_id, fp, u.b AS band,
       |         (fp >> (u.b * $SimhashBandBits)) & $mask AS nib
       |  FROM fp, UNNEST(generate_series(0, 3)) AS u(b))
       |SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3
       |ORDER BY i, j""".stripMargin
  }

  // ------------------------------------------------------------ registry
  // ---------------------------------------------------------------- d7
  /** Dedup with canonical selection ("keep best"): within each
    * set-normalized duplicate group (d2's signature), keep the longest
    * document, tie-broken by lowest doc_id. Selection is a single
    * `max_by` over a lexicographic struct key — one hash aggregate, no
    * per-group sort, so it scales like d1/d2 (fixed-width md5 shuffle)
    * rather than like a window. This is the training-pipeline form of
    * dedup: clusters keep their highest-quality representative. */
  def d7DedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig =
      md5(concat_ws(" ", array_sort(array_distinct(tokens($"text")))).cast("binary"))
    docs(spark, dir)
      .select($"doc_id", $"n_chars", sig.as("sig"))
      .groupBy($"sig")
      .agg(
        max_by($"doc_id", struct($"n_chars", $"doc_id" * -1)).as("keeper_doc"),
        max($"n_chars").as("keeper_chars"),
        count(lit(1)).as("n_members"))
      .filter($"n_members" >= 2)
      .select($"keeper_doc", $"keeper_chars", $"n_members")
      .orderBy($"keeper_doc")
  }

  val d7DedupKeepBestSql: String =
    """WITH sigs AS (
      |  SELECT doc_id, n_chars,
      |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY sig ORDER BY n_chars DESC, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY sig) AS nm
      |  FROM sigs)
      |SELECT doc_id AS keeper_doc, n_chars AS keeper_chars,
      |  CAST(nm AS BIGINT) AS n_members
      |FROM ranked WHERE rn = 1 AND nm >= 2
      |ORDER BY keeper_doc""".stripMargin

  // ---------------------------------------------------------------- d8
  /** Duplicate-cluster assignment: connected components over the d4
    * MinHash-LSH candidate-pair graph. Every document in a near-dup
    * component is labeled with the component's minimum doc_id (the
    * canonical representative), plus the component size — the step that
    * turns pairwise candidates into actual dedup groups when duplicate
    * chains span documents that never collide directly (a~b, b~c ⇒
    * {a,b,c}).
    *
    * Spark shape: iterative min-label propagation WITH pointer doubling
    * — each round is (a) one shuffle join (edges ⨝ labels on src) + one
    * min-aggregate on dst, then (b) a path-compression join that
    * replaces every label with its label's label (`lbl ← labels[lbl]`;
    * sound because labels are always node ids and only ever decrease).
    * Compression halves chain depth each round, so rounds grow
    * O(log diameter) instead of O(diameter) — a duplicate chain of
    * length 10⁶ converges in ~20 rounds, not 10⁶. Each round's lineage
    * is truncated with `localCheckpoint` so plans don't grow
    * exponentially, and the superseded round's checkpoint blocks are
    * unpersisted as soon as the next round is materialized (eager
    * checkpoint), so storage holds exactly ONE label table at any time —
    * not O(rounds) copies stealing execution memory. Driver traffic per
    * round is the 8-byte convergence checksum — plus, BEFORE the loop,
    * [[componentsFrom]]'s bounded size probe, which collects up to
    * [[DriverCcBound]]+1 candidate pairs once (the small-graph
    * union-find arm; see its docstring for the measured heap budget).
    * If the round cap is somehow hit
    * without convergence this THROWS rather than returning partial
    * labels (wrong clusters must never look like a clean result). */
  def d8DupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = componentsFrom(d4MinhashLsh(spark, dir).select($"i", $"j"))
    // the eager checkpoint below backs the returned frame, so the
    // component labels' own checkpoint releases here — exactly one
    // retained block per call (ScaleSpec's no-leak budget)
    try {
      val sizes = labels.groupBy($"lbl").agg(count(lit(1)).as("n_members"))
      labels.join(sizes, "lbl")
        .select($"id".as("doc_id"), $"lbl".as("cluster_id"), $"n_members")
        .orderBy($"doc_id")
        .localCheckpoint()
    } finally unpersistCheckpointed(labels)
  }

  /** Connected components over an undirected pair list `(i, j)` by
    * min-label propagation with pointer doubling — d8's loop, factored
    * so every pair-producing operator (d4's text LSH, m5's media
    * fingerprints) shares one component engine. Returns an eagerly
    * checkpointed `(id, lbl)` frame covering every node that appears
    * in a pair; loop state is fully released on every exit path. */
  /** Node-count bound under which the per-round label vector is
    * broadcast-joined instead of shuffle-joined inside
    * [[componentsFrom]]: 1M (id, lbl) longs ≈ 16 MB serialized — well
    * inside executor broadcast budgets, and far above any
    * support-pruned affinity graph; a crawl-scale near-dup graph
    * exceeds it and keeps the shuffle shape. */
  private val BroadcastLabelBound = 1000000L

  /** Edge-count bound under which the whole component computation runs
    * as a driver-side union-find over ONE bounded collect. The general
    * rule here is "never iterate over collect() results" — what makes
    * this the measured exception is that EVERY per-round cost of the
    * distributed loop (plan+codegen compile, broadcast round-trips, 32
    * task launches per stage) is pure overhead when the graph is
    * thousands of edges: q49's support-pruned graph at sf0.1 is 3.5k
    * edges, and 7 broadcast-hinted supersteps still cost ~8 s of
    * scheduling against ~3 ms of actual union-find work. The collect is
    * memory-bounded BY CONSTRUCTION (limit(bound+1) probes the size and
    * the rows in one pass), and a graph over the bound falls back to
    * the superstep loop, which is the correct shape for a crawl-scale
    * near-dup graph. Same tradeoff class as the s-family's driver-side
    * k-means centroids.
    *
    * Honest driver-heap budget at the bound (r11 verdict item #7: the
    * old "16 MB" counted only the serialized longs): the probe is a
    * TYPED collect of (Long, Long) tuples — `Tuple2` is
    * `@specialized` on Long, so each pair is one 32-byte object with
    * two primitive fields, never a boxed GenericRow — and the
    * union-find runs on primitive arrays (sorted `long[]` id index +
    * `int[]` parent), no boxed HashMap. Worst case at 1M pairs / 2M
    * distinct nodes: ~32 MB tuples + 16 MB ids + 8 MB parent + ~32 MB
    * for the (id, lbl) result ≈ 90 MB transient driver heap, released
    * as soon as the result frame's localCheckpoint distributes it —
    * comfortably inside any driver that can run Spark at all, and ~5×
    * less than the boxed Row/HashMap form this replaced. */
  private val DriverCcBound = 1000000

  /** `driverBound` is parameterized ONLY so the spec can force the
    * superstep arm on a planted graph (every testbed graph is under
    * the production bound, which would otherwise leave the
    * at-scale path untested). */
  private[operators] def componentsFrom(pairs: DataFrame,
      driverBound: Int = DriverCcBound): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Size probe + small-graph fast path in one pass: limit() bounds
    // the driver memory, not the upstream work — if the pair subtree
    // is big the probe row count just exceeds the bound and the
    // distributed loop below recomputes it (one extra pass, amortized
    // against ~30 supersteps at that scale). Typed collect: specialized
    // (Long, Long) tuples, not boxed Rows — see the heap budget above.
    val pc = pairs.columns
    val probe = pairs.limit(driverBound + 1)
      .select(col(pc(0)).cast("long"), col(pc(1)).cast("long"))
      .as[(Long, Long)].collect()
    if (probe.length <= driverBound) return driverComponents(spark, probe)
    // Undirected graph → both directions, so one join per round
    // propagates labels both ways.
    val edges = pairs
      .union(pairs.select($"j".as("i"), $"i".as("j")))
      .toDF("src", "dst")
      .persist()
    // LAZY checkpoints throughout the loop: the convergence-sum action
    // right after each checkpoint materializes it, so every round costs
    // ONE job instead of two (eager-materialize + sum) — half the
    // driver-side scheduling for the same blocks.
    var labels = edges.select($"src".as("id")).distinct()
      .select($"id", $"id".as("lbl"))
      .localCheckpoint(eager = false)
    var converged = false
    var rounds = 0
    val maxRounds = 50   // ~2^50-deep chains; unreachable for real graphs
    // EVERY exit — success, a job failure anywhere (initial sum, any
    // round, the final checkpoint), or the non-convergence throw — must
    // release the edge cache and the current label checkpoint, or they
    // stay pinned for the session lifetime (the cross-query contamination
    // class this hardening closed). Hence one try/finally around the
    // whole computation; on success the finally runs after the small
    // result below is already materialized.
    try {
      // Labels only ever decrease, so the (exact, integer) label sum is a
      // monotone convergence measure: unchanged sum ⇔ fixpoint.
      // The same action also counts the nodes: a lazily-checkpointed
      // label vector is a LogicalRDD with NO stats, so the planner
      // assumes it is huge and plans every per-round join as a full
      // shuffle join — measured 2 s/round on a 3.5k-edge graph (q49 at
      // sf0.1), pure exchange/codegen overhead on tiny frames. When the
      // vector is provably small, hint broadcast on every label-sided
      // join: the round becomes broadcast joins + ONE tiny aggregate
      // shuffle (16.0 → 6.4 s for q49, same host/SF). Above the bound
      // the hint would ship a corpus-sized vector to every executor per
      // round — fall back to shuffle joins, which is the correct shape
      // for a 100 TB near-dup graph.
      val init = labels.agg(sum($"lbl"), count(lit(1))).head()
      var prevSum = init.getLong(0)
      val bcastLabels = init.getLong(1) <= BroadcastLabelBound
      def side(df: DataFrame): DataFrame =
        if (bcastLabels) broadcast(df) else df
      while (!converged && rounds < maxRounds) {
        val nbrMin = edges.join(side(labels), edges("src") === labels("id"))
          .groupBy($"dst").agg(min($"lbl").as("nbr"))
          .select($"dst".as("id"), $"nbr")
        val propagated = labels.join(side(nbrMin), Seq("id"), "left")
          .select($"id", least($"lbl", coalesce($"nbr", $"lbl")).as("lbl"))
        // Pointer doubling: lbl ← min(lbl, labels[lbl]). Every lbl value
        // is a node id present in `propagated`, so the inner self-join is
        // total; chains compress by half per round.
        val next = propagated.as("a")
          .join(side(propagated.select($"id".as("pid"), $"lbl".as("plbl")))
            .as("b"), $"a.lbl" === $"b.pid")
          .select($"a.id", least($"a.lbl", $"b.plbl").as("lbl"))
          .localCheckpoint(eager = false)
        // if the sum job dies, `next`'s partially cached blocks are not
        // reachable from `labels` — release them before rethrowing
        val s = try next.agg(sum($"lbl")).as[Long].head()
          catch { case t: Throwable => unpersistCheckpointed(next); throw t }
        converged = s == prevSum
        prevSum = s
        // the sum action above materialized `next`'s checkpoint, so the
        // previous round's blocks can be dropped right away.
        unpersistCheckpointed(labels)
        labels = next
        rounds += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"componentsFrom: label propagation did not converge in $maxRounds rounds")
      org.slf4j.LoggerFactory.getLogger(getClass)
        .info(s"componentsFrom: superstep loop converged in $rounds rounds")
      // Materialize the (small) final result eagerly; the finally then
      // releases the loop state without un-backing the returned frame.
      labels.select($"id", $"lbl").localCheckpoint()
    } finally {
      unpersistCheckpointed(labels)
      edges.unpersist(blocking = false)
    }
  }

  /** The small-graph arm of [[componentsFrom]]: union-find with path
    * compression over the collected (i, j) pairs, labels = min node id
    * per component (exactly what the min-propagation loop converges
    * to, so the two arms are output-indistinguishable — the bound can
    * move without any result changing). All state is primitive arrays:
    * node ids dedup into one sorted `long[]` (the dense index — sorted,
    * so a SMALLER dense index always means a SMALLER id, and union by
    * min index is union by min id), parents are an `int[]` over dense
    * indices. Returns the same eagerly checkpointed (id, lbl) frame
    * contract as the loop. */
  private def driverComponents(spark: SparkSession,
      pairs: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val ids0 = new Array[Long](pairs.length * 2)
    var k = 0
    pairs.foreach { case (a, b) => ids0(k) = a; ids0(k + 1) = b; k += 2 }
    java.util.Arrays.sort(ids0)
    var n = 0
    var i = 0
    while (i < ids0.length) {          // in-place dedup of the sorted ids
      if (n == 0 || ids0(i) != ids0(n - 1)) { ids0(n) = ids0(i); n += 1 }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(ids0, n)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(java.util.Arrays.binarySearch(ids, a))
      val rb = find(java.util.Arrays.binarySearch(ids, b))
      // union by MIN root index = min id (ids sorted), so a root IS its
      // component's min — no second normalization pass
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    val out = new Array[(Long, Long)](n)
    i = 0
    while (i < n) { out(i) = (ids(i), ids(find(i))); i += 1 }
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"componentsFrom: driver union-find over ${pairs.length} pairs, $n nodes")
    out.toSeq.toDF("id", "lbl").localCheckpoint()
  }

  val d8DupClustersSql: String =
    s"""WITH RECURSIVE $d4PairsCte,
       |edges AS (
       |  SELECT i AS src, j AS dst FROM pairs
       |  UNION ALL
       |  SELECT j AS src, i AS dst FROM pairs),
       |reach AS (
       |  SELECT DISTINCT src AS id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.dst AS id, r.lbl FROM reach r
       |  JOIN edges e ON e.src = r.id),
       |labels AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
       |sizes AS (SELECT cluster_id, COUNT(*) AS n_members
       |          FROM labels GROUP BY 1)
       |SELECT l.id AS doc_id, l.cluster_id, s.n_members
       |FROM labels l JOIN sizes s USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- d10
  /** Containment near-dup pairs: the ASYMMETRIC overlap C(A→B) =
    * |A∩B| / |A| over distinct word trigrams, flagging pairs where the
    * smaller document is ≥ 80% contained in the other. Symmetric Jaccard
    * (d3) misses exactly these: a page plus the same page wrapped in
    * boilerplate has high containment but low Jaccard (the union is
    * inflated by the wrapper), and subset-duplicates are the dominant
    * crawl pathology (quoted articles, syndicated bodies, footer/header
    * variants). Output carries both directions' permille containment;
    * the threshold tests the max (= the smaller side's) with
    * cross-multiplied integer math, exact on both engines. */
  private val DfCap = 5

  /**
    * Scale shape: d11's CAPPED candidate generation (not d3's uncapped
    * form): grams present in more than [[DfCap]] distinct documents are
    * dropped before the self-join, and both the shared count and the
    * per-doc denominators run over the surviving grams only. A
    * containment operator is MORE exposed to the universal-boilerplate
    * hot key than Jaccard (the wrapper shingles that motivate
    * containment are exactly the corpus-frequent ones), so the cap is
    * the default here, same reasoning and same linearity bound as d11;
    * the candidate join stays proportional to true collisions, never
    * |docs|². The containment arithmetic adds nothing to the shuffle. */
  def d10Containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cappedCandidates(docs(spark, dir), DfCap)
      .filter($"shared" * 10 >= least($"ca", $"cb") * 8)
      .select($"i", $"j", $"shared", $"ca", $"cb",
        permille($"shared", $"ca").as("cont_i_milli"),
        permille($"shared", $"cb").as("cont_j_milli"))
      .orderBy($"i", $"j")
  }

  val d10ContainmentSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |gr AS (SELECT doc_id, ${sqlTrigrams("l")} AS grams FROM toks),
       |raw AS (
       |  SELECT doc_id, unnest(list_transform(grams, g -> ${sqlMd5Long("g")})) AS gh
       |  FROM gr),
       |hot AS (SELECT gh FROM raw GROUP BY gh HAVING COUNT(DISTINCT doc_id) > $DfCap),
       |kept AS (
       |  SELECT doc_id, gh FROM raw WHERE gh NOT IN (SELECT gh FROM hot)),
       |cnt AS (SELECT doc_id, COUNT(*) AS c FROM kept GROUP BY doc_id),
       |g AS (SELECT k.doc_id, k.gh, c.c FROM kept k JOIN cnt c USING (doc_id)),
       |shared AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, a.c AS ca, b.c AS cb,
       |         COUNT(*) AS shared
       |  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT i, j, shared, ca, cb,
       |  ${sqlPermille("shared", "ca")} AS cont_i_milli,
       |  ${sqlPermille("shared", "cb")} AS cont_j_milli
       |FROM shared
       |WHERE shared * 10 >= LEAST(ca, cb) * 8
       |ORDER BY i, j""".stripMargin

  // --------------------------------------------------------------- d11
  /** d3's Jaccard near-dup pairs with a DOCUMENT-FREQUENCY CAP on the
    * candidate-generating grams (CCNet-style): grams occurring in more
    * than `dfCap` documents are dropped BEFORE the self-join, and both
    * the shared count and the per-doc gram counts are computed over the
    * surviving grams only.
    *
    * Why this exists: d3/d10's candidate join is linear in true
    * collisions — but ONE universal shingle (site boilerplate, a
    * license header) with document frequency f produces f·(f-1)/2
    * candidate pairs by itself; at 100× data that single key's
    * collision set grows quadratically and its shuffle partition with
    * it. The cap bounds every gram's collision list at dfCap, so the
    * self-join cost is ≤ Σ min(df_g, dfCap)·df_g ≤ dfCap · |gram
    * stream| — LINEAR in corpus size no matter how skewed the gram
    * distribution (the planted-shingle spec proves it). Semantically, a
    * gram shared by thousands of documents carries no near-dup signal —
    * dropping it is the same reasoning as a stopword list, applied at
    * the shingle level. ([[DfCap]] is declared above d10, which shares
    * it — object val initialization order matters for the SQL strings.)
    *
    * Shape at scale: one extra hash aggregate computes df per gram
    * (map-side partial, fixed-width keys); the hot set is tiny by
    * Zipf's law (few grams are ultra-common) so it BROADCASTS into a
    * left-anti probe — the gram stream never takes an extra shuffle.
    * The per-doc recount joins on doc_id against its own aggregate
    * (exchange reuse, d3's pattern), then the capped self-join proceeds
    * exactly as d3. (t11 needs no cap: it only aggregates per gram
    * — cost linear by construction — and never forms pairs; t10's
    * skew-split is the no-pairs analogue, see
    * [[graft.operators.TextOps.t10CorpusShingles]].) */

  /** Capped candidate pairs (pre-threshold) from any (doc_id, text)
    * frame — exposed so the planted-universal-shingle spec can prove
    * candidate counts stay linear under a hot gram. */
  private[graft] def cappedCandidates(docsDf: DataFrame, dfCap: Int): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    graft.functions.TrigramHash60.register(spark)
    val raw = docsDf.select($"doc_id", explode(expr("trigram_hashes(text)")).as("gh"))
    // DOCUMENT frequency, not occurrence frequency: a single document
    // repeating a gram must not evict that gram corpus-wide. distinct
    // (gh, doc_id) first keeps the count a plain two-phase hash agg.
    val hot = raw.select($"gh", $"doc_id").distinct()
      .groupBy($"gh").agg(count(lit(1)).as("df"))
      .filter($"df" > dfCap).select($"gh")
    val kept = raw.join(broadcast(hot), Seq("gh"), "left_anti")
    val cnt = kept.groupBy($"doc_id").agg(count(lit(1)).as("c"))
    val g = kept.join(cnt, "doc_id")
    g.as("a").join(g.hint("shuffle_hash").as("b"),
        $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"),
               $"a.c".as("ca"), $"b.c".as("cb"))
      .agg(count(lit(1)).as("shared"))
  }

  def d11JaccardDfCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cappedCandidates(docs(spark, dir), DfCap)
      .withColumn("unions", $"ca" + $"cb" - $"shared")
      .filter($"shared" * 10 >= $"unions" * 6)
      .select($"i", $"j", $"shared", $"unions",
              permille($"shared", $"unions").as("jac_milli"))
      .orderBy($"i", $"j")
  }

  val d11JaccardDfCapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |gr AS (SELECT doc_id, ${sqlTrigrams("l")} AS grams FROM toks),
       |raw AS (
       |  SELECT doc_id, unnest(list_transform(grams, g -> ${sqlMd5Long("g")})) AS gh
       |  FROM gr),
       |hot AS (SELECT gh FROM raw GROUP BY gh HAVING COUNT(DISTINCT doc_id) > $DfCap),
       |kept AS (
       |  SELECT doc_id, gh FROM raw WHERE gh NOT IN (SELECT gh FROM hot)),
       |cnt AS (SELECT doc_id, COUNT(*) AS c FROM kept GROUP BY doc_id),
       |g AS (SELECT k.doc_id, k.gh, c.c FROM kept k JOIN cnt c USING (doc_id)),
       |shared AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, a.c AS ca, b.c AS cb,
       |         COUNT(*) AS shared
       |  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT i, j, shared, ca + cb - shared AS unions,
       |  ${sqlPermille("shared", "(ca + cb - shared)")} AS jac_milli
       |FROM shared
       |WHERE shared * 10 >= (ca + cb - shared) * 6
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- d12
  /** Embedding near-dup with LABEL-FREE blocking — the SemDeDup shape
    * (Abbas et al. 2023: k-means the corpus embeddings, compare pairs
    * only within a cluster). d5 blocks candidate pairs on the dataset's
    * `label` column, which a real embedding corpus does not have; d12
    * replaces that with [[SimilarityOps.kmeansCentroids]]'s learned
    * codebook (s6's exact deterministic training — same salts, same
    * codebook, so the oracle reuses the same CTEs). Each vector is
    * assigned to its TOP-2 nearest cells, so a pair straddling a cell
    * boundary still co-occurs in at least one block when both sit near
    * it; a pair sharing both cells scores identically in each (same
    * left-fold dot), and the final distinct collapses it.
    *
    * Scale shape: candidate generation is a self-join on the cell id —
    * linear in true intra-cell collisions, never all-pairs. At 100 TB
    * the codebook grows with the corpus (SemDeDup uses ~100k clusters;
    * k ≈ √N keeps expected cell size √N) and hot cells are split
    * recursively — [[SimilarityOps.refineHotCells]], spec-proven on a
    * planted 80%-of-corpus blob — so per-cell pair work stays bounded;
    * with k this small (10, sized to the sf test corpora) the join keys
    * are few — the production setting raises k, which both balances
    * cells and restores join parallelism. */
  def d12CosineDupKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    registerAll(spark)
    val e = emb(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot($"v", $"v")))
    val cents = SimilarityOps.kmeansCentroids(e)
    val blocks = e.withColumn("cell",
      explode(SimilarityOps.topCells($"v", cents, 2)))
    blocks.as("a").join(blocks.hint("shuffle_hash").as("b"),
        $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"))
      .filter($"cos" >= 0.35)
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
              micro($"cos").as("cos_micro"))
      .distinct()
      .orderBy($"i", $"j")
  }

  /** Oracle CTE prefix shared by d12 and d14: the learned codebook plus
    * the top-2-cell `blocks` assignment. */
  private val d12BlocksCtesSql: String = {
    val dist = SimilarityOps.sqlSqd _
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(${sqlDot("CAST(embedding AS DOUBLE[])", "CAST(embedding AS DOUBLE[])")}) AS nrm
       |  FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, 64)) AS d),
       |${SimilarityOps.sqlCoarseKmeansCtes},
       |blocks AS (
       |  SELECT vec_id, v, nrm, cid AS cell FROM (
       |    SELECT x.vec_id, x.v, x.nrm, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${dist("x.v", "c.cv")}, c.cid) AS rn
       |    FROM e x CROSS JOIN c2 c)
       |  WHERE rn <= 2)""".stripMargin
  }

  val d12CosineDupKmeansSql: String =
    s"""$d12BlocksCtesSql
       |SELECT DISTINCT a.vec_id AS i, b.vec_id AS j,
       |  ${sqlMicro(sqlDot("a.v", "b.v") + " / (a.nrm * b.nrm)")} AS cos_micro
       |FROM blocks a JOIN blocks b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE ${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- d14
  /** The SemDeDup KEEP step over d12's near-dup pairs: every vector
    * either survives or is dropped in favor of a representative. The
    * rule is greedy keep-smallest-id — a vector is dropped iff it has a
    * near-dup neighbor with a smaller id, and its representative is its
    * SMALLEST such neighbor. This is a per-vector AGGREGATE over the
    * pair list (min + count), not a connected-components iteration:
    * SemDeDup's published procedure also drops all-but-one per ε-ball
    * greedily rather than chasing transitive chains (d8 exists for the
    * cases where the full transitive cluster is wanted), so the
    * representative is a direct neighbor, not a chain root.
    *
    * Scale shape: d12's blocked candidate generation is reused verbatim
    * (linear in intra-cell collisions); on top of it are one hash
    * aggregate keyed by the dropped vector's id and one left join of
    * the id-only corpus against that (≤ #dropped)-row fixed-width
    * frame. No iteration, no window over the corpus, nothing
    * vector-sized past the pair stage. */
  def d14SemdedupKeep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val smaller = d12CosineDupKmeans(spark, dir)
      .groupBy($"j".as("vec_id"))
      .agg(min($"i").as("rep0"), count(lit(1)).as("n_smaller_dups"))
    emb(spark, dir).select($"vec_id")
      .join(smaller, Seq("vec_id"), "left")
      .select($"vec_id",
        $"rep0".isNull.cast("int").as("kept"),
        coalesce($"rep0", $"vec_id").as("rep"),
        coalesce($"n_smaller_dups", lit(0L)).as("n_smaller_dups"))
      .orderBy($"vec_id")
  }

  val d14SemdedupKeepSql: String =
    s"""$d12BlocksCtesSql,
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM blocks a JOIN blocks b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${sqlDot("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35),
       |sm AS (
       |  SELECT j AS vec_id, MIN(i) AS rep0, COUNT(*) AS n_smaller_dups
       |  FROM pairs GROUP BY j)
       |SELECT e.vec_id,
       |  CASE WHEN sm.vec_id IS NULL THEN 1 ELSE 0 END AS kept,
       |  COALESCE(sm.rep0, e.vec_id) AS rep,
       |  COALESCE(sm.n_smaller_dups, 0) AS n_smaller_dups
       |FROM e LEFT JOIN sm ON e.vec_id = sm.vec_id
       |ORDER BY e.vec_id""".stripMargin

  // ---------------------------------------------------------------- d13
  /** Incremental (batch-vs-corpus) dedup — the daily-ingest shape: a new
    * batch arrives and each document must be checked against the
    * EXISTING corpus, not the batch alone. Here the split is a
    * deterministic md5 coin (≈20% "today's batch", ≈80% standing
    * corpus); production swaps in the real ingest partition. Per batch
    * doc: is its exact signature already known, and under how many
    * corpus copies.
    *
    * Scale shape: the corpus side collapses to (sig, count) with one
    * hash agg BEFORE the join — the join input is one fixed-width row
    * per distinct corpus signature, not the corpus — and the join keys
    * are 32-byte md5s, so nothing document-sized ever shuffles. At
    * 100 TB the corpus signature table is the thing you persist between
    * ingests (bucketed by sig via [[graft.sources.LayoutOps
    * .writeBucketed]], making the daily join exchange-free on the
    * corpus side). The near-dup variant is [[d15IncrementalNeardup]]:
    * d4's LSH banding restricted to (batch × corpus) pairs with this
    * same coin. */
  /** (doc_id, sig, is_batch): d2's normalized set-signature
    * (order/multiplicity-insensitive — the corpus has no byte-exact
    * duplicates, but it does have shuffled-token near-dups, the
    * realistic incremental hit) plus the deterministic batch coin.
    * Shared by d13/d16 and p8/p10 so every incremental view agrees on
    * what "today's batch" is. */
  private[operators] def d13Coined(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val normSig =
      md5(concat_ws(" ", array_sort(array_distinct(tokens($"text")))).cast("binary"))
    docs(spark, dir)
      .select($"doc_id", normSig.as("sig"),
        (pmod(md5Long(concat($"doc_id".cast("string"), lit(":d13"))),
          lit(5L)) === 0L).as("is_batch"))
  }

  def d13IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val coined = d13Coined(spark, dir)
    val corpusSigs = coined.filter(!$"is_batch")
      .groupBy($"sig").agg(count(lit(1)).as("n_corpus_copies"))
    coined.filter($"is_batch")
      .join(corpusSigs, Seq("sig"), "left")
      .select($"doc_id",
        $"n_corpus_copies".isNotNull.as("known"),
        coalesce($"n_corpus_copies", lit(0L)).as("n_corpus_copies"))
      .orderBy($"doc_id")
  }

  val d13IncrementalDedupSql: String =
    s"""WITH coined AS (
       |  SELECT doc_id,
       |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig,
       |    ${sqlMd5Long("CAST(doc_id AS VARCHAR) || ':d13'")} % 5 = 0 AS is_batch
       |  FROM documents),
       |corpus AS (
       |  SELECT sig, COUNT(*) AS n_corpus_copies
       |  FROM coined WHERE NOT is_batch GROUP BY sig)
       |SELECT b.doc_id,
       |  c.sig IS NOT NULL AS known,
       |  COALESCE(c.n_corpus_copies, 0) AS n_corpus_copies
       |FROM coined b LEFT JOIN corpus c ON b.sig = c.sig
       |WHERE b.is_batch
       |ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------------- d15
  /** Incremental NEAR-dup — the composition d13's scaladoc promises:
    * d4's MinHash-LSH banding restricted to (batch × corpus) pairs using
    * d13's md5 coin, so each new-batch document surfaces its fuzzy
    * matches in the STANDING corpus (d13 catches only signature-exact
    * re-ingests; this catches the near-rewrites). Same 16-slot
    * signatures, same 4×4 banding, same coin salt as d13 — the two
    * incremental views agree on what "today's batch" is.
    *
    * Scale shape: identical to d4's — the only join is on (band, key),
    * and the sides are DISJOINT (batch ∨ corpus), so the collision set
    * is linear in true near-dups crossing the boundary. At 100 TB the
    * corpus band keys are the artifact to persist between ingests
    * (alongside d13's signature table, bucketed by key); the daily batch
    * bands against a static corpus-side table, which is exactly this
    * join with the corpus scan swapped for the persisted table. */
  def d15IncrementalNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val isBatch = pmod(md5Long(concat($"doc_id".cast("string"), lit(":d13"))),
      lit(5L)) === 0L
    val keys = bandedKeys(minhashSigsFrom(gramSets(spark, dir)))
      .withColumn("is_batch", isBatch)
    keys.filter($"is_batch").as("n")
      .join(keys.filter(!$"is_batch").hint("shuffle_hash").as("c"),
        $"n.band" === $"c.band" && $"n.key" === $"c.key")
      .select($"n.doc_id".as("batch_id"), $"c.doc_id".as("corpus_id"))
      .distinct()
      .orderBy($"batch_id", $"corpus_id")
  }

  val d15IncrementalNeardupSql: String =
    s"""WITH $d4BandsCte,
       |coin AS (
       |  SELECT doc_id,
       |    ${sqlMd5Long("CAST(doc_id AS VARCHAR) || ':d13'")} % 5 = 0 AS is_batch
       |  FROM documents)
       |SELECT DISTINCT n.doc_id AS batch_id, c.doc_id AS corpus_id
       |FROM bands n
       |JOIN coin cn ON n.doc_id = cn.doc_id AND cn.is_batch
       |JOIN bands c ON n.band = c.band AND n.key = c.key
       |JOIN coin cc ON c.doc_id = cc.doc_id AND NOT cc.is_batch
       |ORDER BY batch_id, corpus_id""".stripMargin

  // ---------------------------------------------------------------- d16
  /** d13's DAY-2 form — the persisted-standing-state composition d13's
    * scaladoc promises, made real: the corpus signature table is built
    * ONCE with [[graft.sources.LayoutOps.writeBucketed]] (bucketed +
    * sorted on `sig`, one file per bucket) and every later ingest
    * probes it as a catalog table. Because the bucketed scan already
    * provides hash-partitioning on the join key, the daily probe join
    * plans ZERO exchange and zero sort on the corpus side — only the
    * (small) daily batch shuffles (plan-guarded in Round7OpsSpec). The
    * `merge` hint pins the sort-merge shape: at 100 TB the standing
    * side is never broadcastable, and letting the test-scale optimizer
    * broadcast it would hide exactly the exchange this operator exists
    * to eliminate. Output is identical to d13 (same oracle): the state
    * table is a pure materialization of d13's corpus aggregate. */
  def d16IncrementalDay2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val coined = d13Coined(spark, dir)
    val t = graft.sources.LayoutOps.stateTable("graft_state_d13_sigs", dir)
    if (!spark.catalog.tableExists(t)) {
      val corpusSigs = coined.filter(!$"is_batch")
        .groupBy($"sig").agg(count(lit(1)).as("n_corpus_copies"))
      graft.sources.LayoutOps.writeBucketed(corpusSigs, t, "sig", 8)
    }
    coined.filter($"is_batch")
      .join(spark.table(t).hint("merge"), Seq("sig"), "left")
      .select($"doc_id",
        $"n_corpus_copies".isNotNull.as("known"),
        coalesce($"n_corpus_copies", lit(0L)).as("n_corpus_copies"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- d17
  /** d15's DAY-2 form: the corpus LSH band keys are the persisted
    * artifact (alongside d16's signature table), bucketed on the
    * combined `band:key` string so the daily batch-vs-corpus band join
    * reads the standing side exchange-free. The band key is md5 hex
    * (no ':'), so the concatenation is collision-free. Only today's
    * batch is shingled, minhashed and shuffled; the corpus side is a
    * bucketed scan of fixed-width rows. Output (and oracle) identical
    * to d15. */
  def d17NeardupDay2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val isBatch = pmod(md5Long(concat($"doc_id".cast("string"), lit(":d13"))),
      lit(5L)) === 0L
    val keys = bandedKeys(minhashSigsFrom(gramSets(spark, dir)))
      .withColumn("is_batch", isBatch)
      .withColumn("bk", concat_ws(":", $"band", $"key"))
    val t = graft.sources.LayoutOps.stateTable("graft_state_d15_bands", dir)
    if (!spark.catalog.tableExists(t))
      graft.sources.LayoutOps.writeBucketed(
        keys.filter(!$"is_batch").select($"bk", $"doc_id"), t, "bk", 8)
    keys.filter($"is_batch").select($"bk", $"doc_id".as("batch_id"))
      .join(spark.table(t).hint("merge")
        .withColumnRenamed("doc_id", "corpus_id"), Seq("bk"))
      .select($"batch_id", $"corpus_id").distinct()
      .orderBy($"batch_id", $"corpus_id")
  }

  // ---------------------------------------------------------------- d18
  /** Embedding near-dup pairs over the HOT-CELL-SPLIT partition — the
    * shipped path for [[SimilarityOps.refineHotCells]], closing round
    * 6's "spec-only" gap: the k-means codebook balances cells only
    * statistically, and one dense region makes every within-cell pair
    * join quadratic in that cell; here any cell holding more than
    * [[HotCellMax]] vectors is re-clustered (k=4 sub-k-means over ITS
    * members, salted by cell path code) and pairs form within the
    * REFINED partition. One refinement round per query (`depth = 1`) —
    * enough to bound the sf cell sizes, and what keeps the oracle
    * statically expressible; production iterates the same move.
    *
    * The oracle replicates the whole per-cell training GROUPED in SQL:
    * every CTE of the s6 k-means (seed draw, φ, oversample coin,
    * weights, init, one Lloyd round) re-keyed by cell with the same
    * `:hot<cell>`/`:hotc<cell>` salts, then the radix path-code
    * reassignment `(cell+1)·100 + subIndex` — so the engine's driver
    * loop and the oracle's grouped windows must agree cell by cell,
    * member by member. Single-assignment blocking (vs d12's top-2):
    * the refinement demo wants a PARTITION, and the output carries the
    * refined cell id to pin the id scheme cross-engine. */
  private val HotCellMax = 60L

  def d18CosineDupHotsplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    registerAll(spark)
    // the raw corpus frame is NOT cached (array columns defeat the
    // columnar cache — s6's measured anti-lesson); the expensive
    // intermediate, the refined assignment, is checkpointed inside
    // refineHotCells
    val e = emb(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot($"v", $"v")))
    val cents = SimilarityOps.kmeansCentroids(e)
    val cells = SimilarityOps.refineHotCells(e.select($"vec_id", $"v"),
      cents, maxSize = HotCellMax, depth = 1, subK = 4)
    val b = e.join(cells, "vec_id")
    b.as("a").join(b.hint("shuffle_hash").as("b"),
        $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm"))
      .filter($"cos" >= 0.35)
      .select($"a.cell".as("cell"), $"a.vec_id".as("i"), $"b.vec_id".as("j"),
              micro($"cos").as("cos_micro"))
      .orderBy($"i", $"j")
  }

  val d18CosineDupHotsplitSql: String = {
    val dist = SimilarityOps.sqlSqd _
    val coin4 = (8.0 * math.pow(2.0, 60)).toString
    val hSeed =
      sqlMd5Long("CAST(m.vec_id AS VARCHAR) || ':hot' || CAST(m.cell AS VARCHAR)")
    val hCoin =
      sqlMd5Long("CAST(d.vec_id AS VARCHAR) || ':hotc' || CAST(d.cell AS VARCHAR)")
    s"""$d12BlocksCtesSql,
       |idx AS (SELECT cid, ROW_NUMBER() OVER (ORDER BY cid) - 1 AS cell FROM c2),
       |asg AS (
       |  SELECT vec_id, v, nrm, cell FROM (
       |    SELECT x.vec_id, x.v, x.nrm, i.cell,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${dist("x.v", "c.cv")}, c.cid) AS rn
       |    FROM e x CROSS JOIN c2 c JOIN idx i ON i.cid = c.cid)
       |  WHERE rn = 1),
       |siz AS (SELECT cell, COUNT(*) AS n FROM asg GROUP BY cell),
       |hotc AS (SELECT cell FROM siz WHERE n > $HotCellMax),
       |hm AS (SELECT a.vec_id, a.v, a.cell FROM asg a JOIN hotc USING (cell)),
       |hseed AS (
       |  SELECT cell, vec_id AS sid, v AS sv FROM (
       |    SELECT m.cell, m.vec_id, m.v,
       |      ROW_NUMBER() OVER (PARTITION BY m.cell ORDER BY $hSeed, m.vec_id) AS rn
       |    FROM hm m) WHERE rn = 1),
       |hd0 AS (
       |  SELECT m.cell, m.vec_id, m.v, s.sid,
       |    CAST(FLOOR(1000000.0 * ${dist("m.v", "s.sv")}) AS BIGINT) AS d2m
       |  FROM hm m JOIN hseed s USING (cell)),
       |hphi AS (SELECT cell, CAST(SUM(d2m) AS BIGINT) AS p FROM hd0 GROUP BY cell),
       |hcand AS (
       |  SELECT d.cell, d.vec_id, d.v FROM hd0 d JOIN hphi ph USING (cell)
       |  WHERE CAST($hCoin AS DOUBLE) * CAST(ph.p AS DOUBLE)
       |          < $coin4 * CAST(d.d2m AS DOUBLE)
       |     OR d.vec_id = d.sid),
       |hw0 AS (
       |  SELECT m.cell, m.vec_id AS xid, c.vec_id AS cid,
       |    ROW_NUMBER() OVER (PARTITION BY m.cell, m.vec_id
       |      ORDER BY ${dist("m.v", "c.v")}, c.vec_id) AS rn
       |  FROM hm m JOIN hcand c USING (cell)),
       |hwt AS (SELECT cell, cid, COUNT(*) AS n FROM hw0 WHERE rn = 1 GROUP BY 1, 2),
       |hinit AS (
       |  SELECT cell, cid, cv FROM (
       |    SELECT c.cell, c.vec_id AS cid, c.v AS cv,
       |      ROW_NUMBER() OVER (PARTITION BY c.cell
       |        ORDER BY w.n DESC, c.vec_id) AS rk
       |    FROM hcand c JOIN hwt w ON w.cell = c.cell AND w.cid = c.vec_id)
       |  WHERE rk <= 4),
       |ha1 AS (
       |  SELECT m.cell, m.vec_id, m.v, i.cid,
       |    ROW_NUMBER() OVER (PARTITION BY m.cell, m.vec_id
       |      ORDER BY ${dist("m.v", "i.cv")}, i.cid) AS rn
       |  FROM hm m JOIN hinit i USING (cell)),
       |hs1 AS (
       |  SELECT cell, cid, d,
       |    CAST(SUM(CAST(FLOOR(1000000.0 * v[d]) AS BIGINT)) AS BIGINT) AS s,
       |    COUNT(*) AS n
       |  FROM ha1 CROSS JOIN dims WHERE rn = 1 GROUP BY 1, 2, 3),
       |hc1 AS (
       |  SELECT cell, cid, list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
       |                         ORDER BY d) AS cv
       |  FROM hs1 GROUP BY 1, 2),
       |hcnt AS (SELECT cell, COUNT(*) AS nc FROM hc1 GROUP BY cell),
       |sidx AS (
       |  SELECT cell, cid,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cid) - 1 AS si
       |  FROM hc1),
       |rasg AS (
       |  SELECT r.cell, r.vec_id, s.si FROM (
       |    SELECT m.cell, m.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY m.cell, m.vec_id
       |        ORDER BY ${dist("m.v", "c.cv")}, c.cid) AS rn
       |    FROM hm m JOIN hc1 c USING (cell)) r
       |  JOIN sidx s ON s.cell = r.cell AND s.cid = r.cid
       |  WHERE r.rn = 1),
       |refined AS (
       |  SELECT a.vec_id, a.v, a.nrm,
       |    CASE WHEN h.cell IS NULL THEN a.cell
       |         WHEN hc.nc < 2 THEN a.cell
       |         ELSE (a.cell + 1) * 100 + r.si END AS cell
       |  FROM asg a
       |  LEFT JOIN hotc h ON h.cell = a.cell
       |  LEFT JOIN hcnt hc ON hc.cell = a.cell
       |  LEFT JOIN rasg r ON r.cell = a.cell AND r.vec_id = a.vec_id)
       |SELECT x.cell, x.vec_id AS i, y.vec_id AS j,
       |  ${sqlMicro(s"(${sqlDot("x.v", "y.v")} / (x.nrm * y.nrm))")} AS cos_micro
       |FROM refined x JOIN refined y
       |  ON x.cell = y.cell AND x.vec_id < y.vec_id
       |WHERE ${sqlDot("x.v", "y.v")} / (x.nrm * y.nrm) >= 0.35
       |ORDER BY i, j""".stripMargin
  }

  // ---------------------------------------------------------------- d19
  /** Duplicated-SPAN coverage — the n-gram-granular form of exact
    * substring deduplication (suffix-array dedup finds maximal repeated
    * substrings; fixed-n gram starts are the distributable
    * approximation: a repeated substring of length ≥ n is exactly a run
    * of repeated n-gram starts). Reports, per document, how many of its
    * tokens sit inside an n-gram that also occurs in ≥ 2 DISTINCT
    * documents — the signal a span-removal pass would act on, and the
    * corpus statistic ("how much of my data is boilerplate spans?") a
    * curation dashboard shows.
    *
    * Coverage is an exact interval union, not `dup_starts · n`: each
    * duplicated start at position p covers [p, p+n-1]; overlapping
    * spans must not double-count. Per doc, over starts sorted by
    * position, the new tokens contributed by a start are
    * `min(n, pos - prev_pos)` (n for the first) — a single `lag`
    * window per document, O(starts) per doc.
    *
    * 100 TB shape: per-position hashes come from the native
    * [[graft.functions.NgramHashSeq]] (one md5 pass per doc, same
    * measured rationale as ngram_hashes); every shuffle afterwards
    * carries only (doc_id, pos, hash) — text never leaves the scan.
    * The duplicated-gram set is found by distinct-doc df ≥ 2 (one
    * fixed-width hash agg), membership by a LEFT SEMI join on the gram
    * hash — semi joins are linear in the probe side even under a
    * universal boilerplate gram (each gram row matches at most once;
    * no pair explosion, so d11's df-cap is not needed here), and the
    * per-doc interval union is one window over each doc's own starts. */
  private val D19N = 5

  def d19DupspanCoverage(spark: SparkSession, dir: String): DataFrame =
    d19From(docs(spark, dir))

  private[operators] def d19From(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    graft.functions.NgramHashSeq.register(spark)
    val grams = d.select($"doc_id",
      posexplode(expr(s"ngram_hash_seq(text, $D19N)")).as(Seq("pos", "h")))
    val dup = grams.select($"doc_id", $"h").distinct()
      .groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2).select($"h")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val cov = grams.join(dup, Seq("h"), "left_semi")
      .withColumn("prev", lag($"pos", 1).over(w))
      .withColumn("add", when($"prev".isNull, lit(D19N))
        .otherwise(least(lit(D19N), $"pos" - $"prev")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("dup_starts"),
           sum($"add").cast("long").as("covered"))
    d.select($"doc_id", size(split($"text", " ")).cast("long").as("n_toks"))
      .join(cov, Seq("doc_id"), "left")
      .select($"doc_id", $"n_toks",
        coalesce($"dup_starts", lit(0L)).as("dup_starts"),
        coalesce($"covered", lit(0L)).as("covered_toks"),
        floor(lit(1000.0) * coalesce($"covered", lit(0L)) / $"n_toks")
          .cast("long").as("coverage_permille"))
      .orderBy($"doc_id")
  }

  val d19DupspanCoverageSql: String = {
    val n = D19N
    val gramHash =
      sqlMd5Long(s"array_to_string(list_slice(t.ts, u.i, u.i + ${n - 1}), ' ')")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |grams AS (
       |  SELECT t.doc_id, CAST(u.i AS BIGINT) - 1 AS pos, $gramHash AS h
       |  FROM toks t, UNNEST(generate_series(1, len(t.ts) - ${n - 1})) AS u(i)),
       |dup AS (
       |  SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY h)
       |  WHERE df >= 2),
       |st AS (
       |  SELECT g.doc_id, g.pos,
       |    LAG(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
       |  FROM grams g JOIN dup USING (h)),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS dup_starts,
       |    CAST(SUM(CASE WHEN prev IS NULL THEN $n
       |                  ELSE LEAST($n, pos - prev) END) AS BIGINT) AS covered
       |  FROM st GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_toks,
       |  COALESCE(a.dup_starts, 0) AS dup_starts,
       |  COALESCE(a.covered, 0) AS covered_toks,
       |  CAST(FLOOR(1000.0 * COALESCE(a.covered, 0) / len(t.ts)) AS BIGINT)
       |    AS coverage_permille
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d20
  /** The dedup LADDER — one frame comparing how much corpus each
    * escalating dedup policy keeps: exact bytes (d1's sig), normalized
    * token-set (d2's), trigram-Jaccard ≥ 0.6 (d3's pairs), and
    * MinHash-LSH candidates (d4's buckets), each reported as
    * (docs_kept, tokens_kept, kept_permille). This is the decision
    * table a curation team reads before picking an aggressiveness
    * level — the per-method operators tell you WHO is duplicated, the
    * ladder tells you WHAT IT COSTS.
    *
    * Keep rules are the deterministic ones the per-method operators
    * already define: signature groups keep their min doc_id; pair
    * methods keep every doc with no smaller-id partner (d14's
    * min-neighbor rule applied to text pairs — a doc is dropped iff
    * some smaller doc pairs with it).
    *
    * Scale shape: strictly the union of its parts — the sig methods
    * are 32-byte hash-aggs, the pair methods reuse d3/d4's
    * gram/band-bucket joins (never all-pairs), and the ladder itself
    * is four tiny aggregates unioned with the one-row totals frame
    * broadcast in. Token counts ride the one text scan map-side. */
  def d20DedupLadder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = docs(spark, dir)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_toks"))
    val totals = tok.agg(count(lit(1)).as("n_docs"),
      sum($"n_toks").as("n_tokens"))
    val exactKept = docs(spark, dir)
      .select($"doc_id", md5($"text".cast("binary")).as("sig"))
      .groupBy($"sig").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val normKept = docs(spark, dir)
      .select($"doc_id",
        md5(concat_ws(" ", array_sort(array_distinct(tokens($"text"))))
          .cast("binary")).as("sig"))
      .groupBy($"sig").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val d3Kept = tok.select($"doc_id")
      .join(d3NgramJaccard(spark, dir).select($"j".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    val d4Kept = tok.select($"doc_id")
      .join(d4MinhashLsh(spark, dir).select($"j".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    def rung(name: String, kept: DataFrame): DataFrame =
      kept.join(tok, Seq("doc_id"))
        .agg(count(lit(1)).as("docs_kept"), sum($"n_toks").as("tokens_kept"))
        .select(lit(name).as("method"), $"docs_kept", $"tokens_kept")
    rung("exact", exactKept)
      .unionByName(rung("normset", normKept))
      .unionByName(rung("jaccard_06", d3Kept))
      .unionByName(rung("minhash_lsh", d4Kept))
      .crossJoin(broadcast(totals))
      .select($"method", $"docs_kept", $"tokens_kept", $"n_docs", $"n_tokens",
        expr("(1000 * docs_kept) div n_docs").as("kept_permille"))
      .orderBy($"method")
  }

  val d20DedupLadderSql: String =
    s"""WITH d3p AS (
       |  SELECT i, j FROM (${d3NgramJaccardSql.replace("ORDER BY i, j", "")})),
       |$d4PairsCte,
       |tok AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |tot AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM tok),
       |exact_kept AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |norm_kept AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))),
       |d3_kept AS (
       |  SELECT doc_id FROM tok
       |  WHERE doc_id NOT IN (SELECT DISTINCT j FROM d3p)),
       |d4_kept AS (
       |  SELECT doc_id FROM tok
       |  WHERE doc_id NOT IN (SELECT DISTINCT j FROM pairs)),
       |rungs AS (
       |  SELECT 'exact' AS method, COUNT(*) AS docs_kept,
       |    CAST(SUM(n_toks) AS BIGINT) AS tokens_kept
       |  FROM exact_kept JOIN tok USING (doc_id)
       |  UNION ALL
       |  SELECT 'normset', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
       |  FROM norm_kept JOIN tok USING (doc_id)
       |  UNION ALL
       |  SELECT 'jaccard_06', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
       |  FROM d3_kept JOIN tok USING (doc_id)
       |  UNION ALL
       |  SELECT 'minhash_lsh', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
       |  FROM d4_kept JOIN tok USING (doc_id))
       |SELECT method, docs_kept, tokens_kept, n_docs, n_tokens,
       |  (1000 * docs_kept) // n_docs AS kept_permille
       |FROM rungs CROSS JOIN tot
       |ORDER BY method""".stripMargin

  // --------------------------------------------------------------- d21
  /** MinHash-LSH band tuning curve — the dedup analog of s17's nprobe
    * curve: for every banding of the 16-slot signature (16×1, 8×2,
    * 4×4 = d4's shipped config, 2×8, 1×16), the measured candidate
    * count, recall and precision against the EXACT trigram-set Jaccard
    * ≥ 0.6 ground truth, next to the theoretical hit rate at J = 0.6.
    * This is the table a pipeline owner reads before moving the dedup
    * knob: more bands → higher recall, more candidates to verify;
    * fewer → cheaper, leakier. The theory column is exact integer
    * arithmetic — J = 3/5, so 1−(1−J^r)^b = (5^16 − (5^r−3^r)^b)/5^16
    * in permille with every intermediate inside a BIGINT — no
    * cross-engine pow() in sight.
    *
    * Ground truth matches d9's estimator ledger (DISTINCT gram sets,
    * inter/union), generated by [[jaccardTruthPairs]] — an exact
    * fan-out probe picks the cheap unrestricted join when it is
    * provably small and the PPJoin prefix-filtered arm
    * ([[jaccardPrefixCandidates]]) above the bound (r11 verdict item
    * #2: the previous ALWAYS-unrestricted self-join was quadratic on
    * hot grams), keeping truth EXACT at either scale. Degenerate LSH buckets (a band key shared by > 256
    * docs — a boilerplate min-gram at crawl scale) are EXCLUDED from
    * pair generation and surfaced per config as `n_capped_buckets`
    * (d11's cap + honest-flag discipline; a no-op on the declared
    * data, spec-pinned against a planted hot bucket).
    *
    * Scale shape: signatures and gram sets are computed ONCE and
    * shared across the 5 configs (persist + release); each config's
    * candidate join is bucket-bounded by the cap; the per-config
    * counts are driver-side scalars, so the output frame is 5 rows
    * built from aggregates, never a collected pair set. */
  private[operators] val D21Configs =
    Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
  private[operators] val D21BucketCap = 256

  /** Exact 1−(1−(3/5)^r)^b in permille, all-integer. */
  private def d21Theory(b: Int, r: Int): Long = {
    val p516 = BigInt(5).pow(16)
    val miss = (BigInt(5).pow(r) - BigInt(3).pow(r)).pow(b) *
      BigInt(5).pow(16 - b * r)
    ((p516 - miss) * 1000 / p516).toLong
  }

  def d21BandTuning(spark: SparkSession, dir: String): DataFrame =
    d21BandTuningFrom(docs(spark, dir))

  /** PPJoin prefix-filtered candidate pairs for exact Jaccard ≥ 0.6
    * over a (doc_id, hs) DISTINCT-gram-set frame — the scale-safe
    * EXACT-truth generator (Xiao, Wang, Lin, Yu, "Efficient Similarity
    * Joins for Near Duplicate Detection", WWW 2008).
    *
    * Prefix-filter theorem: order every doc's grams by ONE global
    * total order (ascending global document frequency, ties by gram
    * hash — rarest first) and keep only the first
    * ⌊(1−t)·|g|⌋+1 = |g| − ⌈t·|g|⌉ + 1 grams as the doc's PREFIX.
    * If J(A,B) ≥ t then |A∩B| ≥ t·|A∪B| ≥ ⌈t·|A|⌉; were the prefixes
    * disjoint, the order-smallest shared gram would sit outside one
    * doc's prefix, forcing ALL shared grams into that doc's last
    * ⌈t·|g|⌉−1 positions — a contradiction. So joining prefixes loses
    * NO true pair: truth stays exact.
    *
    * Why this is the 100 TB shape where the unrestricted shared-gram
    * self-join is not: a boilerplate gram carried by 100k docs fans
    * out to 5×10⁹ pairs in the unrestricted join, but — being
    * globally COMMON — it sorts LAST in every doc's rarest-first
    * order and lands in almost no prefixes, so the prefix join's
    * fan-out per gram is bounded by PREFIX df, which the df ordering
    * actively minimizes. The size filter (10·min(ca,cb) ≥ 6·max —
    * necessary since J ≤ min/max) prunes cross-length pairs in the
    * join itself. Returns (i, j, ca, cb) candidate pairs — a SUPERSET
    * of the truth set; callers apply the exact intersect/union check
    * (d9's array_intersect idiom, bounded by candidates × doc
    * length). Spec-pinned on a planted boilerplate corpus (one gram
    * in every doc): candidates stay linear, not quadratic. */
  private[operators] def jaccardPrefixCandidates(hs: DataFrame): DataFrame = {
    val spark = hs.sparkSession
    import spark.implicits._
    val g = hs.select($"doc_id", size($"hs").as("c"), explode($"hs").as("gh"))
    // global df per gram; joined back on gh (shuffle_hash, d3's idiom —
    // the vocabulary is corpus-sized, never broadcastable at scale)
    val gdf = g.groupBy($"gh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"df".asc, $"gh".asc)
    val prefix = g.join(gdf.hint("shuffle_hash"), Seq("gh"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"c" - expr("(c * 6 + 9) div 10") + 1)
      .select($"doc_id", $"c", $"gh")
    prefix.as("a").join(prefix.hint("shuffle_hash").as("b"),
        $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id" &&
          $"a.c" * 10 >= $"b.c" * 6 && $"b.c" * 10 >= $"a.c" * 6)
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        $"a.c".as("ca"), $"b.c".as("cb"))
      .distinct()
  }

  /** Exact-candidate-count bound under which the truth join skips the
    * prefix filter: the unrestricted shared-gram self-join emits
    * EXACTLY Σ_g df·(df−1)/2 rows, a quantity one gram-keyed aggregate
    * computes BEFORE committing to either plan. At ≤ 50M narrow
    * (3-long) rows the naive join is a ~1 GB shuffle — trivial on any
    * cluster and measurably CHEAPER than the prefix arm's extra
    * df-rank window (A/B at sf0.1: naive 7.6 s vs prefix 10.6 s,
    * because this corpus's flat df profile never triggers the
    * quadratic case) — while the catastrophe the prefix arm exists
    * for is 5×10⁹ pairs from one 100k-doc boilerplate gram, 100× over
    * this bound. Same sanctioned two-arm shape as componentsFrom's
    * driver probe: an exact, cheap size probe picks the plan, the
    * scale arm is the fallback, and specs force BOTH arms. */
  private[operators] val NaiveTruthFanoutBound = 50000000L

  /** Exact Jaccard ≥ 0.6 truth pairs (i, j) from a (doc_id, hs) frame.
    * Two output-identical arms behind an exact fan-out probe:
    * corpora whose shared-gram join provably emits ≤ `fanoutBound`
    * rows take the unrestricted join (cheapest constants); anything
    * bigger — a single hot gram is enough — takes the PPJoin
    * prefix-filtered candidates ([[jaccardPrefixCandidates]], the
    * prefix-filter theorem keeps truth EXACT), never quadratic on hot
    * grams. `fanoutBound` is parameterized ONLY so the spec can force
    * each arm on the same corpus and assert identical output. */
  private[operators] def jaccardTruthPairs(hs: DataFrame,
      fanoutBound: Long = NaiveTruthFanoutBound): DataFrame = {
    val spark = hs.sparkSession
    import spark.implicits._
    val g = hs.select($"doc_id", size($"hs").as("c"), explode($"hs").as("gh"))
    val fanout = g.groupBy($"gh").agg(count(lit(1)).as("df"))
      .agg(sum(($"df" * ($"df" - 1) / 2).cast("decimal(38,0)")))
      .first().getDecimal(0)
    val gi = g.select($"doc_id".as("i"), $"gh")
    val gj = g.select($"doc_id".as("j"), $"gh")
    if (fanout != null &&
        fanout.compareTo(new java.math.BigDecimal(fanoutBound)) <= 0) {
      // naive arm: the probe just PROVED the join is small
      g.as("a").join(g.hint("shuffle_hash").as("b"),
          $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"),
          $"a.c".as("ca"), $"b.c".as("cb"))
        .agg(count(lit(1)).as("inter"))
        .filter($"inter" * 10 >= ($"ca" + $"cb" - $"inter") * 6)
        .select($"i", $"j")
    } else {
      // prefix arm — exact |A∩B| per candidate: explode the candidate
      // pairs against doc i's grams, then equi-join on the COMPOSITE
      // (j, gh) — each row matches at most one gram of j, so the count
      // is the exact intersection and the fan-out is candidates × doc
      // length, with only narrow (3-long) rows in the shuffles
      jaccardPrefixCandidates(hs)
        .join(gi, Seq("i"))
        .join(gj.hint("shuffle_hash"), Seq("j", "gh"), "left_semi")
        .groupBy($"i", $"j", $"ca", $"cb").agg(count(lit(1)).as("inter"))
        .filter($"inter" * 10 >= ($"ca" + $"cb" - $"inter") * 6)
        .select($"i", $"j")
    }
  }

  private[operators] def d21BandTuningFrom(docsDf: DataFrame,
      cap: Int = D21BucketCap): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    val hs = gramSetsFrom(docsDf).persist()
    val sig = minhashSigsFrom(hs).persist()
    try {
      // exact ground truth over DISTINCT gram sets, behind
      // jaccardTruthPairs' fan-out probe (r11's one flagged
      // scale-killer, removed): one gram-keyed aggregate computes the
      // unrestricted join's EXACT output size Σ df·(df−1)/2 and picks
      // the plan — ≤ 50M rows takes the cheap naive join (A/B at
      // sf0.1, same host, whole query: naive 7.6 s vs
      // always-prefix 10.6 s — this corpus's FLAT df profile never
      // pays the quadratic case, so the df-rank window was pure
      // constant overhead), anything hotter takes the PPJoin prefix
      // arm whose candidate fan-out is bounded by PREFIX df
      // (spec-pinned: a planted boilerplate gram in every doc
      // generates ZERO prefix candidates where the naive join
      // generates all C(n,2); both arms spec-forced output-identical).
      // The truth chain (fan-out probe + eager checkpoint) and the
      // banded-candidate checkpoint below are data-INDEPENDENT action
      // chains — both read only the persisted hs/sig — so they run
      // CONCURRENTLY (guide §2.6 / ParActions): the cand chain's one
      // job back-fills the idle capacity between the truth chain's
      // two. Same plans, same checkpoints — only submission order
      // moves. AtomicReferences so the finally releases whichever
      // side materialized even if the other chain's job failed.
      val truthRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]
      val candRef = new java.util.concurrent.atomic.AtomicReference[DataFrame]
      try {
        // ALL configs ride one pipeline: a per-config driver loop costs
        // ~4 actions × 5 configs of pure scheduling (measured 12.9 s at
        // sf0.1); unioning the 31 band rows/doc into one frame computes
        // the whole curve in 3 aggregate actions (12.9 → 8.9 s measured;
        // the remainder is the real banding/join work — d4's single
        // config alone is 1.3 s, this runs five plus exact truth), and
        // at 100 TB it is one corpus pass instead of five.
        val bandedAll = D21Configs.map { case (b, r) =>
          val keyCols = array((0 until b).map { bi =>
            md5(concat_ws(",", (0 until r).map(i =>
              col(s"m${bi * r + i}").cast("string")): _*).cast("binary"))
          }: _*)
          sig.select(lit(b).as("bands"), $"doc_id",
            posexplode(keyCols).as(Seq("band", "key")))
        }.reduce(_ unionByName _)
        val sized = bandedAll.withColumn("bn",
          count(lit(1)).over(Window.partitionBy($"bands", $"band", $"key")))
        val ok = sized.filter($"bn" <= cap)
          .select($"bands", $"doc_id", $"band", $"key")
        ParActions.both {
          truthRef.set(jaccardTruthPairs(hs)
            .localCheckpoint()) // consumed twice in the fused stats job:
                                // hit semi-join + truth-size count
          ()
        } {
          candRef.set(ok.as("a").join(ok.as("b"),
              $"a.bands" === $"b.bands" && $"a.band" === $"b.band" &&
                $"a.key" === $"b.key" && $"a.doc_id" < $"b.doc_id")
            .select($"a.bands".as("bands"), $"a.doc_id".as("i"),
              $"b.doc_id".as("j")).distinct()
            .localCheckpoint()) // consumed twice: count + hit semi-join
          ()
        }
        val truth = truthRef.get()
        val cand = candRef.get()
        locally {
          // ONE stats job for all four scalar counters (capped
          // buckets, candidates, truth hits, truth size): they were
          // four separate collect()/count() actions — four driver
          // round-trips whose job latency, not compute, dominates at
          // any SF where the frames are metadata-sized (r16-opt).
          // The union branches are tiny per-bands aggregates, so the
          // fused job's stages run concurrently on idle cores.
          def tagged(df: DataFrame, tag: String) =
            df.select(lit(tag).as("m"), $"bands", $"c")
          val stats = tagged(sized.filter($"bn" > cap)
              .select($"bands", $"band", $"key").distinct()
              .groupBy($"bands").agg(count(lit(1)).as("c")), "capped")
            .unionByName(tagged(
              cand.groupBy($"bands").agg(count(lit(1)).as("c")), "cand"))
            .unionByName(tagged(
              cand.join(truth, Seq("i", "j"), "left_semi")
                .groupBy($"bands").agg(count(lit(1)).as("c")), "hit"))
            .unionByName(tagged(
              truth.agg(count(lit(1)).as("c"))
                .select(lit(0).as("bands"), $"c"), "true"))
            .collect()
            .groupBy(_.getString(0))
            .map { case (m, rs) =>
              m -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
          val nCapped = stats.getOrElse("capped", Map.empty[Int, Long])
          val nCand = stats.getOrElse("cand", Map.empty[Int, Long])
          val nHit = stats.getOrElse("hit", Map.empty[Int, Long])
          val nTrue = stats.getOrElse("true", Map.empty[Int, Long])
            .getOrElse(0, 0L)
          def pm(a: Long, t: Long): Long =
            if (t == 0) 0L else math.floor(1000.0 * a / t).toLong
          val rows = D21Configs.map { case (b, r) =>
            val (c, h) = (nCand.getOrElse(b, 0L), nHit.getOrElse(b, 0L))
            (b, r, c, nTrue, h, pm(h, nTrue), pm(h, c), d21Theory(b, r),
              nCapped.getOrElse(b, 0L))
          }
          rows.toDF("bands", "rows_per_band", "n_candidates", "n_true",
              "n_hit", "recall_milli", "precision_milli", "theory600_milli",
              "n_capped_buckets")
            .orderBy($"bands".desc)
        }
      } finally {
        Option(candRef.get()).foreach(unpersistCheckpointed)
        Option(truthRef.get()).foreach(unpersistCheckpointed)
      }
    } finally {
      sig.unpersist(blocking = false)
      hs.unpersist(blocking = false)
    }
  }

  val d21BandTuningSql: String = {
    val cfgs = D21Configs.map { case (b, r) =>
      val theory = d21Theory(b, r)
      s"""b${b}_bands AS MATERIALIZED (
         |  SELECT doc_id, u.b AS band,
         |    md5(array_to_string(list_transform(sig[u.b*$r+1:u.b*$r+$r],
         |        x -> CAST(x AS VARCHAR)), ',')) AS key
         |  FROM sig, UNNEST(generate_series(0, ${b - 1})) AS u(b)),
         |b${b}_sz AS MATERIALIZED (
         |  SELECT band, key, COUNT(*) AS bn FROM b${b}_bands GROUP BY 1, 2),
         |b${b}_ok AS MATERIALIZED (
         |  SELECT t.doc_id, t.band, t.key
         |  FROM b${b}_bands t JOIN b${b}_sz USING (band, key)
         |  WHERE bn <= $D21BucketCap),
         |b${b}_cand AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |  FROM b${b}_ok a JOIN b${b}_ok b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |b${b}_row AS (
         |  SELECT $b AS bands, $r AS rows_per_band,
         |    (SELECT COUNT(*) FROM b${b}_cand) AS n_candidates,
         |    (SELECT COUNT(*) FROM truth) AS n_true,
         |    (SELECT COUNT(*) FROM b${b}_cand c
         |      JOIN truth t ON c.i = t.i AND c.j = t.j) AS n_hit,
         |    CAST($theory AS BIGINT) AS theory600_milli,
         |    (SELECT COUNT(*) FROM b${b}_sz WHERE bn > $D21BucketCap)
         |      AS n_capped_buckets)""".stripMargin
    }.mkString(",\n")
    val rowsUnion = D21Configs.map { case (b, _) =>
      s"SELECT * FROM b${b}_row"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |gr AS (SELECT doc_id,
       |  list_transform(${sqlTrigrams("l")}, g -> ${sqlMd5Long("g")} % 2147483647) AS gh
       |  FROM toks),
       |sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, 15), s ->
       |      list_min(list_transform(gh, h ->
       |        (((${sqlMd5Long("'A' || CAST(s AS VARCHAR)")} % 2147483646) + 1) * h
       |          + (${sqlMd5Long("'B' || CAST(s AS VARCHAR)")} % 2147483647))
       |        % 2147483647))) AS sig
       |  FROM gr
       |  -- gramless (<3-word) docs: no sig row, matching the Scala
       |  -- aggregation (else 16 NULLs -> md5('') band collisions; r11
       |  -- ADVICE — latent on the declared corpus, fixed at the idiom)
       |  WHERE len(gh) > 0),
       |gsets AS (SELECT doc_id, list_distinct(gh) AS hs FROM gr),
       |gx AS (SELECT doc_id, len(hs) AS c, unnest(hs) AS gh FROM gsets),
       |truth AS MATERIALIZED (
       |  SELECT a.doc_id AS i, b.doc_id AS j
       |  FROM gx a JOIN gx b ON a.gh = b.gh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id, a.c, b.c
       |  HAVING COUNT(*) * 10 >= (a.c + b.c - COUNT(*)) * 6),
       |$cfgs,
       |curve AS ($rowsUnion)
       |SELECT bands, rows_per_band, n_candidates, n_true, n_hit,
       |  CASE WHEN n_true = 0 THEN 0
       |       ELSE ${sqlPermille("n_hit", "n_true")} END AS recall_milli,
       |  CASE WHEN n_candidates = 0 THEN 0
       |       ELSE ${sqlPermille("n_hit", "n_candidates")} END AS precision_milli,
       |  theory600_milli, n_capped_buckets
       |FROM curve
       |ORDER BY bands DESC""".stripMargin
  }

  // --------------------------------------------------------------- d22
  /** Edit-distance self-join (fuzzy near-duplicate prefixes): all
    * same-language document pairs whose first [[D22PrefixLen]]-char
    * prefixes are within Levenshtein distance [[D22MaxDist]] — the
    * typo/OCR/near-rewrite duplicate class that token-set similarity
    * (d3/d9) misses because single-character edits shift every
    * containing shingle. Defined over documents with at least
    * [[D22PrefixLen]] chars so the compared strings have one fixed
    * length (stated in the oracle too).
    *
    * Scale arm — PassJoin partition blocking (Li et al., "PASS-JOIN:
    * a partition-based method for similarity joins", PVLDB 5(3),
    * 2011; public algorithm): split each prefix into K+1 = 9 fixed
    * segments. If ed(a,b) ≤ K, at most K segments of `a` are touched
    * by an edit, so ≥ 1 segment survives VERBATIM in `b`, displaced
    * by at most the net indel balance ≤ K. Each doc therefore emits
    * its 9 fixed chunks (build side) and the ~9×(2K+1) shifted
    * same-length substrings (probe side); an equi-join on
    * (lang, segment, content) yields every qualifying pair with NO
    * quadratic step — candidates are linear in actual content
    * collisions, then one `levenshtein(_, _, K)` verification with
    * early-exit at the threshold. At 100 TB the fan-out is a fixed
    * ×~160 on an 80-byte column (not the document), and the join is
    * hash-partitioned on segment content.
    *
    * Hot-key cap (d11's discipline, ON BY DEFAULT): a boilerplate
    * corpus — thousands of docs opening with the same crawl/template
    * prefix — makes every segment of that template a hot
    * (lang, seg, content) key, and the candidate join quadratic in
    * the cohort size even though the colliding docs are NOT
    * duplicates below the prefix. Keys whose chunk-side document
    * frequency exceeds [[D22KeyCap]] are therefore dropped from BOTH
    * join sides before candidates form (the hot set is Zipf-tiny and
    * broadcasts into left-anti probes; the segment stream takes no
    * extra shuffle), bounding every key's collision list at
    * [[D22KeyCap]] × window, i.e. candidates stay LINEAR in corpus
    * size under any skew. The price is honest and surfaced: pairs
    * discoverable ONLY through a capped key (template-cohort pairs —
    * exact-prefix duplicates, which belong to the d1/d2 ladder
    * upstream) are excluded, and `n_capped_keys` on every output row
    * reports how many keys the cap touched (0 = the cap changed
    * nothing). The oracle mirrors the full blocking + cap CTE-for-CTE
    * so the gate checks the capped semantics exactly.
    *
    * The spec plants a 1-edit pair, a K-edit pair, a K+1-edit
    * non-pair, and a cross-lang twin; forces uncapped
    * blocking-equals-naive on the real corpus (PassJoin
    * completeness); and separately plants a 300-doc template cohort
    * proving candidates stay bounded (not cohort²) while a true
    * 1-edit pair still surfaces through its rare shared segment. */
  private[graft] val D22PrefixLen = 80
  private[operators] val D22MaxDist = 8
  private[operators] val D22KeyCap = 50

  /** (segIdx, start0, len): 8 segments of 9 chars + a final 8. */
  private val D22Segs: Seq[(Int, Int, Int)] =
    (0 to D22MaxDist).map { i =>
      val start = i * 9
      (i, start, math.min(9, D22PrefixLen - start))
    }

  def d22EditDistJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir)
      .filter($"n_chars" >= D22PrefixLen)
      .select($"doc_id", $"lang",
        substring($"text", 1, D22PrefixLen).as("pre"))
      .localCheckpoint() // feeds chunks, probes, and both verify joins
    // eager: the pair list is tiny and must outlive base's release
    try d22From(base).localCheckpoint()
    finally unpersistCheckpointed(base)
  }

  /** [[d22EditDistJoin]]'s core over an arbitrary (doc_id, lang, pre)
    * frame of fixed-length strings — planted-pair specs enter here.
    * `cap` defaults to [[D22KeyCap]]; specs pass `Int.MaxValue` to
    * prove uncapped PassJoin completeness against the naive arm. */
  private[graft] def d22From(
      base: DataFrame, cap: Int = D22KeyCap): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val (cand, hot) = d22CandidatesAndHot(base, cap)
    val nHot = hot.agg(count(lit(1)).as("n_capped_keys"))
    cand
      .join(base.select($"doc_id".as("i"), $"pre".as("pre_i")), Seq("i"))
      .join(base.select($"doc_id".as("j"), $"pre".as("pre_j")), Seq("j"))
      .withColumn("dist",
        levenshtein($"pre_i", $"pre_j", D22MaxDist))
      .filter($"dist" >= 0) // -1 = early-exited past the threshold
      .select($"i", $"j", $"dist")
      .crossJoin(broadcast(nHot)) // one row — the honest cap report
      .orderBy($"i", $"j")
  }

  /** Capped candidate pairs (pre-verification, distinct `(i, j)`) and
    * the hot-key set — exposed so the planted-template-cohort spec can
    * prove the candidate count stays linear under a hot prefix. */
  private[operators] def d22CandidatesAndHot(
      base: DataFrame, cap: Int): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val chunkArr = array(D22Segs.map { case (i, s, l) =>
      struct(lit(i).as("seg"), substring($"pre", s + 1, l).as("sub"))
    }: _*)
    val probeArr = array((for {
      (i, s, l) <- D22Segs
      p <- math.max(0, s - D22MaxDist) to
        math.min(D22PrefixLen - l, s + D22MaxDist)
    } yield struct(lit(i).as("seg"),
      substring($"pre", p + 1, l).as("sub"))): _*)
    val chunks = base.select($"doc_id".as("i"), $"lang",
        explode(chunkArr).as("c"))
      .select($"i", $"lang", $"c.seg", $"c.sub")
    val probes = base.select($"doc_id".as("j"), $"lang",
        explode(probeArr).as("c"))
      .select($"j", $"lang", $"c.seg", $"c.sub")
    // Chunk-side document frequency IS count(*): each doc emits each
    // (seg) exactly once, so no distinct pass is needed. Keys over the
    // cap are dropped from both sides — dropping the chunk side alone
    // already kills the collision (the probe rows find no partner),
    // the probe-side anti just keeps hot probe rows out of the
    // shuffle; the RESULT is identical either way, which is why the
    // oracle caps the chunk side only.
    val hot = chunks.groupBy($"lang", $"seg", $"sub")
      .agg(count(lit(1)).as("df"))
      .filter($"df" > cap).select($"lang", $"seg", $"sub")
    val keptChunks =
      chunks.join(broadcast(hot), Seq("lang", "seg", "sub"), "left_anti")
    val keptProbes =
      probes.join(broadcast(hot), Seq("lang", "seg", "sub"), "left_anti")
    val cand = keptChunks.join(keptProbes, Seq("lang", "seg", "sub"))
      .filter($"i" < $"j")
      .select($"i", $"j").distinct()
    (cand, hot)
  }

  /** Quadratic truth arm (the oracle's plan): same-lang cross pairs,
    * no blocking — the spec forces it identical to [[d22From]]. */
  private[operators] def d22Naive(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val a = base.select($"doc_id".as("i"), $"lang", $"pre".as("pre_i"))
    val b = base.select($"doc_id".as("j"), $"lang", $"pre".as("pre_j"))
    a.join(b, Seq("lang")).filter($"i" < $"j")
      .withColumn("dist", levenshtein($"pre_i", $"pre_j", D22MaxDist))
      .filter($"dist" >= 0)
      .select($"i", $"j", $"dist")
      .orderBy($"i", $"j")
  }

  /** Fixed (seg, start0, len) rows for the oracle's chunk CTE. */
  private val d22SegRows: String =
    D22Segs.map { case (i, s, l) => s"($i, $s, $l)" }.mkString(", ")

  /** Fixed (seg, pos0, len) rows for the oracle's probe CTE — every
    * shifted window each segment may land in under ≤ K net indels. */
  private val d22ProbeRows: String = (for {
    (i, s, l) <- D22Segs
    p <- math.max(0, s - D22MaxDist) to
      math.min(D22PrefixLen - l, s + D22MaxDist)
  } yield s"($i, $p, $l)").mkString(", ")

  /** Mirrors [[d22From]]'s capped blocking CTE-for-CTE (chunk-side df
    * cap, candidate distinct, threshold verify, n_capped_keys report)
    * so the gate checks the CAPPED semantics — the quadratic join is
    * no longer the oracle because the cap is part of the operator's
    * definition (hot-template pairs are d1/d2's job upstream). */
  val d22EditDistJoinSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, substr(text, 1, $D22PrefixLen) AS pre
       |  FROM documents WHERE n_chars >= $D22PrefixLen),
       |segs(seg, s0, len) AS (VALUES $d22SegRows),
       |wins(seg, p0, len) AS (VALUES $d22ProbeRows),
       |chunks AS (
       |  SELECT d.doc_id, d.lang, s.seg, substr(d.pre, s.s0 + 1, s.len) AS sub
       |  FROM d CROSS JOIN segs s),
       |hot AS (
       |  SELECT lang, seg, sub FROM chunks
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) > $D22KeyCap),
       |kept AS (
       |  SELECT c.* FROM chunks c
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |    WHERE h.lang = c.lang AND h.seg = c.seg AND h.sub = c.sub)),
       |probes AS (
       |  SELECT d.doc_id, d.lang, w.seg, substr(d.pre, w.p0 + 1, w.len) AS sub
       |  FROM d CROSS JOIN wins w),
       |cand AS (
       |  SELECT DISTINCT k.doc_id AS i, p.doc_id AS j
       |  FROM kept k JOIN probes p
       |    ON k.lang = p.lang AND k.seg = p.seg AND k.sub = p.sub
       |  WHERE k.doc_id < p.doc_id),
       |nhot AS (SELECT COUNT(*) AS n_capped_keys FROM hot)
       |SELECT c.i, c.j, CAST(levenshtein(a.pre, b.pre) AS INT) AS dist,
       |  nhot.n_capped_keys
       |FROM cand c
       |JOIN d a ON a.doc_id = c.i
       |JOIN d b ON b.doc_id = c.j
       |CROSS JOIN nhot
       |WHERE levenshtein(a.pre, b.pre) <= $D22MaxDist
       |ORDER BY i, j""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact"   -> (d1DedupExact _),
    "d2_dedup_normset" -> (d2DedupNormSet _),
    "d3_ngram_jaccard" -> (d3NgramJaccard _),
    "d4_minhash_lsh"   -> (d4MinhashLsh _),
    "d5_cosine_dup"    -> (d5CosineDup _),
    "d6_simhash"       -> (d6Simhash _),
    "d7_dedup_keepbest" -> (d7DedupKeepBest _),
    "d8_dup_clusters"  -> (d8DupClusters _),
    "d9_minhash_jaccard" -> (d9MinhashJaccard _),
    "d10_containment"  -> (d10Containment _),
    "d11_jaccard_dfcap" -> (d11JaccardDfCap _),
    "d12_cosine_dup_kmeans" -> (d12CosineDupKmeans _),
    "d13_incremental" -> (d13IncrementalDedup _),
    "d14_semdedup_keep" -> (d14SemdedupKeep _),
    "d15_incremental_neardup" -> (d15IncrementalNeardup _),
    "d16_incremental_day2" -> (d16IncrementalDay2 _),
    "d17_neardup_day2" -> (d17NeardupDay2 _),
    "d18_cosine_dup_hotsplit" -> (d18CosineDupHotsplit _),
    "d19_dupspan_coverage" -> (d19DupspanCoverage _),
    "d20_dedup_ladder" -> (d20DedupLadder _),
    "d21_band_tuning"  -> (d21BandTuning _),
    "d22_editdist_join" -> (d22EditDistJoin _),
  )

  def oracles: Map[String, String] = Map(
    "d1_dedup_exact"   -> d1DedupExactSql,
    "d2_dedup_normset" -> d2DedupNormSetSql,
    "d3_ngram_jaccard" -> d3NgramJaccardSql,
    "d4_minhash_lsh"   -> d4MinhashLshSql,
    "d5_cosine_dup"    -> d5CosineDupSql,
    "d6_simhash"       -> d6SimhashSql,
    "d7_dedup_keepbest" -> d7DedupKeepBestSql,
    "d8_dup_clusters"  -> d8DupClustersSql,
    "d9_minhash_jaccard" -> d9MinhashJaccardSql,
    "d10_containment"  -> d10ContainmentSql,
    "d11_jaccard_dfcap" -> d11JaccardDfCapSql,
    "d12_cosine_dup_kmeans" -> d12CosineDupKmeansSql,
    "d13_incremental" -> d13IncrementalDedupSql,
    "d14_semdedup_keep" -> d14SemdedupKeepSql,
    "d15_incremental_neardup" -> d15IncrementalNeardupSql,
    // day-2 forms materialize the corpus side as bucketed standing
    // state; the RESULT is identical to the day-1 query by construction
    "d16_incremental_day2" -> d13IncrementalDedupSql,
    "d17_neardup_day2" -> d15IncrementalNeardupSql,
    "d18_cosine_dup_hotsplit" -> d18CosineDupHotsplitSql,
    "d19_dupspan_coverage" -> d19DupspanCoverageSql,
    "d20_dedup_ladder" -> d20DedupLadderSql,
    "d21_band_tuning"  -> d21BandTuningSql,
    "d22_editdist_join" -> d22EditDistJoinSql,
  )
}
