package graft

/** The PORTABLE ORACLE DIALECT lint — r15 verdict item 2.
  *
  * Round 14's one red driver-gate entry (e30) was a query whose Spark
  * output was provably correct: its DuckDB oracle SQL evaluated
  * differently on the driver's DuckDB build than on the local 1.0.0
  * pin, and the constructs that set that one oracle apart from the
  * other 210 — the `<<` shift operator, `round()` on a DOUBLE,
  * `least()` — were exactly the ones outside the dialect every proven
  * oracle shares. The 209 driver-hash-green oracles define, empirically,
  * the DuckDB surface known to evaluate identically across the builds
  * this project meets; this object codifies that surface so the next
  * e30 cannot ship silently.
  *
  * [[OracleDialectSpec]] runs [[violations]] over every entry of
  * `SparkEntry.oracleSql` and fails the build on any token outside the
  * allowlists. Extending the dialect is allowed — but it must be a
  * CONSCIOUS diff of this file, reviewed against the portability
  * question ("is this construct version-stable across DuckDB builds?"),
  * never an accident inside a query string.
  *
  * Tokenizer contract (deterministic, deliberately simple): strip
  * `--` line comments and `'…'` string literals in one context-aware
  * pass (a `--` inside a literal is data, a `'` inside a comment is
  * commentary — sequential regex passes get one of the two wrong in
  * either order); then a FUNCTION
  * token is any identifier directly followed by `(` that is not a CTE
  * name or a `) alias(` derived-table alias of the same query; an
  * OPERATOR token is any maximal run of `+ - * / % < > = ! | & ^ ~ : #
  * @`. SQL keywords that can precede `(` (CASE arms, OVER, VALUES, …)
  * live in the function allowlist — the lint's job is rejecting NEW
  * surface, not perfect grammar. Derived-table/UNNEST aliases
  * (`) t(x)`, `) AS u(x)`) are recognized as query-local, same as
  * CTE names.
  */
object OracleDialect {

  /** Identifier-before-`(` tokens proven portable by the 209
    * driver-hash-green r14 oracles (minus `round`, which the r15
    * rewrite removed from the surface: it appeared only in the one
    * red oracle and in q62's same-hazard site). */
  val AllowedFunctions: Set[String] = Set(
    // aggregate / analytic
    "arg_max", "arg_min", "array_agg", "avg", "count", "lag",
    "last_value", "lead", "max", "min", "ntile", "quantile_cont",
    "rank", "row_number", "string_agg", "sum",
    // scalar: math / bits
    "abs", "bin", "bit_count", "ceil", "floor", "sqrt", "xor",
    // scalar: string / hash
    "ascii", "concat", "hex", "len", "length", "levenshtein", "lpad",
    "md5", "octet_length", "regexp_extract", "regexp_extract_all",
    "regexp_replace", "replace", "sha256", "string_split", "substr",
    "upper",
    // scalar: date / time
    "date_diff", "date_trunc", "epoch_us", "month", "quarter", "year",
    // lists / json
    "array_to_string", "json_extract_string", "list_concat", "list_contains",
    "list_distinct", "list_filter", "list_intersect", "list_max",
    "list_min", "list_reduce", "list_slice", "list_sort",
    "list_transform", "list_zip", "unnest",
    // table functions / conversion / conditionals
    // `least` IS proven (driver-green q33/q42/p6/p12 use LEAST);
    // e30's red arose with `<<` — `round` stays banned (half-even vs
    // half-up vs shortest-repr across builds; floor(x+0.5) instead)
    "cast", "coalesce", "generate_series", "greatest", "least", "decimal",
    // SQL keywords the simple tokenizer sees before `(`
    "and", "as", "cube", "else", "except", "exists", "from",
    "grouping", "in", "join", "materialized", "not", "nulls", "or",
    "over", "range", "rollup", "select", "sets", "then", "using",
    "values", "when", "where",
    // DuckDB list() aggregate + q32's month arithmetic
    "list", "months",
  )

  /** Operator runs proven portable by the r14 driver-green oracles.
    * `<<` is DELIBERATELY absent — it is the token that diverged
    * between DuckDB builds in r14 (d6_simhash proves `>>` and `&`;
    * nothing green ever used `<<`). */
  val AllowedOperators: Set[String] = Set(
    "+", "-", "*", "/", "//", "%", "<", "<=", "=", ">=", ">", "<>",
    "!=", "||", "->", ">>", "&", ":", // ":" = DuckDB list-slice l[a:b]
  )

  private val CteName =
    "(?is)(?:\\bwith\\b|,)\\s*([A-Za-z_]\\w*)\\s*(?:\\([^)]*\\))?\\s+as\\s*\\(".r
  private val DerivedAlias =
    "(?i)\\)\\s*(?:as\\s+)?([A-Za-z_]\\w*)\\s*\\(".r
  private val FuncTok = "\\b([A-Za-z_]\\w*)\\s*\\(".r
  private val OpTok = "[+\\-*/%<>=!|&^~:#@]+".r

  /** Every function/operator token of `sql` outside the allowlists,
    * tagged `func:`/`op:` — empty ⟺ the oracle stays inside the
    * proven-portable dialect. */
  /** One-pass literal+comment stripper (r15 ADVICE): sequential regex
    * passes get this wrong in BOTH orders — comments-first truncates a
    * line at a `--` inside a quoted literal (swallowing its closing
    * quote), literals-first opens a phantom string at a `'` inside a
    * comment. A character scan tracks which context it is in, so each
    * marker only counts outside the other construct. `''` escapes are
    * honored; literals become `''` so operators stay delimited. */
  private[graft] def stripLiteralsAndComments(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { // string literal: skip to its true close
        out.append("''")
        i += 1
        var open = true
        while (i < n && open) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 // '' escape
            else { i += 1; open = false }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1 // comment to EOL
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  def violations(sql: String): Seq[String] = {
    val s = stripLiteralsAndComments(sql)
    val local = CteName.findAllMatchIn(s).map(_.group(1).toLowerCase).toSet ++
      DerivedAlias.findAllMatchIn(s).map(_.group(1).toLowerCase).toSet
    val badFuncs = FuncTok.findAllMatchIn(s).map(_.group(1).toLowerCase)
      .filterNot(local).filterNot(AllowedFunctions).map("func:" + _)
    val badOps = OpTok.findAllMatchIn(s).map(_.group(0))
      .filterNot(AllowedOperators).map("op:" + _)
    (badFuncs ++ badOps).toSeq.distinct.sorted
  }
}
