package graft

import org.scalatest.funsuite.AnyFunSuite

/** The portable-oracle-dialect gate (r15 verdict item 2): every DuckDB
  * oracle must stay inside the dialect the 209 driver-hash-green r14
  * oracles proved version-stable. Runs on the STATIC query surface —
  * no SparkSession needed, so it is effectively free in `sbt test`. */
class OracleDialectSpec extends AnyFunSuite {

  test("every oracle in SparkEntry.oracleSql stays inside the " +
      "proven-portable dialect") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (n, sql) => n -> OracleDialect.violations(sql) }
      .filter(_._2.nonEmpty)
    assert(bad.isEmpty, "oracles outside the proven dialect — either " +
      "rewrite in proven constructs or consciously extend " +
      s"OracleDialect with a portability argument:\n" +
      bad.map { case (n, v) => s"  $n: ${v.mkString(", ")}" }
        .mkString("\n"))
  }

  test("the lint itself rejects the r14 divergence tokens — `<<` and " +
      "round() on doubles") {
    // the exact construct that split the driver's DuckDB build from
    // the local 1.0.0 pin in e30's first encoding (least() itself is
    // proven portable — driver-green q33/q42 use it — the shift isn't)
    val e30r14 =
      "SELECT (cents * 1000000) // " +
        "(CAST(1 AS BIGINT) << CAST(least(k, 62) AS INT)) AS dm FROM e"
    val v = OracleDialect.violations(e30r14)
    assert(v == Seq("op:<<"), s"expected exactly the shift flagged: $v")
    assert(OracleDialect.violations("SELECT round(x * 100) FROM t")
      .contains("func:round"))
  }

  test("tokenizer hygiene: comments and string literals never " +
      "contribute tokens; CTE and derived-table names are local") {
    assert(OracleDialect.violations(
      "SELECT a -- power(2, k) << banned in comment\nFROM t").isEmpty)
    assert(OracleDialect.violations(
      "SELECT 'power(2) << !!' FROM t").isEmpty)
    assert(OracleDialect.violations(
      "WITH zz9(k, pw) AS (VALUES (0, 1)) SELECT k FROM zz9").isEmpty)
    assert(OracleDialect.violations(
      "SELECT * FROM (SELECT 1) qq7(x)").isEmpty)
    // an undeclared identifier-before-( IS flagged
    assert(OracleDialect.violations("SELECT power(2, k) FROM t") ==
      Seq("func:power"))
  }

  test("one-pass stripper: `--` inside a literal is data, `'` inside " +
      "a comment is commentary (r15 ADVICE)") {
    // comments-first regex stripping truncated the line at the quoted
    // `--`, swallowing the closing quote and corrupting the scan —
    // here the banned power( AFTER the literal must still be seen
    assert(OracleDialect.violations(
      "SELECT 'a--b', power(2, k) FROM t") == Seq("func:power"))
    // and a banned token INSIDE the literal stays invisible
    assert(OracleDialect.violations(
      "SELECT 'a--b << power(9)' FROM t").isEmpty)
    // literals-first stripping would open a phantom string at the
    // apostrophe inside the comment and hide the next line's tokens
    assert(OracleDialect.violations(
      "SELECT a -- don't\n, power(2, k) FROM t") == Seq("func:power"))
    // escaped '' inside a literal does not close it early
    assert(OracleDialect.violations(
      "SELECT 'it''s -- fine << power(1)' FROM t").isEmpty)
  }
}
