package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DoubleSortKey, NgramHash60, PolyHash, TrigramHash60, VecDot}

/** Session-extension entry point: registers every native graft expression
  * at session build time, the idiomatic way to ship custom Catalyst
  * expressions to a cluster —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on a builder). Injected
  * functions live in the session's base registry, so they survive
  * `newSession()` and need no per-query `register(spark)` calls — those
  * remain for ad-hoc sessions and are idempotent either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
          "", "", "", "", "", "", "built-in"),
        builder))
    }
}

object GraftExtensions {
  /** (name, usage, builder) for every native expression. */
  private[graft] val functions: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("trigram_hashes",
        "trigram_hashes(str) - distinct word-trigram 60-bit md5 hashes",
        exprs => TrigramHash60(exprs.head)),
      ("ngram_hashes",
        "ngram_hashes(str, n) - distinct word n-gram 60-bit md5 hashes",
        exprs => NgramHash60(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())),
      ("polyhash",
        "polyhash(str) - rolling polynomial hash mod 2^31-1",
        exprs => PolyHash(exprs.head)),
      ("vec_dot",
        "vec_dot(a, b) - sequential left-fold dot product of two double arrays",
        exprs => VecDot(exprs(0), exprs(1))),
      ("double_sort_key",
        "double_sort_key(d) - order-preserving long projection of a double",
        exprs => DoubleSortKey(exprs.head)))
}
