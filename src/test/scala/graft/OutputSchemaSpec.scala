package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Gate: every declared query's RESULT schema stays inside the
  * driver-proven portable type set ([[OutputSchema]]) — the r15 ship-
  * blocker class (DECIMAL(38,0) outputs) can never recur silently.
  * Schema inspection is plan-only (no action), so this pass is cheap
  * even over all 212 queries. */
class OutputSchemaSpec extends AnyFunSuite {
  import SharedSpark._

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name output schema is portable") {
      val bad = OutputSchema.violations(fn(spark, sf).schema)
      assert(bad.isEmpty,
        s"non-portable output columns: ${bad.mkString("; ")} — cast to " +
          "the proven set (see OutputSchema) before the result surface")
    }
  }

  test("a planted decimal output column is flagged (red path)") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("id", "v")
      .select($"id", sum($"v".cast("decimal(38,0)")).over().as("tot"))
    val bad = OutputSchema.violations(df.schema)
    assert(bad.exists(_.startsWith("tot:")), s"expected tot flagged: $bad")
  }

  test("a planted array-of-decimal output column is flagged (red path)") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
      .select(array(lit(BigDecimal(1)).cast("decimal(38,0)")).as("xs"))
    assert(OutputSchema.violations(df.schema).exists(_.startsWith("xs:")))
  }

  test("binary and struct outputs are also outside the proven set") {
    import spark.implicits._
    val df = Seq((Array[Byte](1), 2)).toDF("b", "i")
      .select($"b", struct($"i").as("s"))
    val bad = OutputSchema.violations(df.schema)
    assert(bad.exists(_.startsWith("b:")) && bad.exists(_.startsWith("s:")))
  }
}
