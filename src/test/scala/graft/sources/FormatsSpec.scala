package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.{SharedSpark, Tables}

/** File-format source/sink round-trips: CSV, JSON, ORC (Parquet is the
  * native testdata format and is exercised everywhere else). Each format
  * must preserve every row and column of a real table bit-exactly when
  * read back with the original schema — doubles rely on shortest-repr
  * round-tripping, timestamps on the writer/reader format agreeing. */
class FormatsSpec extends AnyFunSuite {
  import SharedSpark._

  private def roundTrip(format: String): Unit = {
    val orig = Tables(spark, sf, "lineitem")
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
    val w = orig.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(dir)
    val r = spark.read.format(format).schema(orig.schema)
    val back = (if (format == "csv") r.option("header", "true") else r).load(dir)
    assert(back.schema == orig.schema, s"$format schema drift")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      s"$format round-trip lost or mutated rows")
  }

  test("csv round-trips lineitem exactly")(roundTrip("csv"))
  test("json round-trips lineitem exactly")(roundTrip("json"))
  test("orc round-trips lineitem exactly")(roundTrip("orc"))

  test("csv reader infers a usable schema without one supplied") {
    val orig = Tables(spark, sf, "lineitem")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_infer").toString
    orig.write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(inferred.count() == orig.count())
    assert(inferred.columns.toSeq == orig.columns.toSeq)
  }
}
