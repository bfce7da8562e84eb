package graft

import org.apache.spark.sql.types._

/** The PORTABLE OUTPUT-SCHEMA gate — companion to [[OracleDialect]],
  * closing the layer that lint cannot see (r15 verdict items 1–2).
  *
  * Round 15's two red driver-gate entries (e30, e31) were queries whose
  * every oracle TOKEN was proven portable by driver-green siblings; the
  * one feature unique to the red pair — stable across two completely
  * disjoint compute encodings — was DECIMAL(38,0) columns in the RESULT
  * schema. The driver's oracle harness normalizes result VALUES before
  * hashing, and wide-decimal normalization (decimal → float/Decimal
  * repr in duckdb/pandas/pyarrow) is version-dependent in a way the 209
  * green queries' types are not. The green surface defines, empirically,
  * the result-type set known to hash identically across harness builds:
  * boolean, int32/int64, double, string, date, timestamp, and arrays
  * thereof. This object codifies that set; [[OutputSchemaSpec]] runs
  * [[violations]] over every `SparkEntry.queries` result schema and
  * fails the build on anything outside it.
  *
  * Wide decimals remain first-class INTERNALLY — q62/e30/e31 accumulate
  * in decimal(38,0)/HUGEINT to dodge int64 overflow — but must be cast
  * to BIGINT/DOUBLE before the result surface. Extending this set is
  * allowed, but must be a conscious diff of this file reviewed against
  * "does the driver harness hash this type stably across builds?",
  * never an accident inside an operator.
  */
object OutputSchema {

  /** Leaf types proven value-hash-portable by the 209 driver-green r15
    * queries. DecimalType is DELIBERATELY absent — it is the type that
    * made e30/e31 driver-red in r14 AND r15 (the only two queries that
    * surfaced it, under two unrelated encodings). */
  private def leafOk(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | DoubleType |
         StringType | DateType | TimestampType => true
    // the testdata's o_orderdate parquet type, surfaced unchanged by
    // driver-green h03/h18/q28 — proven by three green rounds
    case TimestampNTZType => true
    case _ => false
  }

  private def typeOk(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => typeOk(et)
    case other            => leafOk(other)
  }

  /** Every column of `schema` whose type falls outside the proven set,
    * as `col: type` — empty ⟺ the result surface stays portable. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !typeOk(f.dataType) => s"${f.name}: ${f.dataType.sql}"
    }
}
