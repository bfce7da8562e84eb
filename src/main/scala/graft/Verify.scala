package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    // a typo'd query name must fail loudly, not silently shrink the run
    // (and with it the driver's correctness gate)
    val unknown = only.toSet -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(
        s"[verify] unknown query names: ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only.toSet).toMap
    // First-row value dump (r15 verdict item 3): when a driver-side
    // hash disagrees with the local gate, this pins WHICH column and
    // WHICH representation diverged — data, not re-theorizing. Values
    // are read back from the written parquet (coalesce(1) preserves the
    // query's ORDER BY), rendered with their runtime class so a
    // BigDecimal-vs-Long or repr-level drift is visible in the diff.
    val firstRows = scala.collection.mutable.TreeMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val back = spark.read.parquet(s"$outDir/$name")
        firstRows(name) = back.limit(1).collect().headOption match {
          case None => "<empty>"
          case Some(r) => back.columns.zipWithIndex.map { case (c, i) =>
            val v = r.get(i)
            val cls = if (v == null) "null" else v.getClass.getSimpleName
            s"$c=${String.valueOf(v)}:$cls"
          }.mkString("|")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracleSelected =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.view.filterKeys(only.toSet).toMap
    val json = oracleSelected
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the full attempted-query list, so the checker can turn a CRASHED
    // query (no result dir, swallowed to stderr above) into an explicit
    // fail row — without this, a rows-only query that dies is silently
    // absent and the summary under-counts instead of failing
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      selected.keySet.toSeq.sorted.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/first_rows.json"),
      firstRows.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
