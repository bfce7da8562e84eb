package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001 and produce a sane result.
  * (Value-level correctness is the DuckDB oracle gate — scripts/
  * oracle_check.py; these specs guard execution + shape + spot values.) */
class OperatorSmokeSpec extends AnyFunSuite {
  import SharedSpark._

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("every query with an oracle is declared, and vice versa") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    // rows-only queries are allowed but must be deliberate:
    assert((qs -- os) == Set("q15_approx_sketch"),
      s"unexpected rows-only: ${qs -- os}")
  }

  test("q15 HLL estimate is within the configured 2% rsd (loose 10% bound)") {
    import org.apache.spark.sql.functions.countDistinct
    val rows = SparkEntry.queries("q15_approx_sketch")(spark, sf).collect()
    val exactByPrio = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_customers"))
      val exact = exactByPrio(r.getString(r.fieldIndex("o_orderpriority")))
      assert(math.abs(approx - exact).toDouble / exact <= 0.10,
        s"HLL estimate $approx too far from exact $exact")
    }
  }

  test("q33 KMV estimate is within 3 standard errors of the exact count") {
    import org.apache.spark.sql.functions.countDistinct
    val rows = SparkEntry.queries("q33_kmv_sketch")(spark, sf).collect()
    val exactByFlag = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val est = r.getDouble(r.fieldIndex("est_distinct"))
      val exact = exactByFlag(r.getString(r.fieldIndex("l_returnflag")))
      // bottom-k relative standard error ≈ 1/sqrt(k-2) ≈ 12.7% at k=64
      assert(math.abs(est - exact) / exact <= 3.0 / math.sqrt(62.0),
        s"KMV estimate $est too far from exact $exact")
    }
  }

  test("s3 IVF recall@10 against exact s1 beats its scan fraction") {
    def pairs(name: String) =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("s1_knn_brute")
    val ivf = pairs("s3_knn_ivf")
    val recall = (exact & ivf).size.toDouble / exact.size
    // nprobe=4 of 10 random cells scans ~40% of vectors; a working IVF
    // must recall at least that fraction (i.e. beat random subsetting)
    assert(recall >= 0.4, s"IVF recall@10 = $recall")
  }

  test("q13 SQL-frontend text parses and aggregates in Spark SQL") {
    val rows = SparkEntry.queries("q13_sql_frontend")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 10)) // HAVING n_orders >= 10
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates to the 6 (returnflag, linestatus) groups") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(rows.head.fieldIndex("count_order"))).sum == 6000L)
  }

  test("q4 top-k is ordered descending by o_totalprice") {
    val prices = SparkEntry.queries("q4_topk")(spark, sf)
      .collect().map(_.getDouble(2))
    assert(prices.length == 100)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("s1 knn returns exactly k neighbors per query vector") {
    val rows = SparkEntry.queries("s1_knn_brute")(spark, sf).collect()
    val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQ.size == 10 && perQ.values.forall(_ == 10))
  }

  test("d1 exact dedup keeps every distinct text once") {
    val n = SparkEntry.queries("d1_dedup_exact")(spark, sf).count()
    val docs = Tables(spark, sf, "documents").count()
    assert(n <= docs && n > 0)
  }
}
