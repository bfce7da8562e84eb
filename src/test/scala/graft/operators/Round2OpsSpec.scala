package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SharedSpark, SparkEntry, Tables}

/** Semantic invariants for the round-2 operator batch (q22-q27, e8, e9,
  * d7, t7). Value-level correctness is the DuckDB oracle gate; these
  * specs assert the structural properties that a hash-equal oracle
  * wouldn't localize when broken. */
class Round2OpsSpec extends AnyFunSuite {
  import SharedSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q22: grand-total row equals the sum of per-status subtotals") {
    val rows = q("q22_grouping_sets").collect()
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1)
    val statusRows = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    assert(statusRows.map(_.getLong(4)).sum == grand.head.getLong(4))
    // grouping indicator: key is null exactly when its indicator is 1
    rows.foreach { r =>
      assert(r.isNullAt(0) == (r.getInt(2) == 1))
      assert(r.isNullAt(1) == (r.getInt(3) == 1))
    }
  }

  test("q23: EXISTS/NOT EXISTS equals the semi/anti join formulation") {
    import spark.implicits._
    val cust = Tables(spark, sf, "customer")
    val orders = Tables(spark, sf, "orders")
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    val f = orders.filter($"o_orderstatus" === "F")
    val expected = cust
      .join(urgent, $"c_custkey" === urgent("o_custkey"), "left_semi")
      .join(f, $"c_custkey" === f("o_custkey"), "left_anti")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val got = q("q23_exists_subquery").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("q23: plan decorrelates to joins (no per-row subquery)") {
    val p = q("q23_exists_subquery").queryExecution.optimizedPlan.toString
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
  }

  test("q24: ordinality is 1-based and dense per part") {
    val rows = q("q24_lateral_explode").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
    val nParts = Tables(spark, sf, "part")
      .filter(col("p_partkey") <= 200).count()
    assert(rows.map(_.getLong(0)).distinct.length == nParts)
  }

  test("q25: percentiles are monotone and bracketed by min/max") {
    q("q25_percentiles").collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("exactPercentiles matches the builtin percentile to 1 ulp-ish") {
    import spark.implicits._
    val li = Tables(spark, sf, "lineitem")
    val got = PercentileOps
      .exactPercentiles(li, "l_returnflag", "l_extendedprice",
        Seq(0.0, 0.25, 0.5, 0.77, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val exp = li.groupBy($"l_returnflag")
      .agg(percentile($"l_extendedprice",
        array(lit(0.0), lit(0.25), lit(0.5), lit(0.77), lit(1.0))).as("ps"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(Seq(0.0, 0.25, 0.5, 0.77, 1.0))
          .map { case (v, f) => (r.getString(0), f) -> v }
      }.toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - exp(k)) <= math.ulp(exp(k)) * 4,
        s"$k: sort-based $v vs builtin ${exp(k)}")
    }
  }

  test("exactPercentiles handles single-row groups and extreme fractions") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0), ("b", 3.0))
      .toDF("k", "v")
    val got = PercentileOps.exactPercentiles(df, "k", "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(got(("a", 0.0)) == 10.0 && got(("a", 0.5)) == 10.0 &&
           got(("a", 1.0)) == 10.0)
    assert(got(("b", 0.0)) == 1.0 && got(("b", 0.5)) == 2.0 &&
           got(("b", 1.0)) == 3.0)
  }

  test("q26: n_segments equals the CSV segment count and is sorted") {
    q("q26_collect_sort").collect().foreach { r =>
      val segs = r.getString(1).split(",").toSeq
      assert(segs.length == r.getLong(2))
      assert(segs == segs.sorted)
    }
  }

  test("q27: materials are single trailing words of some p_type") {
    import spark.implicits._
    val types = Tables(spark, sf, "part")
      .select($"p_type").distinct().collect()
      .map(_.getString(0).split(" ").last).toSet
    val mats = q("q27_regex").collect().map(_.getString(0)).toSet
    assert(mats.subsetOf(types))
  }

  test("e8: per-user spine is gap-free and preserves total event counts") {
    import spark.implicits._
    val rows = q("e8_gapfill").collect()
    // dense spine: row count per user == hours between its min and max hour
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val hrs = rs.map(_.getTimestamp(1).getTime).sorted
      assert((hrs.last - hrs.head) / 3600000 + 1 == rs.length)
    }
    // zero-fill must not invent or lose events
    val total = rows.map(_.getLong(2)).sum
    val raw = Tables(spark, sf, "events").filter($"user_id" < 8).count()
    assert(total == raw)
  }

  test("e9: min_by/max_by matches the window first/last formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val expected = Tables(spark, sf, "events").filter($"user_id" < 100)
      .select($"user_id",
        first($"event_type").over(w).as("first_type"),
        last($"event_type").over(w).as("last_type"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val got = q("e9_minmax_by").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(got == expected)
  }

  test("d7: keeper is the longest member (lowest doc_id on ties) of its group") {
    import spark.implicits._
    val sig = md5(concat_ws(" ",
      array_sort(array_distinct(split($"text", " ")))).cast("binary"))
    val members = Tables(spark, sf, "documents")
      .select($"doc_id", $"n_chars", sig.as("sig")).collect()
      .groupBy(_.getString(2))
    q("d7_dedup_keepbest").collect().foreach { r =>
      val (keeper, chars, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val group = members.values.find(_.exists(_.getLong(0) == keeper)).get
      assert(group.length == n && n >= 2)
      val best = group.sortBy(m => (-m.getLong(1), m.getLong(0))).head
      assert(best.getLong(0) == keeper && best.getLong(1) == chars)
    }
  }

  test("t7: ranks are dense 1..20 with non-increasing counts") {
    val rows = q("t7_zipf_terms").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20))
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("t7: plans a TakeOrderedAndProject, not a global sort") {
    val p = q("t7_zipf_terms").queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
