package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H 1–22 through the SQL FRONTEND (`spark.sql` over registered
  * views), schema-adapted to the driver testdata — the parser/analyzer/
  * optimizer breadth test the DataFrame surface bypasses. The reference
  * has no SQL frontend at all (SURVEY.md §2.2: SQL is generated, never
  * parsed — `QueryBuilder.java:46-66`), so this whole family is engine
  * capability beyond the reference, and q13 proved the path with ONE
  * query; these 22 exercise it with the standard analytics battery:
  * correlated scalar subqueries (h02/h17/h20), EXISTS/NOT EXISTS
  * (h04/h21/h22), views-as-CTEs (h15), left-join histograms (h13),
  * disjunctive range predicates (h19), NOT IN (h16), multi-way
  * star joins (h05/h07/h08/h09), and every aggregate shape in between.
  *
  * EVERY query is ONE SQL text shared by Spark and the DuckDB oracle
  * (q13's shared-dialect discipline) — verbatim, except that the five
  * ps-consuming queries ([[psBacked]]) execute their text against the
  * STANDING derived-partsupp table while the oracle text keeps the
  * self-contained CTE (see [[runPs]]). Money arithmetic goes
  * through exact DECIMAL casts of the raw columns and surfaces as
  * DOUBLE via a STRING cast (both engines round-trip identically;
  * direct decimal→double double-rounds in DuckDB — SURVEY §9.3), AVG
  * over doubles is rewritten as exact-decimal SUM / COUNT, and every
  * query ends in a total ORDER BY (aggregate sort keys get key
  * tiebreakers — TPC-H tolerates ties, a hash gate does not).
  *
  * Schema adaptations (the testdata is TPC-H-ish, not TPC-H; each
  * substitution keeps the query's STRUCTURE — the join graph, the
  * subquery shape, the predicate class — and only re-targets columns):
  *  - no `partsupp` table → derived CTE `ps`: one row per distinct
  *    (l_partkey, l_suppkey) with ps_availqty = exact quantity sum and
  *    ps_supplycost = MIN extended price (deterministic, decimal-exact).
  *  - no l_commitdate/l_receiptdate → "late" := l_shipdate more than
  *    N days after o_orderdate (same role: a per-line lateness flag).
  *  - no l_shipmode → derived `CASE l_linenumber % 3` categorical;
  *    no p_container/p_mfgr/o_shippriority/comments/phones → nearest
  *    existing column (o_orderpriority, p_size bands, c_nationkey
  *    country code), noted per query.
  */
object TpchSql {

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    spark.sql(sql)
  }

  /** The five ps-consuming queries run against a STANDING derived-
    * partsupp table instead of re-aggregating lineitem per query
    * (round 11). Rationale at 100×: the `ps` CTE is a full corpus
    * aggregate — Spark inlines CTEs, so h02 executed it twice (outer +
    * scalar subquery), h11 twice, h20 once, … every run; as warehouse
    * state maintained like q41's IVM aggregate it is built once,
    * bucketed by ps_partkey (32), and every consumer starts from a
    * |part×supplier|-sized scan with hash-partitioning already in
    * place. The ORACLE text keeps the self-contained CTE (the oracle
    * must define `ps` from the raw tables); equality of the two is
    * exactly the maintained-equals-derived contract the correctness
    * gate certifies (q40's discipline). Measured at sf0.1 (min-of-3,
    * same harness for both variants — registerViews inside the timer):
    * h02 1.86 → 1.59 s, h09 2.15 → 1.54 s, h11 2.34 → 1.67 s,
    * h16 1.70 → 1.60 s, h20 1.48 → 1.23 s. The wins are largest where
    * the CTE was referenced twice (h02/h11 outer + scalar subquery;
    * h09's agg is corpus-wide); at 100× the gap is the whole lineitem
    * aggregation per reference, not the ~0.5 s it costs here.
    *
    * Measured negative result, recorded (r10 verdict asked): h21's
    * thrice-referenced `ll` CTE persisted via cache + temp view loses
    * at sf0.1 — 1.34 s inlined vs 1.54–1.61 s persisted (min-of-3) —
    * the columnar cache write outweighs the saved re-scans at this
    * size, so h21 stays inlined; at 100× `ll` is the same standing-
    * table candidate ps is, not a per-query cache. */
  private def runPs(body: String)(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerViews(spark, dir)
    val t = graft.sources.LayoutOps.stateTable("graft_state_tpch_ps_v1", dir)
    if (!spark.catalog.tableExists(t))
      graft.sources.LayoutOps.writeBucketed(
        spark.sql(s"WITH $PsCte SELECT * FROM ps"), t, "ps_partkey",
        graft.sources.LayoutOps.stateBuckets(spark))
    spark.table(t).createOrReplaceTempView("ps")
    spark.sql(body)
  }

  /** Shared text minus its leading ps CTE — what [[runPs]] executes
    * against the standing-table view. Throws if the text does not
    * carry the CTE (a refactor guard). */
  private[operators] def bodyOf(text: String): String = {
    val prefix = s"WITH $PsCte\n"
    require(text.startsWith(prefix), "expected a leading ps CTE")
    text.stripPrefix(prefix)
  }

  /** Queries whose Spark plan starts from the standing ps table. */
  private[operators] val psBacked: Set[String] = Set(
    "h02_min_cost_supplier", "h09_profit_by_nation", "h11_important_stock",
    "h16_supplier_counts", "h20_part_promotion")

  /** Exact decimal revenue term both engines agree on bit-for-bit. */
  private val Rev =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  /** Derived partsupp (adaptation: no partsupp table in the testdata). */
  private val PsCte =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS ps_availqty,
      |         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // Q1 — pricing summary report (verbatim; date param inlined).
  val h01: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS sum_qty,
       |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS sum_base_price,
       |  CAST(CAST(SUM($Rev) AS STRING) AS DOUBLE) AS sum_disc_price,
       |  CAST(CAST(SUM($Rev * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS sum_charge,
       |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_price,
       |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,8))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= DATE '2001-09-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // Q2 — minimum-cost supplier (adaptations: derived ps; p_type LIKE
  // keeps the LIKE predicate; no p_mfgr/addresses in the output).
  val h02: String =
    s"""WITH $PsCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       |  CAST(CAST(ps_supplycost AS STRING) AS DOUBLE) AS supplycost
       |FROM part, ps, supplier, nation, region
       |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |  AND p_size = 15 AND p_type LIKE '%AND%'
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT MIN(ps_supplycost)
       |    FROM ps, supplier, nation, region
       |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |      AND r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  // Q3 — shipping priority (adaptation: o_orderpriority for the missing
  // o_shippriority; revenue tiebroken by key for a deterministic top-10).
  val h03: String =
    s"""SELECT l_orderkey,
       |  CAST(CAST(SUM($Rev) AS STRING) AS DOUBLE) AS revenue,
       |  o_orderdate, o_orderpriority
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING'
       |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate, l_orderkey
       |LIMIT 10""".stripMargin

  // Q4 — order priority checking (adaptation: "late line" := shipped
  // more than 75 days after the order date, standing in for
  // commitdate < receiptdate; the correlated EXISTS is the point).
  val h04: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= DATE '1997-07-01' AND o_orderdate < DATE '1997-10-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // Q5 — local supplier volume (verbatim structure incl. the
  // c_nationkey = s_nationkey "local" constraint).
  val h05: String =
    s"""SELECT n_name,
       |  CAST(CAST(SUM($Rev) AS STRING) AS DOUBLE) AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // Q6 — forecasting revenue change (verbatim; the predicate constants
  // compare against the SAME parquet doubles in both engines).
  val h06: String =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS STRING) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // Q7 — volume shipping between two nations (verbatim structure).
  val h07: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(CAST(SUM(volume) AS STRING) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS INT) AS l_year,
       |    $Rev AS volume
       |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
       |    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate <= DATE '1997-12-31'
       |  ) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // Q8 — national market share (verbatim structure; p_type filter on
  // the testdata's type domain).
  val h08: String =
    s"""SELECT o_year,
       |  CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
       |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS STRING) AS DOUBLE)
       |  / CAST(CAST(SUM(volume) AS STRING) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |    $Rev AS volume, n2.n_name AS nation
       |  FROM part, supplier, lineitem, orders, customer,
       |       nation n1, nation n2, region
       |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
       |    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate <= DATE '1997-12-31'
       |    AND p_type = 'ECONOMY'
       |  ) all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  // Q9 — product type profit (adaptations: derived ps supplies
  // ps_supplycost; p_name LIKE keeps the LIKE).
  val h09: String =
    s"""WITH $PsCte
       |SELECT nation, o_year,
       |  CAST(CAST(SUM(amount) AS STRING) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |    $Rev - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)) AS amount
       |  FROM part, supplier, lineitem, ps, orders, nation
       |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
       |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |    AND p_name LIKE '%widget%'
       |  ) profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  // Q10 — returned item reporting (adaptation: no address/phone/comment
  // columns; revenue tiebroken by key).
  val h10: String =
    s"""SELECT c_custkey, c_name,
       |  CAST(CAST(SUM($Rev) AS STRING) AS DOUBLE) AS revenue,
       |  c_acctbal, n_name
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= DATE '1997-10-01' AND o_orderdate < DATE '1998-01-01'
       |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // Q11 — important stock identification (adaptations: derived ps; the
  // fraction-of-total threshold scalar subquery is the point and is
  // kept, but made SCALE-FREE: TPC-H's fixed 0.0001/SF fraction is a
  // per-SF parameter this shared text cannot carry, so the cut is
  // "worth more than 2× the average part" — same shape at every SF.
  // Both comparison sides go decimal→STRING→DOUBLE (the one decimal→
  // double path the two engines round identically — SURVEY §9.3).
  val h11: String =
    s"""WITH $PsCte
       |SELECT ps_partkey,
       |  CAST(CAST(SUM(ps_supplycost * ps_availqty) AS STRING) AS DOUBLE) AS value
       |FROM ps, supplier, nation
       |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND n_name = 'NATION_3'
       |GROUP BY ps_partkey
       |HAVING CAST(CAST(SUM(ps_supplycost * ps_availqty) AS STRING) AS DOUBLE) > (
       |  SELECT 2.0 * CAST(CAST(SUM(ps_supplycost * ps_availqty) AS STRING) AS DOUBLE)
       |         / COUNT(DISTINCT ps_partkey)
       |  FROM ps, supplier, nation
       |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_name = 'NATION_3')
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // Q12 — shipping modes and order priority (adaptation: derived
  // shipmode categorical from l_linenumber; ship-window on l_shipdate).
  val h12: String =
    """SELECT shipmode,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT o_orderpriority,
      |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'MAIL'
      |         WHEN 1 THEN 'SHIP' ELSE 'AIR' END AS shipmode
      |  FROM orders, lineitem
      |  WHERE o_orderkey = l_orderkey
      |    AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      |    AND CAST(l_linenumber % 3 AS INT) IN (0, 1)
      |  ) marked
      |GROUP BY shipmode
      |ORDER BY shipmode""".stripMargin

  // Q13 — customer order-count distribution (adaptation: the excluded-
  // comment predicate becomes an o_orderpriority exclusion; the
  // LEFT JOIN with an ON-clause filter + double aggregation is kept).
  val h13: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%MEDIUM%'
      |  GROUP BY c_custkey
      |  ) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // Q14 — promotion effect (verbatim structure on the type domain).
  val h14: String =
    s"""SELECT
       |  100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $Rev
       |                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS STRING) AS DOUBLE)
       |  / CAST(CAST(SUM($Rev) AS STRING) AS DOUBLE) AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin

  // Q15 — top supplier (the revenue VIEW becomes a CTE referenced
  // twice: once joined, once under MAX — the self-referencing shape).
  val h15: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    SUM($Rev) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name,
       |  CAST(CAST(total_revenue AS STRING) AS DOUBLE) AS total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // Q16 — parts/supplier relationship (adaptations: derived ps; the
  // comment-based supplier exclusion becomes a negative-balance
  // exclusion — the NOT IN subquery is the point).
  val h16: String =
    s"""WITH $PsCte
       |SELECT p_brand, p_type, p_size,
       |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM ps, part
       |WHERE p_partkey = ps_partkey
       |  AND p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
       |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
       |  AND ps_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // Q17 — small-quantity-order revenue (adaptation: no p_container —
  // p_brand + a p_size band select the part class; the correlated
  // per-part average subquery is the point; quantity sums are integral
  // doubles so AVG is order-independent in both engines).
  val h17: String =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_size <= 25
      |  AND l_quantity < (
      |    SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // Q18 — large-volume customers (verbatim structure; quantity sums as
  // exact decimals; threshold tuned to the testdata's basket sizes).
  val h18: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  // Q19 — discounted revenue (adaptation: no shipinstruct/shipmode/
  // container — brand + size bands keep the three-branch disjunction of
  // conjunctive range predicates, the optimizer stress this query is for).
  val h19: String =
    s"""SELECT
       |  CAST(CAST(SUM($Rev) AS STRING) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND (
       |    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |      AND l_quantity >= 1 AND l_quantity <= 11)
       | OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
       |      AND l_quantity >= 10 AND l_quantity <= 20)
       | OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 50
       |      AND l_quantity >= 20 AND l_quantity <= 30))""".stripMargin

  // Q20 — potential part promotion (adaptations: derived ps; the nested
  // IN-subqueries + correlated half-sum threshold are the point).
  val h20: String =
    s"""WITH $PsCte
       |SELECT s_name, s_acctbal
       |FROM supplier, nation
       |WHERE s_suppkey IN (
       |    SELECT ps_suppkey FROM ps
       |    WHERE ps_partkey IN (
       |        SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
       |      AND ps_availqty > (
       |        SELECT 0.5 * SUM(CAST(l_quantity AS DECIMAL(12,2)))
       |        FROM lineitem
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= DATE '1997-01-01'
       |          AND l_shipdate < DATE '1998-01-01'))
       |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
       |ORDER BY s_name""".stripMargin

  // Q21 — suppliers who kept orders waiting (adaptation: the per-line
  // "late" flag derives from ship-vs-order date; the EXISTS(other
  // supplier) + NOT EXISTS(other late supplier) double-correlation is
  // the point).
  val h21: String =
    """WITH ll AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY
      |         THEN 1 ELSE 0 END AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, ll l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.late = 1
      |  AND EXISTS (
      |    SELECT 1 FROM ll l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM ll l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // Q22 — global sales opportunity (adaptations: country code from
  // c_nationkey instead of the missing c_phone; AVG over doubles
  // rewritten as exact-decimal SUM / COUNT so the threshold is
  // order-independent; the anti-join on orders is the point).
  val h22: String =
    """SELECT cntrycode, COUNT(*) AS numcust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 10 AS STRING) AS cntrycode, c_acctbal
      |  FROM customer c
      |  WHERE CAST(c_nationkey % 10 AS STRING) IN ('1', '3', '5', '7', '9')
      |    AND c_acctbal > (
      |      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*)
      |      FROM customer
      |      WHERE c_acctbal > 0.0
      |        AND CAST(c_nationkey % 10 AS STRING) IN ('1', '3', '5', '7', '9'))
      |    AND NOT EXISTS (
      |      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |        AND o.o_orderdate >= DATE '1999-01-01')
      |  ) custsale
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  /** name → shared SQL text (the Spark query AND the DuckDB oracle). */
  val texts: Map[String, String] = Map(
    "h01_pricing_summary"   -> h01,
    "h02_min_cost_supplier" -> h02,
    "h03_ship_priority"     -> h03,
    "h04_order_priority"    -> h04,
    "h05_local_volume"      -> h05,
    "h06_revenue_forecast"  -> h06,
    "h07_volume_shipping"   -> h07,
    "h08_market_share"      -> h08,
    "h09_profit_by_nation"  -> h09,
    "h10_returned_items"    -> h10,
    "h11_important_stock"   -> h11,
    "h12_shipmode_priority" -> h12,
    "h13_order_distribution" -> h13,
    "h14_promo_effect"      -> h14,
    "h15_top_supplier"      -> h15,
    "h16_supplier_counts"   -> h16,
    "h17_small_qty_revenue" -> h17,
    "h18_large_volume_cust" -> h18,
    "h19_disjunctive_rev"   -> h19,
    "h20_part_promotion"    -> h20,
    "h21_waiting_suppliers" -> h21,
    "h22_sales_opportunity" -> h22,
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (k, v) =>
      k -> (if (psBacked(k)) runPs(bodyOf(v)) _ else run(v) _)
    }

  def oracles: Map[String, String] = texts
}
