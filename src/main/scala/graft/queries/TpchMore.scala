package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Remaining TPC-H query shapes (reference exercises all 22 through
  * pg_deeplake → DuckDB: `postgres/tests/sql/tpch/` 1.sql–22.sql,
  * `postgres/tests/py_tests/test_tpch.py:309-477`).
  *
  * The driver's testdata is a reduced TPC-H star schema — no `partsupp`
  * table and fewer columns (no l_commitdate/l_receiptdate/l_shipmode,
  * p_container/p_mfgr, c_phone) — so partsupp-dependent queries are
  * re-expressed over the lineitem fact with the SAME plan shape
  * (correlated min subquery, NOT IN, HAVING over scalar subquery,
  * EXISTS/NOT EXISTS multi-way join, disjunctive pushdown, ...).
  *
  * Scale notes baked into each query:
  *  - scalar subqueries become `crossJoin(broadcast(scalarAgg))` — a
  *    1-row broadcast, never a shuffle
  *  - dimension joins (nation/region/supplier/part) broadcast; only
  *    fact-fact joins (lineitem⋈orders) shuffle on the join key
  *  - equality-against-max/threshold comparisons use sums of
  *    l_quantity (whole numbers — exact in fp both engines) so the
  *    DuckDB hash-compare can't flip on a last-ulp rounding boundary
  */
object TpchMore extends QueryModule {

  private def ts(s: String) = lit(s).cast("timestamp")
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  override def qs: Seq[(String, Q)] = Seq(

    // ---- Q2 shape: correlated MIN subquery (min-cost supplier per part)
    "q2_min_cost_supplier" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part").filter(col("p_size") === 15)
        val sp = table(s, dir, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice")).as("cost"))
        val minc = sp.groupBy(col("l_partkey").as("mp"))
          .agg(min(col("cost")).as("min_cost"))
        sp.join(minc, col("l_partkey") === col("mp") && col("cost") === col("min_cost"))
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(table(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("n_name"), col("l_partkey").as("partkey"),
            round(col("cost"), 2).as("cost"))
          .orderBy(col("partkey"), col("s_name"))
      },
      Some("""WITH sp AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
             |FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size = 15
             |GROUP BY 1, 2)
             |SELECT s_name, n_name, sp.l_partkey AS partkey, round(sp.cost, 2) AS cost
             |FROM sp JOIN supplier ON sp.l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE sp.cost = (SELECT min(cost) FROM sp sp2 WHERE sp2.l_partkey = sp.l_partkey)
             |ORDER BY partkey, s_name""".stripMargin.replace('\n', ' ')),
      doc = "correlated min decorrelates to agg + self-join; min() is exact so the equality can't flip"),

    // ---- Q7 shape: bi-directional nation-pair volume by year
    "q7_volume_shipping" -> Q(
      (s, dir) => {
        val n1 = table(s, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = table(s, dir, "nation").select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        table(s, dir, "lineitem")
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(n1, col("s_nationkey") === col("sn_key"))
          .join(n2, col("c_nationkey") === col("cn_key"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1998-01-01 00:00:00"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(revenue), 2).as("volume"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin.replace('\n', ' '))),

    // ---- Q8 shape: market share (conditional sum ratio per year)
    "q8_market_share" -> Q(
      (s, dir) => {
        val custNation = table(s, dir, "nation").select(
          col("n_nationkey").as("cn_key"), col("n_regionkey").as("cr_key"))
        val suppNation = table(s, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        table(s, dir, "lineitem")
          .join(table(s, dir, "part").filter(col("p_type") === "PROMO"),
            col("l_partkey") === col("p_partkey"))
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(custNation, col("c_nationkey") === col("cn_key"))
          .join(table(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("cr_key") === col("r_regionkey"))
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(suppNation, col("s_nationkey") === col("sn_key"))
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1998-01-01 00:00:00"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_5", revenue).otherwise(0.0)) /
              sum(revenue), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |round(sum(CASE WHEN n2.n_name = 'NATION_5'
             |THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             |/ sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
             |AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY o_year""".stripMargin.replace('\n', ' ')),
      doc = "8-way star join; every dim broadcasts, one fact-fact shuffle"),

    // ---- Q9 shape: profit by (supplier nation, year) for a part family
    "q9_product_profit" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem")
          .join(table(s, dir, "part").filter(col("p_name").like("%blue%")),
            col("l_partkey") === col("p_partkey"))
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(table(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          // sum in decimal: fp-exact accumulation, so the cent rounding
          // can't flip on summation order vs the oracle
          .agg(round(sum(revenue.cast("decimal(18,6)")), 2).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE p_name LIKE '%blue%'
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin.replace('\n', ' '))),

    // ---- Q10 shape: top returned-item customers in a quarter
    "q10_returned_items" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .join(table(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("1996-10-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00")),
            col("l_orderkey") === col("o_orderkey"))
          .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(table(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(round(sum(revenue), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin.replace('\n', ' '))),

    // ---- Q11 shape: HAVING against a scalar-subquery threshold
    // (partsupp value → supplied-quantity share per part; quantity sums
    // are whole numbers, so the threshold compare is exact in fp)
    "q11_important_parts" -> Q(
      (s, dir) => {
        val l = table(s, dir, "lineitem")
        val perPart = l.groupBy(col("l_partkey").as("partkey"))
          .agg(sum(col("l_quantity")).as("total_qty"))
        val threshold = l.agg((sum(col("l_quantity")) * 0.001).as("thr"))
        perPart.crossJoin(broadcast(threshold))
          .filter(col("total_qty") > col("thr"))
          .select(col("partkey"), round(col("total_qty"), 2).as("total_qty"))
          .orderBy(col("total_qty").desc, col("partkey"))
      },
      Some("""SELECT l_partkey AS partkey, round(sum(l_quantity), 2) AS total_qty
             |FROM lineitem GROUP BY 1
             |HAVING sum(l_quantity) > (SELECT sum(l_quantity) * 0.001 FROM lineitem)
             |ORDER BY total_qty DESC, partkey""".stripMargin.replace('\n', ' ')),
      doc = "scalar subquery = 1-row broadcast cross join, no shuffle added"),

    // ---- Q12 shape: late-shipment priority counts (conditional agg)
    "q12_priority_shipments" -> Q(
      (s, dir) => {
        val urgent = col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH"
        table(s, dir, "lineitem")
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS") &&
            col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
            col("l_shipdate") < ts("1998-01-01 00:00:00"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             |sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
             |AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY l_linestatus""".stripMargin.replace('\n', ' '))),

    // ---- Q13 shape: distribution of order counts (outer join w/ extra cond)
    "q13_customer_distribution" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        table(s, dir, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |SELECT c_custkey, count(o_orderkey) AS c_count
             |FROM customer LEFT JOIN orders
             |ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |GROUP BY c_custkey) t
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin.replace('\n', ' '))),

    // ---- Q14 shape: promo revenue ratio in a month window
    "q14_promo_revenue" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1997-03-01 00:00:00") &&
            col("l_shipdate") < ts("1997-04-01 00:00:00"))
          .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) * sum(when(col("p_type") === "PROMO", revenue).otherwise(0.0)) /
              sum(revenue), 4).as("promo_revenue"))
      },
      Some("""SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
             |THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             |/ sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             |AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin.replace('\n', ' '))),

    // ---- Q15 shape: supplier(s) achieving the MAX of an aggregate
    // (max-compare runs on whole-number quantity sums — fp-exact)
    "q15_top_supplier" -> Q(
      (s, dir) => {
        val rev = table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1996-04-01 00:00:00"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("total_qty"),
            round(sum(revenue), 2).as("total_revenue"))
        val mx = rev.agg(max(col("total_qty")).as("max_qty"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_qty") === col("max_qty"))
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("total_qty"), 2).as("total_qty"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (SELECT l_suppkey, sum(l_quantity) AS total_qty,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
             |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1)
             |SELECT s_suppkey, s_name, round(total_qty, 2) AS total_qty, total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_qty = (SELECT max(total_qty) FROM rev)
             |ORDER BY s_suppkey""".stripMargin.replace('\n', ' '))),

    // ---- Q16 shape: NOT IN subquery + grouped count distinct
    "q16_part_supplier_counts" -> Q(
      (s, dir) => {
        val excluded = table(s, dir, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        val p = table(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#13" && col("p_size").isin(1, 9, 19, 25, 36, 45, 49))
        table(s, dir, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 19, 25, 36, 45, 49)
             |AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin.replace('\n', ' ')),
      doc = "NOT IN over a non-null key = left_anti join (broadcast)"),

    // ---- Q18 shape: IN over a grouped-HAVING subquery (large-volume orders)
    "q18_large_volume_customers" -> Q(
      (s, dir) => {
        val l = table(s, dir, "lineitem")
        val big = l.groupBy(col("l_orderkey").as("bk"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        table(s, dir, "orders")
          .join(big, col("o_orderkey") === col("bk"), "left_semi")
          .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_totalprice"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
             |strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
             |round(sum(l_quantity), 2) AS sum_qty
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
             |GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
             |GROUP BY 1, 2, 3, 4, 5
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin.replace('\n', ' '))),

    // ---- Q19 shape: disjunction of conjunctive ranges (all pushable)
    "q19_disjunctive_revenue" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem")
          .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(round(sum(revenue), 2).as("revenue"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
             |OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
             |OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin.replace('\n', ' '))),

    // ---- Q20 shape: IN over correlated grouped-HAVING (qualified suppliers)
    "q20_qualified_suppliers" -> Q(
      (s, dir) => {
        val qualified = table(s, dir, "lineitem")
          .join(table(s, dir, "part").filter(col("p_name").like("%red%")),
            col("l_partkey") === col("p_partkey"))
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 100)
        table(s, dir, "supplier")
          .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |WHERE s_suppkey IN (SELECT l_suppkey
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_name LIKE '%red%'
             |AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
             |ORDER BY s_suppkey""".stripMargin.replace('\n', ' '))),

    // ---- Q21 shape: EXISTS + NOT EXISTS over sibling lineitems
    // ("late" = shipped >60 days after order date; only this supplier late)
    "q21_waiting_suppliers" -> Q(
      (s, dir) => {
        val l = table(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val o = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val l2 = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
        val late3 = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
        late
          .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
            "left_semi")
          .join(late3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
            "left_anti")
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH late AS (SELECT l_orderkey, l_suppkey
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |SELECT s_name, count(*) AS numwait
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
             |AND l2.l_suppkey <> l1.l_suppkey)
             |AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey
             |AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin.replace('\n', ' ')),
      doc = "EXISTS/NOT EXISTS become semi/anti joins on the same shuffle key (l_orderkey)"),

    // ---- Q22 shape: anti-join + scalar-subquery threshold (dormant customers)
    "q22_dormant_customers" -> Q(
      (s, dir) => {
        val c = table(s, dir, "customer")
          .withColumn("cntrycode", col("c_nationkey") % 10)
          .filter(col("cntrycode").isin(1, 2, 3, 4, 5))
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg(avg(col("c_acctbal")).as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(table(s, dir, "orders").select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
          .orderBy(col("cntrycode"))
      },
      Some("""SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
             |FROM (SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal FROM customer
             |WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)) c
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
             |WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 2, 3, 4, 5))
             |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin.replace('\n', ' ')))
  )
}
