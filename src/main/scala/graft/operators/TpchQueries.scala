package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables

/** The rest of the TPC-H-expressible decision-support suite over the
  * driver tables (SURVEY.md §2.2 join/agg breadth — q1/q3/q5/q18 live
  * in Relational.scala; this file adds the shapes those four don't
  * cover: pure scan-agg (q6), EXISTS with a correlated non-equi
  * predicate (q4), two-sided nation-pair OR join (q7), CASE-pivot over
  * a join (q12), group-filter-by-scalar-max (q15), disjunctive
  * pushdown ORs (q19), NOT-EXISTS anti join against a scalar
  * average (q22), filtered-outer-join two-level aggregation (q13),
  * and a decorrelated per-group average comparison (q17). The
  * testdata schema omits partsupp and the commit/receipt dates, so
  * q2/q11/q16/q20/q21 have no faithful adaptation and the date
  * predicates here use l_shipdate/o_orderdate.
  *
  * Determinism: money sums go through DECIMAL (associative) before the
  * final DOUBLE cast; ratio queries emit numerator/denominator instead
  * of dividing (float division is the one step two engines may round
  * differently); scalar-average comparisons are cross-multiplied into
  * exact integer/decimal space (`bal * n > total`).
  *
  * Scale notes, per the 100 TB contract: q6 is the pushdown showcase
  * (predicate + 3-column pruning reach the scan); q4/q22's
  * EXISTS/NOT-EXISTS plan as one shuffled semi/anti join each, never a
  * per-row subquery; q7/q10 broadcast the nation dim; q15's scalar max
  * is a 1-row broadcast cross join, not a driver collect; q19's OR
  * block references only scan columns of each side, so Catalyst can
  * push the brand/size disjunction to the part scan and the
  * quantity bounds to the lineitem scan before the join.
  */
object TpchQueries {

  private val D2 = DecimalType(18, 2)
  private val D6 = DecimalType(28, 6)

  private def revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D6)

  def all: Seq[QueryDef] = Seq(

    // -- q6: forecast revenue change — the pure filter+agg scan. The
    // whole query is one WholeStageCodegen span over a pruned
    // 4-column read; PlanSpec asserts the range predicates land in
    // PushedFilters.
    sql("q6_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast(D6))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // -- q4: order priority checking — EXISTS with a correlated
    // NON-equi predicate (l_shipdate > o_orderdate). Catalyst plans
    // the equi part as the semi-join key and keeps the date comparison
    // as the join condition — one shuffle, no per-order probe.
    sql("q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-10-01").cast(TimestampType))
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(l, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // -- q7: volume shipping between a nation pair, by ship year. The
    // two nation lookups broadcast; the OR-of-pairs predicate applies
    // after both dims resolve. year() is the only scalar derivation.
    sql("q7_nation_volume",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
        |       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM supplier s
        |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val su = Tables.supplier(s, d)
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      su.join(l, su("s_suppkey") === l("l_suppkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n1), col("n1_key") === su("s_nationkey"))
        .join(broadcast(n2), col("n2_key") === c("c_nationkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(sum(revenue).cast(DoubleType).as("revenue"))
    },

    // -- q8: national market share — the target nation's revenue share
    // of its region's market by order year. Emits numerator and
    // denominator per year (no float division at a compared column);
    // the share is numerator/denominator at read time.
    sql("q8_market_share",
      """SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_8'
        |       THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))
        |       ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS nation_volume,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_volume
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n1.n_regionkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1k"), col("n_regionkey").as("n1r"))
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val su = Tables.supplier(s, d)
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("n2k"), col("n_name").as("supp_nation"))
      l.join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n1), col("n1k") === c("c_nationkey"))
        .join(broadcast(r), r("r_regionkey") === col("n1r"))
        .join(su, su("s_suppkey") === l("l_suppkey"))
        .join(broadcast(n2), col("n2k") === su("s_nationkey"))
        .groupBy(year(o("o_orderdate")).cast(LongType).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_8", revenue)
            .otherwise(lit(0).cast(D6))).cast(DoubleType).as("nation_volume"),
          sum(revenue).cast(DoubleType).as("total_volume"))
    },

    // -- q10: returned-item reporting — who returned the most revenue
    // in a quarter. 3 fact joins + broadcast nation, top-20 with a
    // total tiebreak.
    sql("q10_returned_items",
      """SELECT c.c_custkey, c.c_name, n.n_name AS n_name,
        |       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, d)
      c.join(o, o("o_custkey") === c("c_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), n("n_name").as("n_name"))
        .agg(sum(revenue).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // -- q12 (adapted: the schema has no l_shipmode, so the CASE pivot
    // classifies o_orderpriority instead): urgent vs non-urgent line
    // counts per linestatus for a ship-year. Exact integer counts.
    sql("q12_priority_class",
      """SELECT l.l_linestatus,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l.l_linestatus""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy(l("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
    },

    // -- q14: promo revenue share. Emits numerator + denominator (both
    // DECIMAL-summed) instead of the percentage — float division is
    // the one place two engines may disagree in the last ulp.
    sql("q14_promo_share",
      """SELECT
        |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |       THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))
        |       ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
      val p = Tables.part(s, d)
      l.join(p, p("p_partkey") === l("l_partkey"))
        .agg(
          sum(when(p("p_type") === "PROMO", revenue).otherwise(lit(0).cast(D6)))
            .cast(DoubleType).as("promo_revenue"),
          sum(revenue).cast(DoubleType).as("total_revenue"))
    },

    // -- q15: top supplier — revenue per supplier for a quarter, keep
    // those equal to the max. The scalar max joins back as a 1-row
    // broadcast (no driver collect); DECIMAL equality is exact on both
    // engines so ties survive identically.
    sql("q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
        |FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .groupBy("l_suppkey")
        .agg(sum(revenue).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      Tables.supplier(s, d)
        .join(rev, rev("l_suppkey") === col("s_suppkey"))
        .join(broadcast(top), col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_rev"))
    },

    // -- q19: disjunctive pushdown — three (brand, size-range,
    // qty-range) conjunctions ORed. Brand/size only reference part,
    // quantity only lineitem, so each side's OR-envelope pushes to its
    // scan; the equi join stays the single shuffle.
    sql("q19_disjunctive_pred",
      """SELECT CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity >= 1.0  AND l.l_quantity <= 11.0)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 10.0 AND l.l_quantity <= 20.0)
        |   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 20.0 AND l.l_quantity <= 30.0)""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val j = l.join(p, p("p_partkey") === l("l_partkey"))
      j.filter(
          (p("p_brand") === "Brand#12" && p("p_size").between(1, 5) &&
            l("l_quantity") >= 1.0 && l("l_quantity") <= 11.0) ||
          (p("p_brand") === "Brand#23" && p("p_size").between(1, 10) &&
            l("l_quantity") >= 10.0 && l("l_quantity") <= 20.0) ||
          (p("p_brand") === "Brand#15" && p("p_size").between(1, 15) &&
            l("l_quantity") >= 20.0 && l("l_quantity") <= 30.0))
        .agg(sum(revenue).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // -- q22: customers with above-average balance and no RECENT
    // orders (every synthetic customer has SOME order, so the
    // faithful no-orders-ever predicate is vacuous here — the recency
    // cut keeps the anti join non-trivial). The average comparison
    // cross-multiplies into exact DECIMAL space (bal * n > total ⟺
    // bal > total/n for n > 0) so no float division exists anywhere;
    // NOT EXISTS plans as one anti join.
    sql("q22_no_order_customers",
      """WITH stats AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c.c_mktsegment, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c, stats
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.n > stats.s
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c.c_mktsegment""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val stats = c.filter(col("c_acctbal") > 0.0)
        .agg(sum(col("c_acctbal").cast(D2)).as("s"), count(lit(1)).as("n"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
        .select("o_custkey")
      c.join(broadcast(stats))
        .filter(col("c_acctbal").cast(D2) * col("n") > col("s"))
        .join(o, o("o_custkey") === c("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(D2)).cast(DoubleType).as("totacctbal"))
    },

    // -- q13: customer order-count distribution — the two-level
    // aggregation: LEFT JOIN so zero-order customers survive into the
    // c_count=0 bucket, count(o_orderkey) so NULLs from the outer side
    // don't count, then a second agg over the first's output. The
    // faithful query filters o_comment; testdata has no comment column,
    // so the join-side predicate keeps the same filtered-outer-join
    // shape on o_orderpriority. At scale: the first agg shuffles on
    // c_custkey (same key as the join, so AQE coalesces into one
    // exchange); the second agg's domain is tiny (distinct counts).
    sql("q13_order_distribution",
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |      FROM customer c
        |      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |        AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      c.join(o, o("o_custkey") === c("c_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // -- q17: small-quantity-order revenue — the correlated per-part
    // average subquery (l_quantity < 0.2 * avg over the same part),
    // decorrelated into one per-part aggregate joined back. The
    // comparison cross-multiplies into DECIMAL space
    // (qty * 5 * n < sum_qty ⟺ qty < 0.2 * sum/n for n > 0) so no
    // float division exists in either engine. Width discipline: the
    // product side uses DECIMAL(12,2) × 5 × DECIMAL(8,0) so both
    // engines stay ≤ width 38 and EXACT — a DECIMAL(18,2) × BIGINT
    // product overflows DuckDB's 38-digit width and silently falls
    // back to DOUBLE comparison (decimal widths ADD under ×). The
    // shrunk widths are sound: quantity ≤ 10 digits of units and
    // per-part line counts ≤ 1e8 hold at any TPC-H scale (600B-row
    // lineitem spreads over 20B parts ≈ 30 lines/part). The brand filter makes
    // the part side small: it broadcasts into the lineitem semi pass,
    // and the per-part stats frame (≤ #filtered parts rows) broadcasts
    // into the final join — zero shuffles on the fact table at scale.
    sql("q17_small_quantity",
      """WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
        |st AS (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |              COUNT(*) AS n
        |       FROM lineitem JOIN pp ON pp.p_partkey = l_partkey
        |       GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_extprice,
        |       COUNT(*) AS n_lines
        |FROM lineitem l JOIN st ON st.l_partkey = l.l_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * CAST(st.n AS DECIMAL(8,0)) < st.sum_qty""".stripMargin) { (s, d) =>
      val pp = Tables.part(s, d).filter(col("p_brand") === "Brand#23").select("p_partkey")
      val l = Tables.lineitem(s, d)
      val stats = l.join(broadcast(pp), pp("p_partkey") === l("l_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("st_partkey"))
        .agg(sum(col("l_quantity").cast(D2)).as("sum_qty"), count(lit(1)).as("n"))
      l.join(broadcast(stats), col("st_partkey") === l("l_partkey"))
        .filter(col("l_quantity").cast("decimal(12,2)") * 5 *
          col("n").cast("decimal(8,0)") < col("sum_qty"))
        .agg(sum(col("l_extendedprice").cast(D2)).cast(DoubleType).as("total_extprice"),
          count(lit(1)).as("n_lines"))
    }
  )
}
