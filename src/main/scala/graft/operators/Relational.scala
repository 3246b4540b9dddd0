package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables

/** Relational operator inventory (SURVEY.md §2.2) demonstrated over the
  * driver test tables, each with a DuckDB oracle.
  *
  * Determinism notes (the driver hash-compares against DuckDB):
  *  - Sums of doubles are order-dependent, so every money/quantity sum
  *    first casts to DECIMAL (exact, associative) and only then to
  *    DOUBLE for a type both engines agree on.
  *  - Derived float values (sqrt composites) are emitted as integers,
  *    `CAST(floor(x * 1e6 + 0.5) AS BIGINT)`: IEEE sqrt/mul/add/floor
  *    are bit-deterministic on identical inputs, while `round(x, n)`
  *    half-way behavior is engine-specific.
  *  - Every top-k has a total tiebreak order.
  */
object Relational {

  private val D2  = DecimalType(18, 2)
  private val D6  = DecimalType(28, 6)

  def all: Seq[QueryDef] = Seq(

    // -- Scan: parquet ----------------------------------------------------
    sql("scan_parquet",
      """SELECT count(*) AS n_rows, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |       count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        min("l_orderkey").as("min_key"),
        max("l_orderkey").as("max_key"),
        countDistinct("l_partkey").as("n_parts"))
    },

    // -- Scan: CSV import channel (SURVEY §2.2 "/import" mount) -----------
    // Round-trips `region` through CSV to exercise the CSV source with an
    // explicit schema, mirroring the reference's bulk-CSV-load channel.
    sql("scan_csv",
      "SELECT r_regionkey, r_name FROM region") { (s, d) =>
      // per-invocation temp dir: a fixed path would race under
      // concurrent catalog runs
      val out = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/region"
      Tables.region(s, d).write.mode("overwrite")
        .option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      s.read.option("header", "true").schema(schema).csv(out)
    },

    // -- Projection + filter with parquet pushdown ------------------------
    sql("proj_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 45.0 AND l_returnflag = 'R'""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter($(s)("l_quantity") > 45.0 && $(s)("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    // -- Aggregation: hash agg w/ partial+final (TPC-H Q1 shape) ----------
    sql("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(D2)).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(D2)).cast(DoubleType).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D6))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // -- Join: 3-way equi + agg + top-k (TPC-H Q3 shape) ------------------
    // nation/region-sized dims broadcast; customer⋈orders⋈lineitem shuffle
    // on the join keys, AQE picks broadcast when the filtered side is small.
    sql("q3_topk_revenue",
      """SELECT o.o_orderkey,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey
        |ORDER BY revenue DESC, o.o_orderkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D6))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // -- 6-way join (TPC-H Q5 shape): region→nation→customer/supplier
    // co-location predicate + lineitem fact. Dims broadcast, the two
    // fact joins shuffle on their keys — the join-ordering stress shape.
    sql("q5_local_supplier",
      """SELECT n.n_name AS n_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      c.join(o, o("o_custkey") === c("c_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(su, su("s_suppkey") === l("l_suppkey") &&
          su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
        .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
        .groupBy(n("n_name").as("n_name"))
        .agg(sum((l("l_extendedprice") * (lit(1.0) - l("l_discount"))).cast(D6))
          .cast(DoubleType).as("revenue"))
    },

    // -- HAVING + semi-join back to the fact (TPC-H Q18 shape): find
    // large-volume orders, then re-join to pull their details — the
    // aggregate acts as a filter relation (Catalyst plans the IN as a
    // semi join, no correlated re-execution).
    sql("q18_large_volume",
      """SELECT o.o_orderkey, o.o_totalprice,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |GROUP BY o.o_orderkey, o.o_totalprice""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val big = l.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(D2)).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey").as("big_key"))
      o.join(big, o("o_orderkey") === col("big_key"), "left_semi")
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"), o("o_totalprice"))
        .agg(sum(col("l_quantity").cast(D2)).cast(DoubleType).as("total_qty"))
    },

    // -- Join: left outer -------------------------------------------------
    sql("join_left",
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, o("o_custkey") === c("c_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
    },

    // -- Join: full outer (both-side nulls preserved) ---------------------
    sql("join_full",
      """WITH a AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust
        |           FROM customer WHERE c_custkey <= 100 GROUP BY 1),
        |b AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp
        |      FROM supplier WHERE s_suppkey <= 50 GROUP BY 1)
        |SELECT coalesce(a.nk, b.nk) AS nk,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM a FULL OUTER JOIN b ON a.nk = b.nk""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_custkey") <= 100)
        .groupBy(col("c_nationkey").as("nk_a")).agg(count(lit(1)).as("n_cust"))
      val b = Tables.supplier(s, d).filter(col("s_suppkey") <= 50)
        .groupBy(col("s_nationkey").as("nk_b")).agg(count(lit(1)).as("n_supp"))
      a.join(b, col("nk_a") === col("nk_b"), "full_outer")
        .select(coalesce(col("nk_a"), col("nk_b")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    },

    // -- Join: left semi (EXISTS) -----------------------------------------
    sql("join_semi",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // -- Join: left anti (NOT EXISTS) -------------------------------------
    // The orders side is filtered (customers with no >400k order) so the
    // result is non-empty at sf0.01 — an all-orders anti join matches
    // nothing in the testdata, which would make the check vacuous.
    sql("join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // -- Join: theta (non-equi; broadcast nested loop on the small dims) --
    sql("join_theta",
      """SELECT r.r_name, count(*) AS n
        |FROM region r JOIN nation n ON n.n_regionkey <> r.r_regionkey
        |GROUP BY r.r_name""".stripMargin) { (s, d) =>
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      r.join(n, n("n_regionkey") =!= r("r_regionkey"))
        .groupBy(r("r_name")).agg(count(lit(1)).as("n"))
    },

    // -- Aggregation: distinct + HLL sketch counterpart -------------------
    sql("agg_distinct",
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_supp"),
             countDistinct("l_partkey").as("n_part"))
    },

    // -- Grouping sets / rollup -------------------------------------------
    sql("agg_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(D2)).cast(DoubleType).as("sum_qty"))
    },

    // -- Grouping sets: cube -----------------------------------------------
    sql("agg_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
    },

    // -- Window functions --------------------------------------------------
    sql("window_rank",
      """SELECT l_orderkey, l_linenumber, rn, run_qty FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |      (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        |  FROM lineitem) t
        |WHERE rn <= 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("run_qty",
          sum(col("l_quantity").cast(D2))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .filter(col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "rn", "run_qty")
    },

    // Analytic window family: lead/lag (raw value moves, no float
    // math), ntile buckets, and cume_dist — position/n over a TOTAL
    // order (o_orderkey unique within each priority partition), so
    // every engine computes the identical double quotient.
    sql("window_analytics",
      """SELECT o_orderkey,
        |  lag(o_orderkey) OVER w AS prev_key,
        |  lead(o_orderkey) OVER w AS next_key,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
      Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_key"),
          lead("o_orderkey", 1).over(w).as("next_key"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          cume_dist().over(w).as("cd"))
    },

    // -- Sort / limit / top-k (TakeOrderedAndProject) ---------------------
    sql("topk_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    },

    // -- Set ops: union ----------------------------------------------------
    sql("setop_union",
      """SELECT nk, count(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey AS nk FROM supplier) t
        |GROUP BY nk""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.unionByName(su).groupBy("nk").agg(count(lit(1)).as("n"))
    },

    // -- Set ops: intersect / except ---------------------------------------
    sql("setop_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
    },

    sql("setop_except",
      """SELECT p_partkey AS pk FROM part WHERE p_partkey <= 500
        |EXCEPT SELECT l_partkey AS pk FROM lineitem WHERE l_quantity > 49""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") <= 500).select(col("p_partkey").as("pk"))
        .except(Tables.lineitem(s, d).filter(col("l_quantity") > 49)
          .select(col("l_partkey").as("pk")))
    },

    // -- Set ops: bag semantics (EXCEPT ALL keeps multiplicity) -----------
    sql("setop_except_all",
      """SELECT l_partkey AS pk FROM lineitem WHERE l_partkey <= 300
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_partkey <= 300 AND l_quantity > 25""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).filter(col("l_partkey") <= 300)
      base.select(col("l_partkey").as("pk"))
        .exceptAll(base.filter(col("l_quantity") > 25).select(col("l_partkey").as("pk")))
    },

    // -- Lateral join: per-row derived table (correlated FROM item) -------
    // Catalyst decorrelates the lateral subquery into a window/join —
    // same engine path as CALL { } per-entity top-k.
    sql("join_lateral",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |           WHERE o.o_custkey = c.c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |WHERE c.c_custkey <= 300""".stripMargin) { (s, d) =>
      val cv = s"cust_lat_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val ov = s"ord_lat_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      Tables.customer(s, d).createOrReplaceTempView(cv)
      Tables.orders(s, d).createOrReplaceTempView(ov)
      s.sql(
        s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM $cv c,
           |  LATERAL (SELECT o_orderkey, o_totalprice FROM $ov o
           |           WHERE o.o_custkey = c.c_custkey
           |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
           |WHERE c.c_custkey <= 300""".stripMargin)
    },

    // -- Aggregation: HLL sketch sanity ([NS] approx_count_distinct) ------
    // Sketch values differ across engines by construction, so the
    // oracle checks the CONTRACT both agree on: every group's sketch
    // lands within 15% of the exact distinct count (HLL rsd is 5%).
    sql("agg_approx_distinct",
      """SELECT count(*) AS n_groups_ok FROM (
        |  SELECT l_returnflag, approx_count_distinct(l_partkey) AS a,
        |         count(DISTINCT l_partkey) AS e
        |  FROM lineitem GROUP BY l_returnflag)
        |WHERE abs(a - e) <= 0.15 * e""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("a"),
          countDistinct(col("l_partkey")).as("e"))
        .filter(abs(col("a") - col("e")) <= lit(0.15) * col("e"))
        .agg(count(lit(1)).as("n_groups_ok"))
    },

    // -- Aggregation: approximate percentile (KLL/GK-sketch class) ---------
    // Same contract discipline as agg_approx_distinct: sketch outputs
    // differ across engines by construction, so each engine checks its
    // OWN approx median against its exact median (both near-exact at
    // this accuracy) and the compared value is the count of groups
    // inside the ±10% contract.
    sql("agg_approx_percentile",
      """SELECT count(*) AS n_groups_ok FROM (
        |  SELECT l_returnflag, approx_quantile(l_extendedprice, 0.5) AS a,
        |         quantile_cont(l_extendedprice, 0.5) AS e
        |  FROM lineitem GROUP BY l_returnflag)
        |WHERE abs(a - e) <= 0.10 * e""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a"),
          expr("percentile(l_extendedprice, 0.5)").as("e"))
        .filter(abs(col("a") - col("e")) <= lit(0.10) * col("e"))
        .agg(count(lit(1)).as("n_groups_ok"))
    },

    // -- Correlated scalar subquery (decorrelated to outer join + agg) ----
    // Catalyst rewrites the per-row subquery into ONE aggregated left
    // join — no per-row re-execution; the 100 TB shape is a single
    // shuffle on the correlation key.
    sql("subq_scalar",
      """SELECT c_custkey,
        |  (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c WHERE c_custkey <= 500""".stripMargin) { (s, d) =>
      val view = s"cust_sq_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val oview = s"ord_sq_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      Tables.customer(s, d).createOrReplaceTempView(view)
      Tables.orders(s, d).createOrReplaceTempView(oview)
      s.sql(
        s"""SELECT c_custkey,
           |  (SELECT max(o_totalprice) FROM $oview o WHERE o.o_custkey = c.c_custkey) AS max_price
           |FROM $view c WHERE c_custkey <= 500""".stripMargin)
    },

    // -- Aggregation: mode (most frequent value, deterministic tiebreak) --
    sql("agg_mode",
      """SELECT c_nationkey, seg AS mode_segment, n FROM (
        |  SELECT c_nationkey, c_mktsegment AS seg, count(*) AS n,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY count(*) DESC, c_mktsegment) AS rn
        |  FROM customer GROUP BY c_nationkey, c_mktsegment) t
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_nationkey").orderBy(col("n").desc, col("seg"))
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("seg").as("mode_segment"), col("n"))
    },

    // -- String functions --------------------------------------------------
    sql("string_fns",
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 9) AS pfx,
        |       length(c_name) AS nlen, replace(c_name, 'Customer', 'C') AS cshort,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer WHERE c_custkey <= 50""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") <= 50)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 9).as("pfx"),
          length(col("c_name")).as("nlen"),
          regexp_replace(col("c_name"), "Customer", "C").as("cshort"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
    },

    // -- Filtered / boolean aggregates -------------------------------------
    sql("agg_filtered",
      """SELECT l_returnflag,
        |  count(*) FILTER (l_quantity > 25) AS n_big,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_discount > 0.09) AS any_high_discount
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count_if(col("l_quantity") > 25).as("n_big"),
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.09).as("any_high_discount"))
    },

    // -- String functions, second family (pad/translate/initcap/repeat) ---
    sql("string_fns2",
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '.') AS padded,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
        |  repeat(p_type, 2) AS rep,
        |  CAST(strpos(p_name, 'e') AS INTEGER) AS epos,
        |  reverse(p_brand) AS rev
        |FROM part WHERE p_partkey <= 60""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_partkey") <= 60)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, ".").as("padded"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          repeat(col("p_type"), 2).as("rep"),
          instr(col("p_name"), "e").as("epos"),
          reverse(col("p_brand")).as("rev"))
    },

    // -- Date field extraction + arithmetic --------------------------------
    // ISO dow/weeks on both sides (Spark dayofweek is 1=Sunday, DuckDB
    // dow is 0=Sunday — `isodow`/weekday-from-Monday avoids both).
    sql("date_fns2",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS idow,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end
        |FROM orders WHERE o_orderkey <= 500""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          expr("(dayofweek(o_orderdate) + 5) % 7 + 1").cast(IntegerType).as("idow"),
          dayofyear(col("o_orderdate")).as("doy"),
          date_add(col("o_orderdate"), 30).as("due"),
          last_day(col("o_orderdate")).as("month_end"))
    },

    // -- Date/time functions ----------------------------------------------
    sql("date_fns",
      """SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
             sum(col("o_totalprice").cast(D2)).cast(DoubleType).as("sum_price"))
    },

    // -- Math functions ----------------------------------------------------
    // All derived values are integers: IEEE-754 sqrt is correctly
    // rounded (bit-identical across engines) and *, +, floor on
    // identical doubles are deterministic, so the BIGINT results are
    // engine-independent — no decimal-rounding semantics involved
    // (round(x, n) half-way behavior differs between engines).
    sql("math_fns",
      """SELECT c_custkey, abs(c_acctbal) AS aabs,
        |       CAST(floor(c_acctbal) AS BIGINT) AS afloor,
        |       CAST(ceil(c_acctbal) AS BIGINT) AS aceil,
        |       CAST(floor(sqrt(abs(c_acctbal)) * 1000000 + 0.5) AS BIGINT) AS isqrt,
        |       c_acctbal * c_acctbal AS apow
        |FROM customer WHERE c_custkey <= 100""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          abs(col("c_acctbal")).as("aabs"),
          floor(col("c_acctbal")).as("afloor"),
          ceil(col("c_acctbal")).as("aceil"),
          floor(sqrt(abs(col("c_acctbal"))) * 1000000 + 0.5).cast(LongType).as("isqrt"),
          (col("c_acctbal") * col("c_acctbal")).as("apow"))
    },

    // -- Array / higher-order functions (embeddings) ----------------------
    sql("array_fns",
      """SELECT vec_id, len(embedding) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_val,
        |       CAST(list_max(embedding) AS DOUBLE) AS max_val
        |FROM embeddings WHERE vec_id < 100""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
          array_max(col("embedding")).cast(DoubleType).as("max_val"))
    },

    // -- JSON functions (events.props is a JSON string) -------------------
    sql("json_fns",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
        |       count(*) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((get_json_object(col("props"), "$.k").cast(LongType) % 10).as("kmod"))
        .agg(count(lit(1)).as("n"))
    },

    // -- Semi-structured: VariantType (Spark 4's binary JSON) -------------
    // parse_json once into the compact variant encoding, then typed
    // variant_get extractions — at scale this beats per-field
    // get_json_object re-parses (one parse, many reads) and is the
    // engine's answer to schema-on-read JSON columns.
    sql("json_variant",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS kmod,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(parse_json(col("props")).as("v"))
        .select(try_variant_get(col("v"), "$.k", "long").as("k"))
        .groupBy((col("k") % 7).as("kmod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    },

    // -- UDF surface: custom typed Aggregator (SURVEY §2.2 UDF row) -------
    // A minhash-style min-of-permuted-hash aggregate registered as a
    // UDAF — integer arithmetic end to end, so the DuckDB oracle is an
    // exact mirror. (Scalar UDFs live in the packs registry; table
    // functions are procedures — this closes the Aggregator leg.)
    sql("agg_custom_udaf",
      """SELECT l_returnflag,
        |  min((1103515245 * l_partkey + 12345) % 2147483647) AS minhash,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      s.udf.register("graft_minhash", udaf(MinHashAggregator))
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("graft_minhash(l_partkey)").as("minhash"),
          count(lit(1)).as("n"))
    },

    // -- C16: sorted string aggregation (ref DatabaseIO.java:76-82) -------
    sql("agg_stringagg",
      """SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer WHERE c_custkey <= 200 GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") <= 200)
        .groupBy("c_nationkey")
        .agg(concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"))
    },

    // -- pivot: rows-to-columns with explicit output values ---------------
    // Spark's relational pivot (one shuffle; pivot values named, so no
    // extra values-discovery pass). The oracle spells the same thing
    // as conditional aggregates — pivot IS a macro over CASE sums.
    sql("agg_pivot",
      """SELECT o_orderpriority,
        |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
        |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
        |  CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L, Seq("F", "O", "P"))
    },

    // unpivot/melt: wide per-priority metrics to (metric, value) rows —
    // the inverse of pivot, a narrow per-row expansion after one agg
    sql("agg_unpivot",
      """WITH a AS (
        |  SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM orders GROUP BY 1)
        |SELECT pri, 'n_orders' AS metric, n_orders AS value FROM a
        |UNION ALL SELECT pri, 'sum_cents' AS metric, sum_cents FROM a""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("sum_cents"))
        .unpivot(Array(col("pri")), Array(col("n_orders"), col("sum_cents")),
          "metric", "value")
    },

    // explicit GROUPING SETS (rollup/cube's general form): two
    // disjoint grouping columns aggregated in one pass
    sql("agg_grouping_sets",
      """SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin) { (s, d) =>
      val view = s"orders_gs_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      Tables.orders(s, d).createOrReplaceTempView(view)
      s.sql(
        s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n
           |FROM $view
           |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin)
    },

    // RANGE-frame window: value-range moving aggregates (vs the
    // ROWS-frame running sum in window_rank). Partitioned by priority —
    // a partitionless ordered window would funnel into one task.
    sql("window_range_frame",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(count(*) OVER w AS BIGINT) AS cnt_win,
        |  CAST(sum(cents) OVER w AS BIGINT) AS sum_win
        |FROM (SELECT o_orderkey, o_orderpriority,
        |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |      FROM orders WHERE o_orderkey < 3000)
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
        .rangeBetween(-100, 0)
      Tables.orders(s, d).filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          count(lit(1)).over(w).as("cnt_win"),
          sum("cents").over(w).as("sum_win"))
    },

    // ORC source: same round-trip discipline as scan_json — the oracle
    // checks values, the Spark side proves the columnar ORC read path
    sql("scan_orc",
      "SELECT n_nationkey, n_name FROM nation") { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/nation"
      Tables.nation(s, d).select("n_nationkey", "n_name")
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
    },

    // JSON source: parquet rows round-tripped through JSON-lines files
    // and read back with an explicit schema (schema-on-read; no
    // inference pass at scale)
    sql("scan_json",
      "SELECT r_regionkey, r_name FROM region") { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft-json").toString + "/region"
      Tables.region(s, d).select("r_regionkey", "r_name")
        .write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      s.read.schema(schema).json(out)
    },

    // XML source (built into Spark 4's spark-sql): same round-trip
    // discipline as scan_orc/scan_json — explicit schema-on-read, no
    // inference pass over the files at scale.
    sql("scan_xml",
      "SELECT n_nationkey, n_name FROM nation") { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft-xml").toString + "/nation"
      Tables.nation(s, d).select("n_nationkey", "n_name")
        .write.mode("overwrite").option("rowTag", "nation").format("xml").save(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType)))
      s.read.option("rowTag", "nation").schema(schema).format("xml").load(out)
    },

    // binaryFile source: the raw-media ingest path (each file one row
    // of path/length/content). The fixture file is derived from the
    // region table (5 rows — the driver-side write is the fixture
    // setup, not the operator); the graded operator is the binaryFile
    // READ projecting length + content hash, which is how image/audio
    // corpora enter a pipeline before any decode.
    sql("scan_binary_files",
      """WITH c AS (
        |  SELECT string_agg(r_regionkey || ':' || r_name, chr(10) ORDER BY r_regionkey) AS s
        |  FROM region)
        |SELECT CAST(octet_length(encode(s)) AS BIGINT) AS n_bytes, sha256(s) AS sha
        |FROM c""".stripMargin) { (s, d) =>
      val content = Tables.region(s, d)
        .orderBy("r_regionkey")
        .select(concat_ws(":", col("r_regionkey"), col("r_name")).as("line"))
        .agg(concat_ws("\n", collect_list(col("line"))).as("s"))
        .collect().head.getString(0)
      val dir = java.nio.file.Files.createTempDirectory("graft-bin")
      java.nio.file.Files.write(dir.resolve("region.bin"),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s.read.format("binaryFile").load(dir.toString)
        .select(col("length").as("n_bytes"), sha2(col("content"), 256).as("sha"))
    },

    // -- Bucketed co-located join (the 100 TB fact⋈fact shape) ------------
    // Both sides are written bucketed+sorted on the join key, so the
    // sort-merge join reads pre-partitioned, pre-sorted buckets: ZERO
    // Exchange and zero Sort in the join plan (PlanSpec-guarded). At
    // 100 TB this is the difference between joining in place and
    // re-shuffling two whole tables; the grouped count after the join
    // reuses the same bucket partitioning, so the aggregate is
    // exchange-free too. The oracle checks values only — bucketing is
    // physical layout, invisible to results.
    sql("join_bucketed",
      """SELECT o.o_custkey AS custkey, count(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE c.c_acctbal > 0
        |GROUP BY o.o_custkey""".stripMargin) { (s, d) =>
      // names fixed PER PROCESS (pid suffix) + overwrite: repeat runs in
      // one JVM reuse the same two catalog entries (no per-run leak),
      // while two concurrent processes on one machine never overwrite
      // each other's bucket files mid-read
      val pid = ProcessHandle.current().pid()
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-bucket-$pid"
      val (ot, ct) = (s"graft_orders_bucketed_$pid", s"graft_customer_bucketed_$pid")
      // repartition on the bucket column with the bucket count: the
      // repartition hash and the bucket hash agree (both Murmur3 mod
      // 8), so each of the 8 writer tasks owns exactly its bucket →
      // one file per bucket from a PARALLEL write (a repartition(1)
      // single writer would serialize at scale)
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(8, col("o_custkey"))
        .write.mode("overwrite").option("path", s"$base/$ot")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ot)
      Tables.customer(s, d).select("c_custkey", "c_acctbal")
        .repartition(8, col("c_custkey"))
        .write.mode("overwrite").option("path", s"$base/$ct")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(ct)
      val o = s.table(ot)
      val c = s.table(ct).filter(col("c_acctbal") > 0)
      // merge hint: keep the bucket-aligned SMJ even when one side is
      // small enough that AQE would broadcast it (the point is the
      // exchange-free plan shape, which broadcast would mask)
      o.hint("merge").join(c, c("c_custkey") === o("o_custkey"))
        .groupBy(o("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D2)).cast(DoubleType).as("sum_price"))
    },

    // -- Partition-pruned scan (static partition pruning) -----------------
    // Writes orders hive-partitioned by status, then queries ONE
    // partition: the scan's PartitionFilters prune the other
    // directories before any I/O (PlanSpec asserts the filter landed in
    // the scan, not in a post-read Filter). The 100 TB analog is a
    // date-partitioned event log where a day query touches 1/365th of
    // the files.
    sql("scan_partition_prune",
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'P'""".stripMargin) { (s, d) =>
      val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/orders"
      Tables.orders(s, d).select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
      s.read.parquet(out)
        .filter(col("o_orderstatus") === "P")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    }
  )

  private def $(s: SparkSession) = (name: String) => col(name)
}

/** Typed `Aggregator` (the custom-UDAF surface): min of a fixed
  * integer hash permutation — the single-permutation core of the
  * MinHash signature, exact integer math so it oracle-matches. */
object MinHashAggregator extends org.apache.spark.sql.expressions.Aggregator[Long, Long, Long] {
  import org.apache.spark.sql.{Encoder, Encoders}
  private val A = 1103515245L
  private val B = 12345L
  private val P = 2147483647L
  def zero: Long = Long.MaxValue
  def reduce(acc: Long, key: Long): Long = math.min(acc, (A * key + B) % P)
  def merge(a: Long, b: Long): Long = math.min(a, b)
  def finish(acc: Long): Long = acc
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
