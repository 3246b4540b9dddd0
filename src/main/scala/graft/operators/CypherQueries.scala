package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{GraftSession, QueryDef}
import graft.QueryDef.sql
import graft.core.GraphViews

/** SURVEY.md §2.1 Cypher surface executed end-to-end through the
  * engine (parser → pattern compiler → Catalyst) over the TPC-H graph
  * view, each with a DuckDB oracle on the raw tables.
  */
object CypherQueries {

  // One session per (spark, dir): graph-view lineage is rebuilt only once.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, GraftSession]()

  private def session(s: SparkSession, dir: String): GraftSession =
    cache.computeIfAbsent(dir, _ => {
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs
    })

  /** Snapshot-backed session with a RANGE index on (customer,
    * c_acctbal) — the index-anchored-lookup fixture (r15 verdict #1,
    * graded end to end): customer nodes only, CREATE INDEX, one full
    * save (which writes the id-clustered base AND the prop-clustered
    * `index_aux` projection), so anchored reads route through the
    * projection with the predicate pushed into its sorted scan. */
  private val idxCache = new java.util.concurrent.ConcurrentHashMap[String, GraftSession]()
  private def indexedSession(s: SparkSession, dir: String): GraftSession =
    idxCache.computeIfAbsent(dir, _ => {
      import org.apache.spark.sql.functions._
      val gs = new GraftSession(s)
      val c = graft.core.Tables(s, dir, "customer")
      val nodes = c.select(
        (col("c_custkey") * 10 + 3).cast("long").as("id"),
        array(lit("customer")).as("labels"),
        col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
      gs.setGraph(graft.core.PropertyGraph(nodes,
        graft.core.PropertyGraph.empty(s).edges))
      gs.cypher("CREATE INDEX cust_bal FOR (n:customer) ON (n.c_acctbal)")
      gs.cypher("CREATE INDEX cust_seg FOR (n:customer) ON (n.c_mktsegment)")
      gs.saveDatabase(
        java.nio.file.Files.createTempDirectory("graft_idx_row_").toString)
      gs
    })

  /** Snapshot-backed session with a COMPOSITE index on (customer,
    * (c_nationkey, c_acctbal)) AND a post-save CREATE riding the
    * delta-log — the r17 delta-composed-routing fixture: the anchored
    * read must stay projection-routed THROUGH the commit (projection
    * ⟵overlay⟶ live delta) and still return the delta-born row. */
  private val idxDeltaCache = new java.util.concurrent.ConcurrentHashMap[String, GraftSession]()
  private def indexedDeltaSession(s: SparkSession, dir: String): GraftSession =
    idxDeltaCache.computeIfAbsent(dir, _ => {
      import org.apache.spark.sql.functions._
      val gs = new GraftSession(s)
      val c = graft.core.Tables(s, dir, "customer")
      val nodes = c.select(
        (col("c_custkey") * 10 + 3).cast("long").as("id"),
        array(lit("customer")).as("labels"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"), col("c_custkey"))
      gs.setGraph(graft.core.PropertyGraph(nodes,
        graft.core.PropertyGraph.empty(s).edges))
      gs.cypher("CREATE INDEX cust_nat_bal FOR (n:customer) ON (n.c_nationkey, n.c_acctbal)")
      gs.saveDatabase(
        java.nio.file.Files.createTempDirectory("gidxd_").toString)
      gs.cypher(
        "CREATE (:customer {c_custkey: 999999, c_nationkey: 5, c_acctbal: 9999.5})")
      gs
    })

  /** Snapshot-backed session over a SKEWED three-label graph —
    * customer (big) → nation (25) → region (5) with IN / OF edges —
    * the statistics-driven join-ordering fixture (r17 verdict #1): the
    * full save seals per-label counts + label partitions, so a
    * multi-hop MATCH written big-label-first must still anchor at the
    * selective end (PlanSpec pins the plan; the rows here grade the
    * ANSWER through the reordered, label-routed plan). */
  private val orderCache = new java.util.concurrent.ConcurrentHashMap[String, GraftSession]()
  private def orderedSession(s: SparkSession, dir: String): GraftSession =
    orderCache.computeIfAbsent(dir, _ => {
      import org.apache.spark.sql.functions._
      val gs = new GraftSession(s)
      def t(n: String) = graft.core.Tables(s, dir, n)
      val cust = t("customer").select(
        (col("c_custkey") * 10 + 3).cast("long").as("id"),
        array(lit("customer")).as("labels"),
        col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"))
      val nat = t("nation").select(
        (col("n_nationkey") * 10 + 1).cast("long").as("id"),
        array(lit("nation")).as("labels"),
        col("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
      val reg = t("region").select(
        (col("r_regionkey") * 10 + 0).cast("long").as("id"),
        array(lit("region")).as("labels"),
        col("r_regionkey"), col("r_name"))
      val nodes = cust.unionByName(nat, allowMissingColumns = true)
        .unionByName(reg, allowMissingColumns = true)
      val inE = t("customer").select(
        (col("c_custkey") * 10 + 3).cast("long").as("src"),
        (col("c_nationkey") * 10 + 1).cast("long").as("dst"),
        lit("IN").as("relType"))
      val ofE = t("nation").select(
        (col("n_nationkey") * 10 + 1).cast("long").as("src"),
        (col("n_regionkey") * 10 + 0).cast("long").as("dst"),
        lit("OF").as("relType"))
      val edges = inE.unionByName(ofE)
        .withColumn("eid", graft.core.GraphViews.viewEid)
      gs.setGraph(graft.core.PropertyGraph(nodes, edges))
      gs.saveDatabase(
        java.nio.file.Files.createTempDirectory("gord_").toString)
      gs
    })

  private def q(name: String, oracle: String)(cypher: String): QueryDef =
    sql(name, oracle) { (s, dir) => session(s, dir).cypher(cypher) }

  private def qp(name: String, oracle: String)(cypher: String, params: Map[String, Any]): QueryDef =
    sql(name, oracle) { (s, dir) => session(s, dir).cypher(cypher, params) }

  def all: Seq[QueryDef] = Seq(

    // C3: one-hop pattern expand = label filter ⋈ edges ⋈ label filter
    q("cy_match_expand",
      """SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey""".stripMargin)(
      "MATCH (c:customer)-[:PLACED]->(o:order) RETURN c.c_name AS c_name, o.o_orderkey AS o_orderkey"),

    // C4 + C7: inline property predicate + WHERE on matched values
    q("cy_prop_filter",
      """SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey, o.o_totalprice AS price
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 150000""".stripMargin)(
      """MATCH (c:customer {c_mktsegment:'BUILDING'})-[:PLACED]->(o:order)
        |WHERE o.o_totalprice > 150000
        |RETURN c.c_name AS c_name, o.o_orderkey AS o_orderkey, o.o_totalprice AS price""".stripMargin),

    // Neo4j 5 label expression + inline pattern WHERE: the `:A|B`
    // disjunction scans the union node table once with an OR over the
    // labels array (one predicate, not two scans unioned), and the
    // inline WHERE is pattern-scoped exactly like a clause WHERE
    q("cy_label_expr",
      """WITH e AS (
        |  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000)
        |SELECT n.n_name AS n_name, count(*) AS n_rich
        |FROM e JOIN nation n ON n.n_nationkey = e.nk
        |GROUP BY n.n_name""".stripMargin)(
      """MATCH (e:customer|supplier WHERE e.c_acctbal > 9000 OR e.s_acctbal > 9000)-[:IN]->(n:nation)
        |RETURN n.n_name AS n_name, count(e) AS n_rich""".stripMargin),

    // Same pattern driven through the $parameter surface (the ref
    // driver passes a param map on every session.run — DatabaseIO
    // .java:121-132): inline-prop param + WHERE param + IN-list param.
    qp("cy_param_filter",
      """SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'AUTOMOBILE' AND o.o_totalprice > 200000
        |  AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin)(
      """MATCH (c:customer {c_mktsegment: $seg})-[:PLACED]->(o:order)
        |WHERE o.o_totalprice > $minprice AND o.o_orderpriority IN $prios
        |RETURN c.c_name AS c_name, o.o_orderkey AS o_orderkey""".stripMargin,
      Map("seg" -> "AUTOMOBILE", "minprice" -> 200000,
        "prios" -> Seq("1-URGENT", "2-HIGH"))),

    // C6: multi-column RETURN projection with property access
    q("cy_return_proj",
      """SELECT c.c_name AS c_name, n.n_name AS n_name
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 100""".stripMargin)(
      """MATCH (c:customer)-[:IN]->(n:nation) WHERE c.c_custkey <= 100
        |RETURN c.c_name AS c_name, n.n_name AS n_name""".stripMargin),

    // C16: aggregation over matched rows, grouped + counted
    q("cy_agg_count",
      """SELECT n.n_name AS n_name, count(*) AS n_cust
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin)(
      "MATCH (c:customer)-[:IN]->(n:nation) RETURN n.n_name AS n_name, count(c) AS n_cust"),

    // C16 string form: sorted collect (ref DatabaseIO.java:76-82)
    sql("cy_agg_collect",
      """SELECT n.n_name AS n_name, string_agg(c.c_name, ',' ORDER BY c.c_name) AS names
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 100 GROUP BY n.n_name""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      session(s, dir).cypher(
        """MATCH (c:customer)-[:IN]->(n:nation) WHERE c.c_custkey <= 100
          |RETURN n.n_name AS n_name, collect(c.c_name) AS names""".stripMargin)
        .withColumn("names", array_join(col("names"), ","))
    },

    // COLLECT subquery with ORDER BY … LIMIT: per-outer-row top-k
    // lists built INSIDE the hash aggregate (sorted-struct collect +
    // slice — no window, no extra shuffle). The list is truncated
    // AFTER the explicit ordering, so the oracle's array_agg(… ORDER
    // BY) slice replays it exactly; joined to a string because the
    // driver gate hashes scalar columns.
    sql("cy_collect_orderby",
      """SELECT r.r_name AS r_name,
        |  array_to_string((array_agg(n.n_name ORDER BY n.n_name DESC))[1:3], ',') AS top_nations
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      session(s, dir).cypher(
        """MATCH (r:region)
          |RETURN r.r_name AS r_name,
          |  COLLECT { MATCH (n:nation)-[:IN]->(r)
          |            RETURN n.n_name ORDER BY n.n_name DESC LIMIT 3 } AS top_nations""".stripMargin)
        .withColumn("top_nations", array_join(col("top_nations"), ","))
    },

    // OPTIONAL MATCH = left outer join
    q("cy_optional_match",
      """SELECT c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey <= 1000""".stripMargin)(
      """MATCH (c:customer) WHERE c.c_custkey <= 1000
        |OPTIONAL MATCH (c:customer)-[:PLACED]->(o:order)
        |RETURN c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey""".stripMargin),

    // ORDER BY + LIMIT (top-k via TakeOrderedAndProject)
    q("cy_topk",
      """SELECT o_orderkey, o_totalprice AS price FROM orders
        |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin)(
      """MATCH (o:order) RETURN o.o_orderkey AS o_orderkey, o.o_totalprice AS price
        |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin),

    // var-length path expand *1..2: customer reaches nation (1 hop) and
    // region (2 hops) over IN edges; ids recomputed arithmetically in SQL
    q("cy_varlen_expand",
      """SELECT c_custkey, x_id FROM (
        |  SELECT c.c_custkey AS c_custkey, c.c_nationkey * 10 + 2 AS x_id FROM customer c
        |  UNION
        |  SELECT c.c_custkey AS c_custkey, n.n_regionkey * 10 + 1 AS x_id
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) t
        |WHERE c_custkey <= 2000""".stripMargin)(
      """MATCH (c:customer)-[:IN*1..2]->(x) WHERE c.c_custkey <= 2000
        |RETURN DISTINCT c.c_custkey AS c_custkey, id(x) AS x_id""".stripMargin),

    // UNDIRECTED var-length expand with openCypher relationship-
    // uniqueness (trail) semantics: nations of region 0 at hop 1,
    // their customers/suppliers at hop 2. The start region does NOT
    // reappear at hop 2 — bouncing straight back would re-traverse
    // hop 1's relationship, which trail semantics forbid (per-path
    // edge-set tracking in compileVarHop; until round 8 this was a
    // documented reachability deviation whose oracle carried a
    // `UNION ALL SELECT 1` for the bounce-back row).
    q("cy_varlen_undirected",
      """SELECT DISTINCT x_id FROM (
        |  SELECT n_nationkey * 10 + 2 AS x_id FROM nation WHERE n_regionkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey * 10 + 3 FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE n.n_regionkey = 0
        |  UNION ALL
        |  SELECT s.s_suppkey * 10 + 5 FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey WHERE n.n_regionkey = 0) t
        |ORDER BY x_id""".stripMargin)(
      """MATCH (r:region)-[:IN*1..2]-(x) WHERE r.r_regionkey = 0
        |RETURN DISTINCT id(x) AS x_id ORDER BY x_id""".stripMargin),

    // PER-PATH multiplicity (openCypher row-per-path, no DISTINCT):
    // each customer→order→part trail is its own row, so the count per
    // (customer, part) equals the number of distinct orders carrying
    // that part — σ path counting in compileVarHop, graded against a
    // plain relational replay. (CONTAINS duplicates from repeated
    // (order, part) lineitems share a view eid and collapse to one
    // relationship, hence the DISTINCT projection in the oracle.)
    q("cy_varlen_paths",
      """SELECT c.c_custkey AS ck, l.l_partkey * 10 + 6 AS pid,
        |       CAST(count(*) AS BIGINT) AS n_paths
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |  ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_custkey <= 100
        |GROUP BY 1, 2""".stripMargin)(
      """MATCH (c:customer)-[:PLACED|CONTAINS*2..2]->(pt:part) WHERE c.c_custkey <= 100
        |RETURN c.c_custkey AS ck, id(pt) AS pid, count(*) AS n_paths""".stripMargin),

    // plain path assignment (no shortestPath): accessors are pure
    // projections of the bound fixed-length pattern — length(p) is the
    // hop count, nodes(p)[2] the terminal region id via the 0-based
    // Cypher subscript
    q("cy_path_assign",
      """SELECT c.c_custkey * 10 + 3 AS cid, CAST(2 AS BIGINT) AS len,
        |       n.n_regionkey * 10 + 1 AS rid
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.c_custkey <= 1000""".stripMargin)(
      """MATCH p = (c:customer)-[:IN]->(n:nation)-[:IN]->(r:region)
        |WHERE c.c_custkey <= 1000
        |RETURN id(c) AS cid, length(p) AS len, nodes(p)[2] AS rid""".stripMargin),

    // VAR-LENGTH path assignment (r11 verdict #4): `p = (c)-[*1..2]->`
    // binds each bounded trail as its own row with ORDERED accessors —
    // nodes(p)[1] is the interior node, so the oracle can distinguish
    // two same-endpoint paths through different orders. compileVarPath
    // enumerates (output-proportional), the oracle replays hop-1 and
    // hop-2 as a UNION ALL (the bounded recursive-CTE expansion,
    // unrolled) with DISTINCT (order, part) because parallel lineitem
    // rows share a view eid and collapse to one logical relationship.
    q("cy_varlen_path_assign",
      """SELECT ck, len, xid, mid, CAST(count(*) AS BIGINT) AS n_paths FROM (
        |  SELECT c.c_custkey AS ck, CAST(1 AS BIGINT) AS len,
        |         o.o_orderkey * 10 + 4 AS xid, o.o_orderkey * 10 + 4 AS mid
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey <= 20
        |  UNION ALL
        |  SELECT c.c_custkey, CAST(2 AS BIGINT), l.l_partkey * 10 + 6,
        |         o.o_orderkey * 10 + 4
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE c.c_custkey <= 20) t
        |GROUP BY 1, 2, 3, 4""".stripMargin)(
      """MATCH p = (c:customer)-[:PLACED|CONTAINS*1..2]->(x) WHERE c.c_custkey <= 20
        |RETURN c.c_custkey AS ck, length(p) AS len, id(x) AS xid,
        |       nodes(p)[1] AS mid, count(*) AS n_paths""".stripMargin),

    // OPTIONAL MATCH over a var-length BOUND path (r12 verdict #5):
    // customers with no orders are the natural miss partition (~1/3 of
    // TPC-H customers) — they emit exactly ONE row with a null path
    // (null length/endpoint), while matched customers keep openCypher
    // per-path multiplicity. Left-outer of the enumerated trail set,
    // seeded only by the bound starts (compileVarPath optional arm).
    q("cy_varlen_path_optional",
      """SELECT ck, len, xid, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT c.c_custkey AS ck, CAST(2 AS BIGINT) AS len,
        |         l.l_partkey * 10 + 6 AS xid
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE c.c_custkey <= 30
        |  UNION ALL
        |  SELECT c.c_custkey, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM customer c
        |  WHERE c.c_custkey <= 30 AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        |      ON l.l_orderkey = o.o_orderkey
        |    WHERE o.o_custkey = c.c_custkey)) t
        |GROUP BY 1, 2, 3""".stripMargin)(
      """MATCH (c:customer) WHERE c.c_custkey <= 30
        |OPTIONAL MATCH p = (c)-[:PLACED|CONTAINS*2..2]->(x)
        |RETURN c.c_custkey AS ck, length(p) AS len, id(x) AS xid,
        |       count(*) AS n""".stripMargin),

    // Existence subquery in a bound-path WHERE (r12 verdict #7): the
    // EXISTS applies AFTER the trail join as the plain-MATCH semi
    // join. `(x)-[:CONTAINS]->(:part)` holds only for order endpoints
    // (every order carries lineitems), so it keeps every 1-hop path
    // and kills the whole 2-hop (part-endpoint) partition — a broken
    // or ignored EXISTS shows up as extra len-2 rows.
    q("cy_varlen_exists_where",
      """SELECT c.c_custkey AS ck, CAST(1 AS BIGINT) AS len,
        |       o.o_orderkey * 10 + 4 AS xid, CAST(count(*) AS BIGINT) AS n_paths
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey <= 20
        |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |GROUP BY 1, 2, 3""".stripMargin)(
      """MATCH p = (c:customer)-[:PLACED|CONTAINS*1..2]->(x)
        |WHERE c.c_custkey <= 20 AND EXISTS { (x)-[:CONTAINS]->(:part) }
        |RETURN c.c_custkey AS ck, length(p) AS len, id(x) AS xid,
        |       count(*) AS n_paths""".stripMargin),

    // two-hop chained pattern across three node sets
    q("cy_two_hop",
      """SELECT n.n_name AS n_name, r.r_name AS r_name, count(*) AS n_supp
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY n.n_name, r.r_name""".stripMargin)(
      """MATCH (s:supplier)-[:IN]->(n:nation)-[:IN]->(r:region)
        |RETURN n.n_name AS n_name, r.r_name AS r_name, count(s) AS n_supp""".stripMargin),

    // WITH pipeline: filter on aggregated value (HAVING shape)
    q("cy_with_having",
      """SELECT nk, n FROM (
        |  SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY c_nationkey) t
        |WHERE n > 10""".stripMargin)(
      """MATCH (c:customer) WITH c.c_nationkey AS nk, count(c) AS n WHERE n > 10
        |RETURN nk, n""".stripMargin),

    // Pattern predicate under OR: compiles to an exists-flag marker
    // join (not a semi join — the disjunction needs the flag as a
    // first-class boolean). Both disjuncts contribute: customers with
    // a finished order, plus negative-balance customers without one.
    q("cy_pattern_or",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |   OR c.c_acctbal < 0
        |ORDER BY c_custkey""".stripMargin)(
      """MATCH (c:customer) WHERE (c)-[:PLACED]->(:order {o_orderstatus:'F'}) OR c.c_acctbal < 0
        |RETURN c.c_custkey AS c_custkey, c.c_name AS c_name ORDER BY c_custkey""".stripMargin),

    // EXISTS { } existential subquery with inner WHERE: semi join
    // against the compiled sub-pattern on the shared variable's id.
    q("cy_exists_subquery",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)(
      """MATCH (c:customer)
        |WHERE EXISTS { (c)-[:PLACED]->(o:order) WHERE o.o_totalprice > 300000 }
        |RETURN c.c_custkey AS c_custkey, c.c_name AS c_name ORDER BY c_custkey""".stripMargin),

    // COUNT { } subquery under a comparison: grouped count left-joined
    // back (absent = 0), then an ordinary filter column.
    q("cy_count_subquery",
      """SELECT c_custkey, n_orders FROM (
        |  SELECT c.c_custkey AS c_custkey,
        |         (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |  FROM customer c) t
        |WHERE n_orders >= 18 ORDER BY c_custkey""".stripMargin)(
      """MATCH (c:customer)
        |WHERE COUNT { (c)-[:PLACED]->(:order) } >= 18
        |RETURN c.c_custkey AS c_custkey,
        |       COUNT { (c)-[:PLACED]->(:order) } AS n_orders
        |ORDER BY c_custkey""".stripMargin),

    // Quantified path pattern (Neo4j 5 QPP, r19): `((x)-[:IN]->(y)){2,2}`
    // desugars onto the var-length trail machinery — exactly-two IN hops
    // walk customer → nation → region. Oracle: the equivalent static
    // two-join with the graph view's region node-id encoding.
    q("cy_qpp",
      """SELECT c.c_custkey AS c_custkey,
        |  CAST(n.n_regionkey * 10 + 1 AS BIGINT) AS node_id
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 100""".stripMargin)(
      """MATCH (c:customer) ((x)-[:IN]->(y)){2,2} (r) WHERE c.c_custkey <= 100
        |RETURN c.c_custkey AS c_custkey, id(r) AS node_id""".stripMargin),

    // shortestPath: BFS first-hit distances over IN edges — customer
    // reaches its nation at 1 hop, its region at 2.
    q("cy_shortest_path",
      """SELECT c_custkey, c_nationkey * 10 + 2 AS node_id, CAST(1 AS BIGINT) AS dist
        |FROM customer WHERE c_custkey <= 500
        |UNION ALL
        |SELECT c.c_custkey, n.n_regionkey * 10 + 1 AS node_id, CAST(2 AS BIGINT) AS dist
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 500""".stripMargin)(
      """MATCH p = shortestPath((c:customer)-[:IN*1..4]->(x)) WHERE c.c_custkey <= 500
        |RETURN c.c_custkey AS c_custkey, id(x) AS node_id, length(p) AS dist""".stripMargin),

    // allShortestPaths: one row per shortest path — customers reach
    // every part of their orders at distance 2 (PLACED then CONTAINS),
    // and the path count per part is the number of distinct orders
    // containing it. The BFS keeps per-path rows (not the single
    // lexicographic witness), so count(*) IS the σ path count.
    q("cy_all_shortest",
      """SELECT l.l_partkey AS pk, CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_paths
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_custkey = 1
        |GROUP BY 1""".stripMargin)(
      """MATCH p = allShortestPaths((c:customer {c_custkey: 1})-[:PLACED|CONTAINS*..2]->(pt:part))
        |RETURN pt.p_partkey AS pk, count(*) AS n_paths""".stripMargin),

    // C8 introspection through the graded path: CALL … YIELD over the
    // graph view's label set (derived from data, constant per view).
    q("cy_call_labels",
      """SELECT label FROM (VALUES ('customer'), ('nation'), ('order'),
        |  ('part'), ('region'), ('supplier')) t(label) ORDER BY label""".stripMargin)(
      "CALL db.labels() YIELD label RETURN label ORDER BY label"),

    // String predicates: STARTS WITH / ENDS WITH / CONTAINS compile to
    // startsWith/endsWith/contains — all pushdown-eligible scan filters.
    q("cy_string_pred",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE 'red %'
        |   OR (p_name LIKE '% bolt' AND p_type LIKE '%ECO%')
        |ORDER BY p_partkey""".stripMargin)(
      """MATCH (p:part)
        |WHERE p.p_name STARTS WITH 'red ' OR
        |      (p.p_name ENDS WITH ' bolt' AND p.p_type CONTAINS 'ECO')
        |RETURN p.p_partkey AS p_partkey, p.p_name AS p_name ORDER BY p_partkey""".stripMargin),

    // `=~` regex predicate: Cypher full-match semantics (anchored
    // non-capturing group over Spark's find()-style rlike).
    q("cy_regex",
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_full_match(c_name, 'Customer#0{6}1[0-9]{2}')
        |ORDER BY c_custkey""".stripMargin)(
      """MATCH (c:customer) WHERE c.c_name =~ 'Customer#0{6}1[0-9]{2}'
        |RETURN c.c_custkey AS c_custkey, c.c_name AS c_name ORDER BY c_custkey""".stripMargin),

    // Undirected hop: `-[:IN]-` matches either orientation — nation
    // touches its customers + suppliers (incoming) and its region
    // (outgoing) through one symmetrized edge set.
    q("cy_undirected",
      """SELECT n.n_name AS n_name,
        |  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
        |  + (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
        |  + 1 AS n_neighbors
        |FROM nation n ORDER BY n_name""".stripMargin)(
      """MATCH (n:nation)-[:IN]-(x)
        |RETURN n.n_name AS n_name, count(x) AS n_neighbors ORDER BY n_name""".stripMargin),

    // Multi-type hop `[:CONTAINS|SUPPLIED]`: one isin() filter over the
    // edge set — both lineitem-derived edge types end at part.
    q("cy_multi_type",
      """SELECT p_partkey, count(*) AS n_in FROM (
        |  SELECT l_partkey AS p_partkey FROM lineitem
        |  UNION ALL SELECT l_partkey FROM lineitem) t
        |WHERE p_partkey <= 200 GROUP BY p_partkey ORDER BY p_partkey""".stripMargin)(
      """MATCH (x)-[:CONTAINS|SUPPLIED]->(p:part) WHERE p.p_partkey <= 200
        |RETURN p.p_partkey AS p_partkey, count(x) AS n_in ORDER BY p_partkey""".stripMargin),

    // count(DISTINCT expr) in RETURN: distinct hash aggregate.
    q("cy_agg_distinct",
      """SELECT o.o_orderpriority AS pri, count(DISTINCT c.c_nationkey) AS n_nations
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY pri""".stripMargin)(
      """MATCH (c:customer)-[:PLACED]->(o:order)
        |RETURN o.o_orderpriority AS pri, count(DISTINCT c.c_nationkey) AS n_nations
        |ORDER BY pri""".stripMargin),

    // Path projection beyond length(p): nodes(p) yields the witness
    // path's node-id array (lexicographically smallest shortest path —
    // deterministic, hashable), and `[x IN nodes(p) | x.prop]`
    // projects a property per path node via explode+join+regroup (a
    // transform() lambda cannot read the node table). Customer →
    // nation → region is the unique 2-hop IN path, so the oracle
    // reconstructs ids arithmetically; n_name exists only on the
    // middle node — absent-property nulls render as '?', openCypher
    // null semantics kept visible.
    sql("cy_path_nodes",
      """SELECT c.c_custkey AS ck,
        |  CAST(c.c_custkey*10+3 AS VARCHAR) || '->' ||
        |  CAST(n.n_nationkey*10+2 AS VARCHAR) || '->' ||
        |  CAST(n.n_regionkey*10+1 AS VARCHAR) AS path_ids,
        |  '?->' || n.n_name || '->?' AS names
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 100 AND n.n_regionkey = 0""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      session(s, dir).cypher(
        """MATCH p = shortestPath((c:customer)-[:IN*1..2]->(r:region))
          |WHERE c.c_custkey <= 100 AND r.r_regionkey = 0
          |RETURN c.c_custkey AS ck, nodes(p) AS path_ids,
          |  [x IN nodes(p) | x.n_name] AS names""".stripMargin)
        .withColumn("path_ids", array_join(col("path_ids").cast("array<string>"), "->"))
        .withColumn("names", array_join(col("names"), "->", "?"))
    },

    // relationships(p) over a LEFT-directed shortestPath: the witness
    // array is in traversal order (region → nation → customer here),
    // but every emitted (src, dst) must be the STORED edge orientation
    // (customer-IN->nation, nation-IN->region) — the oracle string
    // would flip if relationships(p) ever echoed traversal order for a
    // <- pattern (the pre-round-8 bug this row pins).
    sql("cy_path_rels",
      """SELECT c.c_custkey AS ck,
        |  CAST(n.n_nationkey*10+2 AS VARCHAR) || '-IN->' ||
        |  CAST(n.n_regionkey*10+1 AS VARCHAR) || ';' ||
        |  CAST(c.c_custkey*10+3 AS VARCHAR) || '-IN->' ||
        |  CAST(n.n_nationkey*10+2 AS VARCHAR) AS rels
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 100 AND n.n_regionkey = 0""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col, concat, lit, transform}
      session(s, dir).cypher(
        """MATCH p = shortestPath((r:region)<-[:IN*1..2]-(c:customer))
          |WHERE c.c_custkey <= 100 AND r.r_regionkey = 0
          |RETURN c.c_custkey AS ck, relationships(p) AS rels""".stripMargin)
        .withColumn("rels", array_join(
          transform(col("rels"), x => concat(
            x.getField("src").cast("string"), lit("-"), x.getField("relType"),
            lit("->"), x.getField("dst").cast("string"))), ";"))
    },

    // Bulk upsert — `UNWIND $batch AS row MERGE … ON CREATE SET … ON
    // MATCH SET …`, the reference client surface's #1 write idiom
    // (every Bolt driver batches writes as a parameter map on
    // session.run — ref DatabaseIO.java:121-132). 1500 keys, half
    // pre-existing: ONE update-by-join marks the hits, ONE anti-join
    // append creates the misses — constant plan depth in the batch
    // size. Runs on a FRESH session (the shared cached graph must not
    // see the mutation); the oracle recomputes the hit/miss split
    // from the raw customer table.
    sql("cy_unwind_merge",
      """WITH batch AS (
        |  SELECT range AS k, range * 7 AS bal FROM range(1, 3000, 2)),
        |tag AS (
        |  SELECT b.k, b.bal, c.c_custkey IS NOT NULL AS hit
        |  FROM batch b LEFT JOIN customer c ON c.c_custkey = b.k)
        |SELECT CASE WHEN hit THEN 'old' ELSE 'new' END AS src,
        |  count(*) AS n, CAST(sum(bal) AS BIGINT) AS total
        |FROM tag GROUP BY 1""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val batch = (1L until 3000L by 2L).map(k => Map("k" -> k, "bal" -> k * 7))
      gs.cypher(
        """UNWIND $batch AS row MERGE (c:customer {c_custkey: row.k})
          |ON CREATE SET c.src = 'new', c.bal2 = row.bal
          |ON MATCH SET c.src = 'old', c.bal2 = row.bal""".stripMargin,
        Map("batch" -> batch))
      gs.cypher(
        """MATCH (c:customer) WHERE c.src IS NOT NULL
          |RETURN c.src AS src, count(c) AS n, sum(c.bal2) AS total""".stripMargin)
    },

    // Batched relationship upsert — `UNWIND $batch AS row MATCH (a),
    // (b) MERGE (a)-[:T]->(b)`, the second half of the Bolt batch
    // idiom: endpoints bind by business key via broadcast equi-joins
    // of the batch against the node table (MATCH semantics), then one
    // anti-join appends the missing edges and one update-by-join
    // marks the hits. 200 (customer, nation) pairs; a pair hits iff
    // it is the customer's real nation — the oracle recomputes the
    // split from the raw tables.
    sql("cy_unwind_rel_merge",
      """WITH batch AS (SELECT range AS s, range % 25 AS d FROM range(1, 201)),
        |hits AS (SELECT (c.c_nationkey = b.d) AS hit
        |         FROM batch b JOIN customer c ON c.c_custkey = b.s)
        |SELECT
        |  CAST((SELECT count(*) FROM customer) +
        |       sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_edges,
        |  CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_created,
        |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
        |FROM hits""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val batch = (1L to 200L).map(k => Map("s" -> k, "d" -> (k % 25)))
      gs.cypher(
        """UNWIND $batch AS row
          |MATCH (c:customer {c_custkey: row.s}), (n:nation {n_nationkey: row.d})
          |MERGE (c)-[r:IN]->(n) ON CREATE SET r.f = 1 ON MATCH SET r.m = 1""".stripMargin,
        Map("batch" -> batch))
      gs.cypher(
        """MATCH (c:customer)-[r:IN]->(n:nation)
          |RETURN count(c) AS n_edges,
          |  sum(CASE WHEN r.f = 1 THEN 1 ELSE 0 END) AS n_created,
          |  sum(CASE WHEN r.m = 1 THEN 1 ELSE 0 END) AS n_matched""".stripMargin)
    },

    // relationships(p) over an UNDIRECTED shortestPath: the traversed
    // orientation is unknowable from node ids, so each hop is resolved
    // against the stored edge table (addPathRelsCol) — the oracle
    // encodes the STORED orientations (customer-IN->nation,
    // nation-IN->region), which an implementation echoing traversal
    // order (region → nation → customer here) would flip.
    sql("cy_path_rels_undirected",
      """SELECT c.c_custkey AS ck,
        |  CAST(n.n_nationkey*10+2 AS VARCHAR) || '-IN->' ||
        |  CAST(n.n_regionkey*10+1 AS VARCHAR) || ';' ||
        |  CAST(c.c_custkey*10+3 AS VARCHAR) || '-IN->' ||
        |  CAST(n.n_nationkey*10+2 AS VARCHAR) AS rels
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 100 AND n.n_regionkey = 0""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col, concat, lit, transform}
      session(s, dir).cypher(
        """MATCH p = shortestPath((r:region)-[:IN*2..2]-(c:customer))
          |WHERE c.c_custkey <= 100 AND r.r_regionkey = 0
          |RETURN c.c_custkey AS ck, relationships(p) AS rels""".stripMargin)
        .withColumn("rels", array_join(
          transform(col("rels"), x => concat(
            x.getField("src").cast("string"), lit("-"), x.getField("relType"),
            lit("->"), x.getField("dst").cast("string"))), ";"))
    },

    // Multi-hop MERGE — `UNWIND $batch MATCH …, …, … MERGE
    // (s)-[:VOUCHES]->(n)-[:BADGED]->(r)`: whole-pattern match-or-
    // create across two relationships in one batch (per-hop semi-join
    // existence, one anti-join append per hop). First call creates
    // every hop (fresh rel types); the second call finds every full
    // pattern present and ON MATCH-marks only the BADGED hop. The
    // oracle recomputes both cardinalities from the raw tables —
    // VOUCHES pairs are unique per supplier, BADGED pairs dedupe to
    // the distinct (nation, region) combinations.
    sql("cy_merge_path",
      """WITH batch AS (SELECT range AS a, range % 25 AS b, range % 5 AS c
        |               FROM range(1, 101)),
        |m AS (SELECT bt.a, bt.b, bt.c FROM batch bt
        |      JOIN supplier s ON s.s_suppkey = bt.a
        |      JOIN nation n ON n.n_nationkey = bt.b
        |      JOIN region r ON r.r_regionkey = bt.c)
        |SELECT CAST(count(*) AS BIGINT) AS n_vouches,
        |  CAST(count(*) AS BIGINT) AS v_created,
        |  CAST(count(DISTINCT b || ':' || c) AS BIGINT) AS n_badges,
        |  CAST(count(DISTINCT b || ':' || c) AS BIGINT) AS b_marked
        |FROM m""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val batch = (1L to 100L).map(k => Map("a" -> k, "b" -> (k % 25), "c" -> (k % 5)))
      val merge =
        """UNWIND $batch AS row
          |MATCH (s:supplier {s_suppkey: row.a}), (n:nation {n_nationkey: row.b}),
          |      (r:region {r_regionkey: row.c})
          |MERGE (s)-[x:VOUCHES]->(n)-[y:BADGED]->(r)""".stripMargin
      gs.cypher(s"$merge ON CREATE SET x.f = 1", Map("batch" -> batch))
      gs.cypher(s"$merge ON MATCH SET y.m = 1", Map("batch" -> batch))
      val v = gs.cypher(
        """MATCH (s:supplier)-[x:VOUCHES]->(n:nation)
          |RETURN count(x) AS n_vouches,
          |  sum(CASE WHEN x.f = 1 THEN 1 ELSE 0 END) AS v_created""".stripMargin)
      val b = gs.cypher(
        """MATCH (n:nation)-[y:BADGED]->(r:region)
          |RETURN count(y) AS n_badges,
          |  sum(CASE WHEN y.m = 1 THEN 1 ELSE 0 END) AS b_marked""".stripMargin)
      v.crossJoin(b)
    },

    // apoc.periodic.iterate graded end to end (previously PacksSpec
    // only): the batch driver streams nation rows through 10-row
    // batches, each batch ONE distributed `UNWIND $_batch … MERGE`
    // Edge delta-log burst — FIVE successive batched relationship
    // MERGEs with growing, overlapping batches: call i upserts keys
    // 1..20+10i, so early keys hit every later call and ON MATCH
    // increments their counter through the eid-keyed delta overlay
    // (latest-wins fold per commit, base never rewritten —
    // GraftSession.mergeRelFromBindings). The read-back sums the
    // counters; the oracle computes each key's expected count = the
    // number of calls whose range covered it.
    // Unbounded var-length reachability `[:T*]` — the first query a
    // graph user types (r13 verdict #2; the GDS pack the reference
    // image ships is reachability-first, neo4j-plugins.json:24-30).
    // The graph is a CYCLE-RICH double functional map over suppliers
    // (k → 2k mod 61 and k → 3k mod 61), so termination needs the
    // visited-set fixpoint, not a hop cap; the oracle replays it as a
    // DuckDB recursive CTE with NO hop bound (UNION dedup = the same
    // visited set). DISTINCT endpoint semantics on both sides.
    sql("cy_varlen_unbounded",
      """WITH RECURSIVE edges AS (
        |  SELECT s1.s_suppkey AS s, s2.s_suppkey AS t
        |  FROM supplier s1 JOIN supplier s2 ON s2.s_suppkey = (s1.s_suppkey * 2) % 61
        |  WHERE s1.s_suppkey BETWEEN 1 AND 60
        |  UNION
        |  SELECT s1.s_suppkey, s2.s_suppkey
        |  FROM supplier s1 JOIN supplier s2 ON s2.s_suppkey = (s1.s_suppkey * 3) % 61
        |  WHERE s1.s_suppkey BETWEEN 1 AND 60),
        |reach(t) AS (
        |  SELECT t FROM edges WHERE s = 1
        |  UNION
        |  SELECT e.t FROM reach r JOIN edges e ON e.s = r.t)
        |SELECT CAST(t AS BIGINT) AS node FROM reach ORDER BY node""".stripMargin) {
      (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val batch = (1L to 60L).flatMap(k =>
        Seq(Map("a" -> k, "b" -> (k * 2 % 61)), Map("a" -> k, "b" -> (k * 3 % 61))))
      gs.cypher(
        """UNWIND $batch AS row
          |MATCH (a:supplier {s_suppkey: row.a}), (b:supplier {s_suppkey: row.b})
          |MERGE (a)-[:PFLOW]->(b)""".stripMargin, Map("batch" -> batch))
      gs.cypher(
        """MATCH (a:supplier {s_suppkey: 1})-[:PFLOW*]->(b:supplier)
          |RETURN DISTINCT b.s_suppkey AS node ORDER BY node""".stripMargin)
    },

    // Unbounded var-length with a LOWER BOUND `[:T*2..]` — the
    // friends-of-friends-and-beyond shape (r14 verdict #4), served by
    // the bounded-prefix hybrid: length-2 trail prefixes with their
    // edge sets, then walk-reachability from each prefix end avoiding
    // that prefix's edges (CypherCompiler.compileVarHop). The graph is
    // the cycle-rich core plus an ACYCLIC TAIL 90→91→1 anchored at 90:
    // node 91 is reachable ONLY by the length-1 trail (its sole
    // in-edge is the anchor's own first hop), so it must be absent —
    // exactly the case a hop-capped walk CTE also excludes, which
    // makes the DuckDB replay a faithful oracle here. Hop counts cap
    // at 2 (`LEAST(d+1, 2)`) so the recursion's state space stays
    // finite on cycles.
    sql("cy_varlen_lower_unbounded",
      """WITH RECURSIVE edges AS (
        |  SELECT s1.s_suppkey AS s, s2.s_suppkey AS t
        |  FROM supplier s1 JOIN supplier s2 ON s2.s_suppkey = (s1.s_suppkey * 2) % 61
        |  WHERE s1.s_suppkey BETWEEN 1 AND 60
        |  UNION
        |  SELECT s1.s_suppkey, s2.s_suppkey
        |  FROM supplier s1 JOIN supplier s2 ON s2.s_suppkey = (s1.s_suppkey * 3) % 61
        |  WHERE s1.s_suppkey BETWEEN 1 AND 60
        |  UNION SELECT 90, 91
        |  UNION SELECT 91, 1),
        |reach(t, d) AS (
        |  SELECT t, 1 FROM edges WHERE s = 90
        |  UNION
        |  SELECT e.t, LEAST(r.d + 1, 2) FROM reach r JOIN edges e ON e.s = r.t)
        |SELECT DISTINCT CAST(t AS BIGINT) AS node FROM reach WHERE d >= 2
        |ORDER BY node""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val batch = (1L to 60L).flatMap(k =>
        Seq(Map("a" -> k, "b" -> (k * 2 % 61)), Map("a" -> k, "b" -> (k * 3 % 61)))) ++
        Seq(Map("a" -> 90L, "b" -> 91L), Map("a" -> 91L, "b" -> 1L))
      gs.cypher(
        """UNWIND $batch AS row
          |MATCH (a:supplier {s_suppkey: row.a}), (b:supplier {s_suppkey: row.b})
          |MERGE (a)-[:PFLOW]->(b)""".stripMargin, Map("batch" -> batch))
      gs.cypher(
        """MATCH (a:supplier {s_suppkey: 90})-[:PFLOW*2..]->(b:supplier)
          |RETURN DISTINCT b.s_suppkey AS node ORDER BY node""".stripMargin)
    },

    // LOAD CSV end to end — the reference's /import bulk channel
    // (docker-entrypoint.sh:502-505). The customer table round-trips
    // through a CSV file on disk and STREAMS back in bounded driver
    // batches (USING PERIODIC COMMIT 10000 — toLocalIterator, never a
    // whole-file collect, so driver memory is flat in the file size
    // while work scales ~linearly with it) as :csvc nodes; the
    // read-back aggregates the untyped string properties (LOAD CSV is
    // untyped text, Neo4j semantics). Oracle recomputes from the raw
    // parquet the CSV was derived from.
    sql("cy_load_csv",
      """SELECT CAST(count(*) AS BIGINT) AS n, min(c_name) AS lo, max(c_name) AS hi
        |FROM customer""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      // per-process dir: two concurrent harness JVMs must never share
      // the staged CSV (a half-overwritten directory flakes the read)
      val csvDir = s"${System.getProperty("java.io.tmpdir")}/graft_loadcsv_" +
        Integer.toHexString(dir.hashCode) + "_" + ProcessHandle.current().pid()
      graft.core.SnapshotStore.deleteDir(csvDir)
      s.read.parquet(s"$dir/customer.parquet").select("c_custkey", "c_name")
        .write.mode("overwrite").option("header", "true").csv(csvDir)
      gs.cypher(s"USING PERIODIC COMMIT 10000 LOAD CSV WITH HEADERS FROM " +
        s"'file://$csvDir' AS row CREATE (c:csvc {k: row.c_custkey, name: row.c_name})")
      gs.cypher("MATCH (c:csvc) RETURN count(c) AS n, min(c.name) AS lo, max(c.name) AS hi")
    },

    // Headerless LOAD CSV (r14 verdict #6): rows arrive as string
    // LISTS with positional `row[i]` access, plus the linenumber()/
    // file() metadata functions. min/max of linenumber() are
    // order-independent (1 and the row count) so the gate holds even
    // though the multi-part CSV directory has no deterministic row
    // order; file() round-trips as a property on every node.
    sql("cy_load_csv_headerless",
      """SELECT CAST(count(*) AS BIGINT) AS n, min(c_name) AS lo, max(c_name) AS hi,
        |  CAST(1 AS BIGINT) AS ln_min, CAST(count(*) AS BIGINT) AS ln_max
        |FROM customer""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      val csvDir = s"${System.getProperty("java.io.tmpdir")}/graft_loadcsvh_" +
        Integer.toHexString(dir.hashCode) + "_" + ProcessHandle.current().pid()
      graft.core.SnapshotStore.deleteDir(csvDir)
      s.read.parquet(s"$dir/customer.parquet").select("c_custkey", "c_name")
        .write.mode("overwrite").option("header", "false").csv(csvDir)
      gs.cypher(s"USING PERIODIC COMMIT 10000 LOAD CSV FROM 'file://$csvDir' AS row " +
        "CREATE (c:csvh {k: row[0], name: row[1], ln: linenumber()})")
      gs.cypher("MATCH (c:csvh) RETURN count(c) AS n, min(c.name) AS lo, " +
        "max(c.name) AS hi, min(c.ln) AS ln_min, max(c.ln) AS ln_max")
    },

    sql("cy_rel_upsert_burst",
      """WITH calls AS (SELECT range AS i FROM range(0, 5)),
        |keys AS (SELECT range AS a FROM range(1, 61)),
        |m AS (SELECT k.a, count(*) AS c
        |      FROM keys k JOIN calls i ON k.a <= 20 + 10 * i.i
        |      JOIN supplier s ON s.s_suppkey = k.a GROUP BY k.a)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST(sum(c) AS BIGINT) AS total_c,
        |  CAST(max(c) AS BIGINT) AS max_c
        |FROM m""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      (0 to 4).foreach { i =>
        val batch = (1L to (20L + 10L * i)).map(k => Map("a" -> k, "b" -> (k % 25)))
        gs.cypher(
          """UNWIND $batch AS row
            |MATCH (v:supplier {s_suppkey: row.a}), (n:nation {n_nationkey: row.b})
            |MERGE (v)-[x:VB]->(n) ON CREATE SET x.c = 1 ON MATCH SET x.c = x.c + 1""".stripMargin,
          Map("batch" -> batch))
      }
      gs.cypher(
        """MATCH (:supplier)-[x:VB]->(:nation)
          |RETURN count(x) AS n_edges, sum(x.c) AS total_c, max(x.c) AS max_c""".stripMargin)
    },

    // Tombstone DELETE burst — the right-to-be-forgotten shape: mint
    // VD edges for suppliers 1..60, then a targeted DELETE pass
    // (every 3rd supplier's edge) folds as tombstones into the edge
    // delta (base never rewritten, GraftSession.mutateSetDelete),
    // and one node DETACH DELETE
    // (supplier 7) tombstones the node plus its surviving edge. The
    // read-back counts what remains; the oracle replays the set
    // arithmetic on the raw tables.
    sql("cy_delete_burst",
      """WITH keys AS (SELECT range AS a FROM range(1, 61)),
        |m AS (SELECT k.a FROM keys k JOIN supplier s ON s.s_suppkey = k.a),
        |kept AS (SELECT a FROM m WHERE a % 3 <> 0 AND a <> 7)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST((SELECT count(*) FROM m WHERE a <> 7) AS BIGINT) AS n_sup
        |FROM kept""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val batch = (1L to 60L).map(k => Map("a" -> k, "b" -> (k % 25)))
      gs.cypher(
        """UNWIND $batch AS row
          |MATCH (v:supplier {s_suppkey: row.a}), (n:nation {n_nationkey: row.b})
          |MERGE (v)-[x:VD]->(n)""".stripMargin, Map("batch" -> batch))
      gs.cypher("MATCH (v:supplier)-[x:VD]->() WHERE v.s_suppkey % 3 = 0 DELETE x")
      gs.cypher("MATCH (v:supplier {s_suppkey: 7}) DETACH DELETE v")
      val e = gs.cypher("MATCH (:supplier)-[x:VD]->(:nation) RETURN count(x) AS n_edges")
      val v = gs.cypher(
        "MATCH (v:supplier) WHERE v.s_suppkey >= 1 AND v.s_suppkey <= 60 " +
          "RETURN count(v) AS n_sup")
      e.crossJoin(v)
    },

    // Write-then-read-back: `MATCH … SET … RETURN` binds at entry and
    // projects the post-write values in one statement (the openCypher
    // write-clause visibility rule). Fresh session per call so the
    // mutation never leaks into sibling rows; the oracle recomputes
    // the written expression from the raw table.
    sql("cy_set_return",
      """SELECT n_name, CAST(n_regionkey * 2 + 1 AS BIGINT) AS flag
        |FROM nation""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher(
        """MATCH (n:nation) SET n.flag = n.n_regionkey * 2 + 1
          |RETURN n.n_name AS n_name, n.flag AS flag""".stripMargin)
    },

    // `SET n = {map}` FULL property replace (openCypher; `+=` is the
    // merge form): every nation node's property set becomes exactly
    // the mapped keys — n_regionkey reads back NULL afterwards. The
    // map's values read the node's own pre-write properties. Oracle
    // recomputes the kept columns and pins the nulled one.
    sql("cy_set_replace",
      """SELECT n_name, CAST(n_nationkey AS BIGINT) AS nk,
        |  CAST(NULL AS BIGINT) AS old_rk
        |FROM nation""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher(
        "MATCH (n:nation) SET n = {n_name: n.n_name, n_nationkey: n.n_nationkey}")
      gs.cypher(
        """MATCH (n:nation)
          |RETURN n.n_name AS n_name, n.n_nationkey AS nk, n.n_regionkey AS old_rk""".stripMargin)
    },

    // FOREACH conditional-SET gating idiom — `FOREACH (_ IN CASE WHEN
    // cond THEN [1] ELSE [] END | SET …)` gates the SET on the
    // predicate (the documented desugar; ref uses it in init scripts).
    // Flags high-balance suppliers, reads the flag back; fresh session
    // so the write never leaks into sibling rows.
    sql("cy_foreach_gate",
      """SELECT CAST(count(*) FILTER (WHERE s_acctbal > 5000) AS BIGINT) AS flagged,
        |  CAST(count(*) AS BIGINT) AS total FROM supplier""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher(
        "MATCH (s:supplier) FOREACH (_ IN CASE WHEN s.s_acctbal > 5000 " +
          "THEN [1] ELSE [] END | SET s.flagged = 1)")
      val f = gs.cypher(
        "MATCH (s:supplier) WHERE s.flagged = 1 RETURN count(s) AS flagged")
      val t = gs.cypher("MATCH (s:supplier) RETURN count(s) AS total")
      f.crossJoin(t)
    },

    // WITH-bounded write — `MATCH … WITH n ORDER BY … LIMIT k SET …`,
    // the work-queue batching shape (apoc.periodic.commit's contract):
    // the ORDER BY makes the k-subset deterministic so the oracle can
    // replay it as a SQL ORDER BY/LIMIT subquery.
    sql("cy_with_limit_set",
      """SELECT CAST(count(*) AS BIGINT) AS n_flagged,
        |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum
        |FROM (SELECT s_suppkey FROM supplier ORDER BY s_suppkey LIMIT 20)""".stripMargin) {
      (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher(
        "MATCH (n:supplier) WITH n ORDER BY n.s_suppkey LIMIT 20 SET n.wflag = 1")
      gs.cypher(
        "MATCH (n:supplier) WHERE n.wflag = 1 " +
          "RETURN count(n) AS n_flagged, sum(n.s_suppkey) AS key_sum")
    },

    // db.cdc change feed — updates/creates/deletes read O(delta) off
    // the delta-log overlay and classified against the cursor's
    // allocator watermark. Node ids are deterministic (key*10+tag for
    // updates/deletes; creates are excluded from the id sum — their
    // minted ids depend on the allocator), so the oracle is three
    // closed-form rows.
    sql("cy_cdc_feed",
      """SELECT 'u' AS op,
        |  CAST((SELECT count(*) FROM supplier WHERE s_suppkey <= 3) AS BIGINT) AS n,
        |  CAST((SELECT sum(s_suppkey*10+5) FROM supplier WHERE s_suppkey <= 3)
        |    AS BIGINT) AS id_sum
        |UNION ALL SELECT 'c', CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
        |UNION ALL SELECT 'd', CAST(1 AS BIGINT), CAST(95 AS BIGINT)""".stripMargin) {
      (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val cur = gs.cypher("CALL db.cdc.earliest() YIELD id RETURN id")
        .collect().head.getString(0)
      gs.cypher("MATCH (v:supplier) WHERE v.s_suppkey <= 3 SET v.cdcflag = 1")
      gs.cypher("UNWIND [7001, 7002] AS x MERGE (:cdcnew {k: x})")
      gs.cypher("MATCH (v:supplier {s_suppkey: 9}) DETACH DELETE v")
      gs.cypher(
        s"CALL db.cdc.query('$cur') YIELD op, entity, id WHERE entity = 'node' " +
          "RETURN op, count(*) AS n, " +
          "sum(CASE WHEN op <> 'c' THEN id END) AS id_sum")
    },

    // MERGE … RETURN — the upsert-then-read-back statement: first
    // call creates (ON CREATE), second matches (ON MATCH increments),
    // the returned row reflects the post-write state each time.
    sql("cy_merge_return",
      "SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS c") { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher("MERGE (x:probe {k: 1}) ON CREATE SET x.c = 1 RETURN x.c AS c")
      gs.cypher("MERGE (x:probe {k: 1}) ON MATCH SET x.c = x.c + 1 RETURN x.k AS k, x.c AS c")
    },

    // Key-list batch UPDATE burst — the third verb of the batch-
    // mutation matrix (`UNWIND $rows … MATCH … SET`, routed through
    // the match-only write buffer: isin-pruned lookup, LocalRelation
    // delta, settled keys — GraftSession.mutateUnwindMerge matchOnly).
    // Init pass zeroes a counter for keys 1..60; five successive
    // calls with growing, overlapping batches read-modify-write it
    // (`SET v.hits = v.hits + 1`) and pair a per-element value
    // (`v.tag = row.t`). Expected hits per key = number of covering
    // calls — the same arithmetic the oracle replays from the raw
    // supplier table. Missing keys (beyond the SF's supplier count)
    // are no-ops, never creates: n_upd counts only real suppliers.
    sql("cy_set_burst",
      """WITH calls AS (SELECT range AS i FROM range(0, 5)),
        |keys AS (SELECT range AS a FROM range(1, 61)),
        |m AS (SELECT k.a, count(*) AS c
        |      FROM keys k JOIN calls i ON k.a <= 20 + 10 * i.i
        |      JOIN supplier s ON s.s_suppkey = k.a GROUP BY k.a)
        |SELECT CAST(count(*) AS BIGINT) AS n_upd,
        |  CAST(sum(c) AS BIGINT) AS total_hits,
        |  CAST(max(c) AS BIGINT) AS max_hits,
        |  CAST(sum(a * 10) AS BIGINT) AS tag_sum
        |FROM m""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher(
        "UNWIND $init AS row MATCH (v:supplier {s_suppkey: row.k}) SET v.hits = 0",
        Map("init" -> (1L to 60L).map(k => Map("k" -> k))))
      (0 to 4).foreach { i =>
        val batch = (1L to (20L + 10L * i)).map(k => Map("k" -> k, "t" -> k * 10))
        gs.cypher(
          """UNWIND $batch AS row
            |MATCH (v:supplier {s_suppkey: row.k})
            |SET v.hits = v.hits + 1, v.tag = row.t""".stripMargin,
          Map("batch" -> batch))
      }
      gs.cypher(
        """MATCH (v:supplier) WHERE v.hits IS NOT NULL
          |RETURN count(v) AS n_upd, sum(v.hits) AS total_hits,
          |  max(v.hits) AS max_hits, sum(v.tag) AS tag_sum""".stripMargin)
    },

    // bulk statement minting BELONGS edges; the read-back counts per
    // region and the oracle recomputes from the raw nation table.
    sql("apoc_periodic_iterate",
      """SELECT n_regionkey * 10 + 1 AS rid, CAST(count(*) AS BIGINT) AS n
        |FROM nation GROUP BY 1""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      graft.procs.Packs.install(gs, Seq("apoc"))
      gs.cypher(
        """CALL apoc.periodic.iterate(
          |  'MATCH (n:nation) RETURN n.n_nationkey AS nk, n.n_regionkey AS rk',
          |  'MATCH (a:nation {n_nationkey: row.nk}), (r:region {r_regionkey: row.rk})
          |   MERGE (a)-[:BELONGS]->(r)',
          |  {batchSize: 10}) YIELD batches, total RETURN batches, total""".stripMargin)
        .collect()
      gs.cypher(
        "MATCH (:nation)-[b:BELONGS]->(r:region) RETURN id(r) AS rid, count(b) AS n")
    },

    // apoc.merge.relationship end to end — the dynamic-ETL rel upsert
    // (runtime relType, ident props as pattern literals, endpoint node
    // ids from apoc-style id lookups): 4 supplier→nation links
    // created, 2 re-merged (ON MATCH marks them), all through the
    // buffered eid-keyed rel-upsert path. Oracle replays the counts
    // from the raw tables.
    // One :amrn node per nation key (fresh empty session, so the
    // minted ids are the deterministic 0..24 — no lookup statement),
    // then per-call dynamic rel merges between known ids: 3 creates +
    // 1 ON MATCH re-merge. Each call is a full MATCH…MERGE statement;
    // the row measures the PROCEDURE's contract (the at-scale matched
    // -merge plan is graded by cy_merge_path / cy_rel_upsert_burst).
    sql("apoc_merge_rel",
      """WITH m AS (SELECT n_nationkey AS k FROM nation
        |           WHERE n_nationkey BETWEEN 0 AND 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_rel,
        |  CAST(count(*) FILTER (WHERE k = 0) AS BIGINT) AS n_seen
        |FROM m""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      graft.procs.Packs.install(gs, Seq("apoc"))
      val nk = s.read.parquet(s"$dir/nation.parquet").count()
      gs.cypher(s"UNWIND range(0, ${nk - 1}) AS x CREATE (:amrn {k: x})")
      def call(k: Long): Unit =
        gs.cypher(s"CALL apoc.merge.relationship($k, 'AMR', " +
          s"{via: 1}, {made: 1}, ${k + 10}, {seen: 2}) YIELD src RETURN src").collect()
      (0L to 2L).foreach(call)
      call(0L) // re-merge: ON MATCH marks
      gs.cypher(
        """MATCH (:amrn)-[r:AMR]->(:amrn)
          |RETURN count(r) AS n_rel,
          |  sum(CASE WHEN r.seen = 2 THEN 1 ELSE 0 END) AS n_seen""".stripMargin)
    },

    // Real transactions over snapshot pointers (BEGIN/COMMIT/ROLLBACK —
    // the reference's cypher-shell drives `:begin` blocks, ref
    // TestBasic.java:146-156): tx1 flags customers ≤ 200 and COMMITs
    // (published); tx2 flags EVERY customer and bulk-CREATEs 500
    // :Ghost nodes, then ROLLs BACK — the snapshot-pointer restore
    // must erase both effects completely. The read runs after both
    // transactions: only tx1's flags are visible, the rolled-back
    // marker reads as absent (null ≠ 1), and the Ghost label matches
    // nothing. The oracle recomputes the committed count from the raw
    // customer table.
    sql("cy_tx_commit_rollback",
      """SELECT
        |  CAST(count(CASE WHEN c_custkey <= 200 THEN 1 END) AS BIGINT) AS committed,
        |  CAST(0 AS BIGINT) AS rolled_back,
        |  CAST(0 AS BIGINT) AS ghosts
        |FROM customer""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      gs.cypher("BEGIN")
      gs.cypher("MATCH (c:customer) WHERE c.c_custkey <= 200 SET c.keep = 1")
      gs.cypher("COMMIT")
      gs.cypher("BEGIN")
      gs.cypher("MATCH (c:customer) SET c.nope = 1")
      gs.cypher("UNWIND range(1, 500) AS x CREATE (:Ghost {g: x})")
      gs.cypher("ROLLBACK")
      val c = gs.cypher(
        """MATCH (c:customer)
          |RETURN sum(CASE WHEN c.keep = 1 THEN 1 ELSE 0 END) AS committed,
          |  sum(CASE WHEN c.nope = 1 THEN 1 ELSE 0 END) AS rolled_back""".stripMargin)
      val g = gs.cypher("MATCH (g:Ghost) RETURN count(g) AS ghosts")
      c.crossJoin(g)
    },

    // CALL { } IN TRANSACTIONS — openCypher's batched-commit ingest
    // (cypher-shell scripts use it for huge loads): 150 merge keys
    // flag their customers in 5 batches of 30, each batch its own
    // committed statement (one broadcast-batch update join per batch,
    // GraftSession.mutateCallInTx). Every custkey 1..150 exists at
    // every SF, so the oracle recomputes the flagged count from the
    // raw table; the batch count pins the chunking arithmetic.
    sql("cy_call_in_tx",
      """SELECT CAST(count(CASE WHEN c_custkey BETWEEN 1 AND 150 THEN 1 END) AS BIGINT) AS batched,
        |  CAST(5 AS BIGINT) AS batches
        |FROM customer""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val summary = gs.cypher(
        """UNWIND range(1, 150) AS x CALL { WITH x
          |MERGE (c:customer {c_custkey: x}) ON MATCH SET c.batched = 1
          |} IN TRANSACTIONS OF 30 ROWS""".stripMargin)
      val b = gs.cypher(
        "MATCH (c:customer) WHERE c.batched = 1 RETURN count(c) AS batched")
      b.crossJoin(summary.selectExpr("batches"))
    },

    // MATCH-driven CALL { } IN TRANSACTIONS — the canonical batched
    // cleanup (`MATCH (n) CALL { WITH n … } IN TRANSACTIONS`): the
    // driving MATCH binds ONCE against the entry snapshot, its ids
    // stream through the driver in 40-row chunks (toLocalIterator,
    // never a full collect), each chunk ONE id-keyed distributed
    // statement committing its own swap. Flags the BUILDING-segment
    // customers ≤ 300; the oracle recomputes the flagged count and
    // the chunk arithmetic from the raw table.
    sql("cy_match_in_tx",
      """WITH m AS (SELECT c_custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 300)
        |SELECT CAST(count(*) AS BIGINT) AS flagged,
        |  CAST(ceil(count(*) / 40.0) AS BIGINT) AS batches
        |FROM m""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      val summary = gs.cypher(
        """MATCH (c:customer {c_mktsegment: 'BUILDING'}) WHERE c.c_custkey <= 300
          |CALL { WITH c SET c.swept = 1 } IN TRANSACTIONS OF 40 ROWS""".stripMargin)
      val b = gs.cypher(
        "MATCH (c:customer) WHERE c.swept = 1 RETURN count(c) AS flagged")
      b.crossJoin(summary.selectExpr("batches"))
    },

    // List predicates + reduce over collected lists — openCypher's
    // any/all/none/single(x IN xs WHERE …) and reduce(acc = …, x IN
    // xs | …) compile to Spark's codegen'd higher-order functions
    // (exists/forall/filter/aggregate) over the grouped collect —
    // no UDF, no explode round-trip. The oracle recomputes each
    // predicate relationally (bool_or/bool_and/conditional count;
    // the reduce is an exact integer sum).
    q("cy_list_predicates",
      """SELECT c.c_custkey AS ck,
        |  bool_or(o.o_totalprice > 250000) AS has_big,
        |  bool_and(o.o_totalprice > 5000) AS all_over_5k,
        |  NOT bool_or(o.o_totalprice < 0) AS none_neg,
        |  (count(CASE WHEN o.o_totalprice > 300000 THEN 1 END) = 1) AS one_huge,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS keysum
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey <= 200
        |GROUP BY 1""".stripMargin)(
      """MATCH (c:customer)-[:PLACED]->(o:order) WHERE c.c_custkey <= 200
        |WITH c.c_custkey AS ck, collect(o.o_totalprice) AS prices,
        |     collect(o.o_orderkey) AS keys
        |RETURN ck, any(p IN prices WHERE p > 250000) AS has_big,
        |  all(p IN prices WHERE p > 5000) AS all_over_5k,
        |  none(p IN prices WHERE p < 0) AS none_neg,
        |  single(p IN prices WHERE p > 300000) AS one_huge,
        |  reduce(s = 0, k IN keys | s + k) AS keysum""".stripMargin),

    // Subscripts and slices — `xs[0]`, `xs[-1]`, `xs[1..3]` over a
    // collected list: 0-based/negative indexing via try_element_at
    // (nulls, never throws) and clamped end-exclusive slices via
    // slice(). The slice column is joined to a string for grading
    // (array canonicalization across engines is unreliable); DuckDB's
    // 1-based inclusive list_slice re-derives the same window.
    sql("cy_list_slice",
      """WITH ks AS (
        |  SELECT c.c_custkey AS ck, list_sort(list(o.o_orderkey)) AS keys
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey <= 100 GROUP BY 1)
        |SELECT ck, CAST(len(keys) AS BIGINT) AS n,
        |  keys[1] AS first_k, keys[-1] AS last_k,
        |  array_to_string(list_slice(keys, 2, 3), ',') AS mid
        |FROM ks""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      session(s, dir).cypher(
        """MATCH (c:customer)-[:PLACED]->(o:order) WHERE c.c_custkey <= 100
          |WITH c.c_custkey AS ck, collect(o.o_orderkey) AS keys
          |RETURN ck, size(keys) AS n, keys[0] AS first_k, keys[-1] AS last_k,
          |  keys[1..3] AS mid""".stripMargin)
        .withColumn("mid", array_join(col("mid").cast("array<string>"), ","))
    },

    // Map projection `c {.prop, key: expr, var}` built, carried
    // through WITH as a struct value, and read back via dot + ['key']
    // access — the driver-facing RETURN-a-map shape.
    q("cy_map_projection",
      """SELECT c_name AS name, c_mktsegment AS segment,
        |  c_custkey * 2 AS dkey, 7 AS lucky
        |FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin)(
      """MATCH (c:customer {c_mktsegment:'MACHINERY'})
        |WITH c {.c_name, segment: c.c_mktsegment, dkey: c.c_custkey * 2, lucky: 7} AS m
        |RETURN m.c_name AS name, m.segment AS segment,
        |  m['dkey'] AS dkey, m.lucky AS lucky""".stripMargin),

    // Temporal accessor family: date values carried through WITH and
    // read back component-wise (d.year … d.dayOfWeek, ISO Monday=1)
    // plus datetime.truncate — the openCypher temporal subset over a
    // real DATE-typed property.
    q("cy_temporal",
      """SELECT o_orderkey AS k, year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q, month(o_orderdate) AS m,
        |  weekofyear(o_orderdate) AS w, isodow(o_orderdate) AS dow,
        |  dayofyear(o_orderdate) AS doy,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart
        |FROM orders WHERE o_orderkey < 200""".stripMargin)(
      """MATCH (o:order) WHERE o.o_orderkey < 200
        |WITH o.o_orderkey AS k, date(o.o_orderdate) AS d
        |RETURN k, d.year AS y, d.quarter AS q, d.month AS m,
        |  d.week AS w, d.dayOfWeek AS dow, d.ordinalDay AS doy,
        |  date.truncate('month', d) AS mstart""".stripMargin),

    // Scalar-function surface sweep — trig/constants quantized to
    // integers (floor(x*1e6+0.5), the repo's standard float-grading
    // idiom), charLength/isEmpty, and tail() sized (array canon across
    // engines is unreliable; cardinality is). All codegen'd built-ins.
    q("cy_scalar_fns",
      """SELECT n_name AS name,
        |  CAST(floor(sin(n_nationkey) * 1000000 + 0.5) AS BIGINT) AS qsin,
        |  CAST(floor(atan2(CAST(n_nationkey AS DOUBLE), 7.0) * 1000000 + 0.5) AS BIGINT) AS qatan2,
        |  CAST(floor(degrees(n_nationkey) * 1000000 + 0.5) AS BIGINT) AS qdeg,
        |  CAST(floor(pi() * 1000000 + 0.5) AS BIGINT) AS qpi,
        |  CAST(length(n_name) AS BIGINT) AS clen,
        |  CAST(CASE WHEN length(n_name) = 0 THEN 1 ELSE 0 END AS BIGINT) AS cempty,
        |  CAST(len(string_split(n_name, 'A')) - 1 AS BIGINT) AS tailn
        |FROM nation""".stripMargin)(
      """MATCH (n:nation)
        |RETURN n.n_name AS name,
        |  toInteger(floor(sin(n.n_nationkey) * 1000000 + 0.5)) AS qsin,
        |  toInteger(floor(atan2(n.n_nationkey, 7.0) * 1000000 + 0.5)) AS qatan2,
        |  toInteger(floor(degrees(n.n_nationkey) * 1000000 + 0.5)) AS qdeg,
        |  toInteger(floor(pi() * 1000000 + 0.5)) AS qpi,
        |  toInteger(charLength(n.n_name)) AS clen,
        |  CASE WHEN isEmpty(n.n_name) THEN 1 ELSE 0 END AS cempty,
        |  toInteger(size(tail(split(n.n_name, 'A')))) AS tailn""".stripMargin),

    // startNode()/endNode() recover a matched relationship's endpoint
    // ids from the binding table — graded as a consistency count (the
    // oracle can't see engine node ids, but every traversed edge must
    // agree with its own endpoints).
    q("cy_rel_endpoints",
      """SELECT CAST(count(*) AS BIGINT) AS n_ok
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin)(
      """MATCH (c:customer)-[r:PLACED]->(o:order)
        |WHERE startNode(r) = id(c) AND endNode(r) = id(o)
        |RETURN count(r) AS n_ok""".stripMargin),

    // CALL { } composition subquery, the per-entity top-k idiom: each
    // customer's 2 priciest orders. Compiles to ONE row_number window
    // over the import key + a join back — decorrelated, never per-row
    // re-execution.
    q("cy_call_subquery",
      """SELECT c_custkey, ok, price FROM (
        |  SELECT c.c_custkey, o.o_orderkey AS ok, o.o_totalprice AS price,
        |    row_number() OVER (PARTITION BY c.c_custkey
        |                       ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey <= 200) t
        |WHERE rn <= 2 ORDER BY c_custkey, price DESC, ok""".stripMargin)(
      """MATCH (c:customer) WHERE c.c_custkey <= 200
        |CALL { WITH c MATCH (c)-[:PLACED]->(o:order)
        |       RETURN o.o_orderkey AS ok, o.o_totalprice AS price
        |       ORDER BY price DESC, ok LIMIT 2 }
        |RETURN c.c_custkey AS c_custkey, ok, price
        |ORDER BY c_custkey, price DESC, ok""".stripMargin),

    // UNION across two MATCH arms (set semantics: distinct rows)
    q("cy_union",
      """SELECT name FROM (
        |  SELECT c_name AS name FROM customer WHERE c_custkey <= 50
        |  UNION SELECT s_name FROM supplier WHERE s_suppkey <= 50) t
        |ORDER BY name""".stripMargin)(
      """MATCH (c:customer) WHERE c.c_custkey <= 50 RETURN c.c_name AS name
        |UNION
        |MATCH (s:supplier) WHERE s.s_suppkey <= 50 RETURN s.s_name AS name
        |ORDER BY name""".stripMargin),

    // CASE expression in RETURN, grouped
    q("cy_case",
      """SELECT o_orderpriority AS pri,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin)(
      """MATCH (o:order)
        |RETURN o.o_orderpriority AS pri,
        |  CASE WHEN o.o_totalprice > 100000 THEN
        |    CASE WHEN o.o_totalprice > 200000 THEN 'big' ELSE 'mid' END
        |  ELSE 'small' END AS bucket,
        |  count(o) AS n""".stripMargin),

    // read-side UNWIND: list expansion crossed with matched rows
    q("cy_unwind",
      """SELECT r.r_name AS r_name, u.x AS mult FROM region r,
        |  unnest([1, 2, 3]) u(x) ORDER BY r_name, mult""".stripMargin)(
      """MATCH (r:region) UNWIND [1, 2, 3] AS mult
        |RETURN r.r_name AS r_name, mult ORDER BY r_name, mult""".stripMargin),

    // Schema introspection (what Neo4j Browser calls on connect): one
    // row per (srcLabel, relType, dstLabel) with edge counts — two
    // label joins + one hash agg over the graph view.
    q("cy_schema_viz",
      """SELECT * FROM (
        |  SELECT 'customer' AS srcLabel, 'PLACED' AS relType, 'order' AS dstLabel,
        |         (SELECT count(*) FROM orders) AS n
        |  UNION ALL SELECT 'customer', 'IN', 'nation', (SELECT count(*) FROM customer)
        |  UNION ALL SELECT 'supplier', 'IN', 'nation', (SELECT count(*) FROM supplier)
        |  UNION ALL SELECT 'nation', 'IN', 'region', (SELECT count(*) FROM nation)
        |  UNION ALL SELECT 'order', 'CONTAINS', 'part', (SELECT count(*) FROM lineitem)
        |  UNION ALL SELECT 'supplier', 'SUPPLIED', 'part', (SELECT count(*) FROM lineitem)
        |) t ORDER BY srcLabel, relType, dstLabel""".stripMargin)(
      """CALL db.schema.visualization() YIELD srcLabel, relType, dstLabel, n
        |RETURN srcLabel, relType, dstLabel, n ORDER BY srcLabel, relType, dstLabel""".stripMargin),

    // Pattern comprehension: per-nation supplier-name lists, compiled
    // to one grouped collect + left join back (empty list when no
    // match) — never a per-row subquery. Compared as a joined string
    // (engines canonicalize list values differently).
    sql("cy_pattern_comp",
      """SELECT n.n_name AS n_name,
        |  coalesce(string_agg(s.s_name, ',' ORDER BY s.s_name), '') AS suppliers
        |FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      session(s, dir).cypher(
        """MATCH (n:nation)
          |RETURN n.n_name AS n_name, [(s:supplier)-[:IN]->(n) | s.s_name] AS suppliers
          |ORDER BY n_name""".stripMargin)
        .withColumn("suppliers", array_join(col("suppliers"), ","))
    },

    // COLLECT {} subquery (Neo4j 5.6): the multi-clause sibling of a
    // pattern comprehension — same grouped-collect + left-join-back
    // plan (one shuffle, never per-row), WHERE inside the braces
    sql("cy_collect_subquery",
      """SELECT n.n_name AS n_name,
        |  coalesce(string_agg(c.c_name, ',' ORDER BY c.c_name), '') AS rich
        |FROM nation n LEFT JOIN customer c
        |  ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9900
        |GROUP BY n.n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col}
      session(s, dir).cypher(
        """MATCH (n:nation)
          |RETURN n.n_name AS n_name,
          |  COLLECT { MATCH (c:customer)-[:IN]->(n) WHERE c.c_acctbal > 9900 RETURN c.c_name } AS rich
          |ORDER BY n_name""".stripMargin)
        .withColumn("rich", array_join(col("rich"), ","))
    },

    // IS NULL over an optional-match miss: the left-join null is a
    // first-class value the WITH…WHERE can filter on.
    q("cy_is_null",
      """SELECT c_custkey FROM customer c
        |WHERE c.c_custkey <= 1000 AND NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)(
      """MATCH (c:customer) WHERE c.c_custkey <= 1000
        |OPTIONAL MATCH (c)-[:PLACED]->(o:order {o_orderstatus:'P'})
        |WITH c.c_custkey AS c_custkey, o.o_orderkey AS ok WHERE ok IS NULL
        |RETURN c_custkey ORDER BY c_custkey""".stripMargin),

    // Spatial points: point({x,y}) construction from property values,
    // accessors (p.x, p.srid) and cartesian point.distance. Distance
    // is IEEE-exact across engines (sub/mul/sqrt are all correctly
    // rounded), so the full hash gate holds without quantization. The
    // geographic (haversine) branch is spec-tested with tolerance
    // instead — libm vs JVM trig may differ in the last ulp.
    q("cy_point_distance",
      """SELECT c.c_custkey AS k, c.c_acctbal AS px, 7203 AS srid,
        |  sqrt(c.c_acctbal * c.c_acctbal +
        |       (CAST(n.n_nationkey AS DOUBLE) * 100) * (CAST(n.n_nationkey AS DOUBLE) * 100)) AS dist
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 500""".stripMargin)(
      """MATCH (c:customer)-[:IN]->(n:nation) WHERE c.c_custkey <= 500
        |WITH c.c_custkey AS k, point({x: c.c_acctbal, y: toFloat(n.n_nationkey * 100)}) AS p1
        |RETURN k, p1.x AS px, p1.srid AS srid,
        |  point.distance(p1, point({x: 0.0, y: 0.0})) AS dist""".stripMargin),

    // duration({components}) + datetime arithmetic: the interval value
    // rides Catalyst's native Add/Subtract rewrite (TimeAdd), so the
    // plan stays whole-stage-codegen'd — no UDF, no driver math.
    q("cy_duration_arith",
      """SELECT o_orderkey AS k,
        |  o_orderdate + INTERVAL '30 days 12 hours' AS due,
        |  o_orderdate - INTERVAL '7 days' AS earlier
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin)(
      """MATCH (o:order) WHERE o.o_orderkey <= 1000
        |RETURN o.o_orderkey AS k,
        |  o.o_orderdate + duration({days: 30, hours: 12}) AS due,
        |  o.o_orderdate - duration({weeks: 1}) AS earlier""".stripMargin),

    // Index-backed anchored lookup end to end (r15 verdict #1): CREATE
    // INDEX → save → the range anchor routes through the snapshot's
    // prop-clustered index_aux projection (predicate pushed into its
    // sorted scan, row-group pruned — PlanSpec pins the plan shape;
    // this row grades the ANSWER through the projection). Equality
    // anchors share the same path (`cy_index_anchor_eq`).
    sql("cy_index_anchor",
      """SELECT c_custkey*10+3 AS node_id FROM customer
        |WHERE c_acctbal > 9900.0""".stripMargin) { (s, dir) =>
      indexedSession(s, dir).cypher(
        "MATCH (n:customer) WHERE n.c_acctbal > 9900.0 RETURN id(n) AS node_id")
    },
    sql("cy_index_anchor_eq",
      """SELECT c_custkey*10+3 AS node_id FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin) { (s, dir) =>
      indexedSession(s, dir).cypher(
        "MATCH (n:customer {c_mktsegment: 'BUILDING'}) RETURN id(n) AS node_id")
    },

    // Composite-key + DELTA-COMPOSED routing, graded end to end (r16
    // verdict #1 + #5): the anchor routes through the (c_nationkey,
    // c_acctbal) projection's key prefix — BOTH predicates pushed into
    // its sorted scan (PlanSpec pins the shape) — AND the fixture
    // committed one CREATE after the save, so the answer must include
    // the delta-born row the on-disk projection has never seen.
    sql("cy_index_anchor_composite",
      """SELECT c_custkey FROM customer
        |WHERE c_nationkey = 5 AND c_acctbal > 5000
        |UNION ALL SELECT CAST(999999 AS BIGINT) AS c_custkey""".stripMargin) { (s, dir) =>
      indexedDeltaSession(s, dir).cypher(
        """MATCH (n:customer {c_nationkey: 5}) WHERE n.c_acctbal > 5000
          |RETURN n.c_custkey AS c_custkey""".stripMargin)
    },

    // Label-scan route graded end to end (r17): an UNANCHORED label
    // scan over the saved fixture reads the label-partition-pruned
    // base composed with the post-save delta (the CREATE above) — the
    // count must include the delta-born row the partitions never saw.
    sql("cy_label_scan",
      "SELECT count(*) + 1 AS n FROM customer") { (s, dir) =>
      indexedDeltaSession(s, dir).cypher(
        "MATCH (n:customer) RETURN count(n) AS n")
    },

    // Statistics-driven join ordering graded end to end (r17 verdict
    // #1): the 3-hop pattern is WRITTEN big-label-first, but the saved
    // fixture's sealed label counts make the compiler anchor at the
    // 5-row region side (with its prop anchor) and walk backward —
    // PlanSpec pins the reversed plan shape; this row grades the
    // answer through it. The per-nation breakdown makes a silently
    // mis-joined reversal (wrong multiplicity, dropped hop) hash-fail.
    sql("cy_join_order",
      """SELECT n.n_name AS n_name, count(*) AS cnt
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY n_name""".stripMargin) {
      (s, dir) =>
        orderedSession(s, dir).cypher(
          """MATCH (c:customer)-[:IN]->(n:nation)-[:OF]->(r:region {r_name: 'ASIA'})
            |RETURN n.n_name AS n_name, count(*) AS cnt ORDER BY n_name""".stripMargin)
    },

    // Label-EXPRESSION routing graded end to end (r17 verdict #2): the
    // A|B scan over the saved fixture reads ONE union-pruned
    // label-partition scan (covering set {nation, region} — PlanSpec
    // pins the partition filter); counts per label prove no row was
    // duplicated or dropped by the union pruning.
    sql("cy_label_expr_scan",
      """SELECT l, cnt FROM (
        |  SELECT 'nation' AS l, count(*) AS cnt FROM nation
        |  UNION ALL SELECT 'region' AS l, count(*) AS cnt FROM region)
        |ORDER BY l""".stripMargin) { (s, dir) =>
      orderedSession(s, dir).cypher(
        """MATCH (n:nation|region)
          |WITH CASE WHEN n.n_name IS NOT NULL THEN 'nation' ELSE 'region' END AS l
          |RETURN l, count(*) AS cnt ORDER BY l""".stripMargin)
    },

    // Temporal component accessors graded end to end (r19 gap-hunt):
    // `o.o_orderdate.year` is postfix component access on a DATE-typed
    // property (PropOf → the native year() extractor — codegen'd, no
    // UDF), aggregated per year so a wrong component mapping
    // hash-fails, not just row-counts
    q("cy_temporal_components",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       count(*) AS n
        |FROM orders WHERE o_orderdate >= DATE '1996-06-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(
      """MATCH (o:order) WHERE o.o_orderdate >= date('1996-06-01')
        |RETURN o.o_orderdate.year AS y, o.o_orderdate.month AS m,
        |count(*) AS n ORDER BY y, m""".stripMargin)
  )
}
