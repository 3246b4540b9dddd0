package graft.operators

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, QueryDef}
import graft.QueryDef.{rowsOnly, sql}
import graft.core.GraphViews
import graft.procs.Packs

/** GDS-pack graph algorithms (SURVEY.md §2.5) graded end-to-end:
  * CALL … YIELD through the Cypher engine onto GraphX, over the TPC-H
  * graph view. WCC and shortest-path have closed-form DuckDB oracles
  * because the IN-edge subgraph is a forest of region trees
  * (customer/supplier -> nation -> region) with deterministic node ids
  * (GraphViews: key*10+tag); PageRank runs in scaled-Long arithmetic
  * (Gds.pageRank) so it is hash-graded too — the oracle replays the
  * exact integer recurrence as chained CTEs (pagerankOracleSql).
  */
object GraphAlgos {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, GraftSession]()

  private def session(s: SparkSession, dir: String): GraftSession =
    cache.computeIfAbsent(dir, _ => {
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      Packs.install(gs, Seq("graph-data-science", "apoc"))
      gs
    })

  /** Part co-purchase session (the tpch view itself is triangle-free:
    * every edge type is bipartite or tree-shaped, so triangleCount
    * needs a graph that actually has triangles). */
  private def coSession(s: SparkSession, dir: String): GraftSession =
    cache.computeIfAbsent(dir + "#co", _ => {
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.copurchase(s, dir))
      Packs.install(gs, Seq("graph-data-science", "apoc"))
      gs
    })

  /** Directed part-flow session (SCC needs a digraph with real cycles;
    * both tpch and CO views are acyclic/undirected by construction). */
  private def flowSession(s: SparkSession, dir: String): GraftSession =
    cache.computeIfAbsent(dir + "#flow", _ => {
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.partflow(s, dir))
      Packs.install(gs, Seq("graph-data-science", "apoc"))
      gs
    })

  /** DuckDB oracle replaying Gds.pageRank's integer recurrence over the
    * IN-edge view: nodes are ALL tpch graph nodes (GraphViews ids
    * key*10+tag), edges customer/supplier->nation and nation->region.
    * Init rank = 1000000; each iteration rank' = 150000 +
    * (Σ_in rank_src // outdeg_src) * 85 // 100. DuckDB `//` floors,
    * which equals Long division for the always-positive ranks, and
    * BIGINT sums are order-independent — so the hash gate holds.
    */
  /** Chained-CTE k-core oracle: e0 = symmetrized co-purchase edges;
    * round i keeps nodes whose degree in e(i-1) is >= k and restricts
    * the edge set to both-endpoints-kept. Mirrors Gds.kcore exactly. */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    // MATERIALIZED: each ki/ei is referenced 2-3 times; DuckDB inlines
    // plain CTEs per reference, which compounds to 2^rounds re-scans
    // (manifests as "Too many open files" on the parquet source)
    val prefix =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p AS pa, b.p AS pb
        |         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |e0 AS MATERIALIZED (SELECT pa*10+6 AS a, pb*10+6 AS b FROM pair
        |       UNION ALL SELECT pb*10+6, pa*10+6 FROM pair)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (SELECT a FROM e${i - 1} GROUP BY a HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |        JOIN k$i x ON x.a = e.a JOIN k$i y ON y.a = e.b)""".stripMargin
    }.mkString(",\n", ",\n", "")
    prefix + steps +
      s"\nSELECT a AS node_id, CAST(count(*) AS BIGINT) AS deg " +
      s"FROM e$rounds GROUP BY a HAVING count(*) >= $k"
  }

  private def pagerankOracleSql(iterations: Int): String = {
    val base =
      """WITH nodes AS (
        |  SELECT r_regionkey*10+1 AS id FROM region
        |  UNION ALL SELECT n_nationkey*10+2 FROM nation
        |  UNION ALL SELECT c_custkey*10+3 FROM customer
        |  UNION ALL SELECT s_suppkey*10+5 FROM supplier
        |  UNION ALL SELECT p_partkey*10+6 FROM part
        |  UNION ALL SELECT o_orderkey*10+4 FROM orders),
        |edges AS (
        |  SELECT c_custkey*10+3 AS src, c_nationkey*10+2 AS dst FROM customer
        |  UNION ALL SELECT s_suppkey*10+5, s_nationkey*10+2 FROM supplier
        |  UNION ALL SELECT n_nationkey*10+2, n_regionkey*10+1 FROM nation),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM nodes)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.id, 150000 + COALESCE(m.msg, 0) * 85 // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, SUM(r.rank // d.outdeg) AS msg
         |    FROM edges e JOIN r${i - 1} r ON r.id = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) m ON m.id = n.id)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT id AS node_id, CAST(rank AS BIGINT) AS iscore FROM r$iterations ORDER BY node_id"
  }

  /** Chained-CTE oracle replaying Gds.pageRankWeighted over the
    * directed canonical CO graph: each edge carries the view's
    * deterministic weight (p + p2) % 9 + 1; per iteration
    * msg_v = Σ_in rank_u · w // Σ_out w(u), rank' = 150000 + msg·85//
    * 100 — pure BIGINT floor division on both engines. */
  private def weightedPagerankOracleSql(iterations: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |edges AS MATERIALIZED (SELECT DISTINCT CAST(a.p*10+6 AS BIGINT) AS src,
        |        CAST(b.p*10+6 AS BIGINT) AS dst,
        |        CAST((a.p + b.p) % 9 + 1 AS BIGINT) AS w
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
        |sw AS MATERIALIZED (SELECT src, SUM(w) AS sw FROM edges GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM pnodes)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id, 150000 + COALESCE(m.msg, 0) * 85 // 100 AS rank
         |  FROM pnodes n LEFT JOIN (
         |    SELECT e.dst AS id, SUM(r.rank * e.w // s.sw) AS msg
         |    FROM edges e JOIN r${i - 1} r ON r.id = e.src
         |    JOIN sw s ON s.src = e.src
         |    GROUP BY e.dst) m ON m.id = n.id)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT id AS node_id, CAST(rank AS BIGINT) AS iscore FROM r$iterations"
  }

  /** Chained-CTE oracle for Gds.articleRank over the CO graph:
    * r' = 150000 + (Σ_in r // (outdeg + davg)) * 85 // 100 with
    * davg = |E| // |V| — pure BIGINT floor division on both engines. */
  private def articleRankOracleSql(iterations: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |pnodes AS MATERIALIZED (SELECT DISTINCT p*10+6 AS id FROM li),
        |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |davg AS MATERIALIZED (
        |  SELECT (SELECT count(*) FROM e) // (SELECT count(*) FROM pnodes) AS d),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM pnodes)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.id, 150000 + COALESCE(m.msg, 0) * 85 // 100 AS rank
         |  FROM pnodes n LEFT JOIN (
         |    SELECT e.dst AS id,
         |           SUM(r.rank // (d.outdeg + (SELECT d FROM davg))) AS msg
         |    FROM e JOIN r${i - 1} r ON r.id = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) m ON m.id = n.id)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT id AS node_id, CAST(rank AS BIGINT) AS iscore FROM r$iterations"
  }

  /** Chained-CTE oracle replaying Gds.eigenvector's power iteration
    * over the symmetrized CO graph: msg_v = Σ_adj r_u, then the whole
    * vector renormalizes by its max — r' = msg·10⁶ // max(msg). Pure
    * BIGINT; `//` floors like Long division for the non-negative
    * ranks, MAX and SUM are order-free, so the hash gate holds. */
  private def eigenvectorOracleSql(iterations: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |edges AS MATERIALIZED (SELECT src, dst FROM e0
        |         UNION ALL SELECT dst, src FROM e0),
        |pnodes AS MATERIALIZED (SELECT DISTINCT p*10+6 AS id FROM li),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM pnodes)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT e.dst AS id, SUM(r.rank) AS msg
         |  FROM edges e JOIN r${i - 1} r ON r.id = e.src GROUP BY e.dst),
         |r$i AS MATERIALIZED (
         |  SELECT n.id, COALESCE(m.msg, 0) * 1000000 // (SELECT MAX(msg) FROM m$i) AS rank
         |  FROM pnodes n LEFT JOIN m$i m ON m.id = n.id)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT id AS node_id, CAST(rank AS BIGINT) AS iscore FROM r$iterations"
  }

  /** Chained-CTE oracle replaying Gds.hits over the FLOW digraph:
    * per round auth_v = Σ_in hub_u then hub_v = Σ_out auth'_w, each
    * half max-renormalized to [0, 10⁶]. Same BIGINT discipline as
    * [[eigenvectorOracleSql]]. */
  private def hitsOracleSql(iterations: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (
        |  SELECT l_orderkey AS o, l_partkey AS p, MIN(l_linenumber) AS ln
        |  FROM lineitem WHERE l_orderkey < 600 GROUP BY 1, 2),
        |edges AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.ln < b.ln),
        |pnodes AS MATERIALIZED (SELECT DISTINCT p*10+6 AS id FROM li),
        |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hub,
        |       CAST(0 AS BIGINT) AS auth FROM pnodes)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""am$i AS MATERIALIZED (
         |  SELECT e.dst AS id, SUM(h.hub) AS msg
         |  FROM edges e JOIN h${i - 1} h ON h.id = e.src GROUP BY e.dst),
         |a$i AS MATERIALIZED (
         |  SELECT n.id, COALESCE(m.msg, 0) * 1000000 // (SELECT MAX(msg) FROM am$i) AS auth
         |  FROM pnodes n LEFT JOIN am$i m ON m.id = n.id),
         |hm$i AS MATERIALIZED (
         |  SELECT e.src AS id, SUM(a.auth) AS msg
         |  FROM edges e JOIN a$i a ON a.id = e.dst GROUP BY e.src),
         |h$i AS MATERIALIZED (
         |  SELECT a.id, COALESCE(m.msg, 0) * 1000000 // (SELECT MAX(msg) FROM hm$i) AS hub,
         |         a.auth
         |  FROM a$i a LEFT JOIN hm$i m ON m.id = a.id)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT id AS node_id, CAST(hub AS BIGINT) AS ihub, " +
      s"CAST(auth AS BIGINT) AS iauth FROM h$iterations"
  }

  /** Chained-CTE oracle replaying Gds.louvain's monotone synchronous
    * integer-scaled modularity moves over the CO graph: per round,
    * community degree masses, node→community edge counts, candidate
    * gains 2m·e_iC − deg_i·(Σtot_C − [own]·deg_i) over candidates
    * with id <= the current community, argmax with (gain DESC,
    * community ASC) tiebreak. All BIGINT. */
  private def louvainOracleSql(rounds: Int): String = {
    val base =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT src, dst FROM pair
        |       UNION SELECT dst, src FROM pair),
        |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
        |deg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        |       FROM und GROUP BY src),
        |tm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und),
        |c0 AS MATERIALIZED (SELECT id AS cid, id AS cc FROM pnodes)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""tot$r AS MATERIALIZED (
         |  SELECT c.cc AS tc, SUM(d.deg) AS tot
         |  FROM deg d JOIN c${r - 1} c ON c.cid = d.id GROUP BY c.cc),
         |cand$r AS MATERIALIZED (
         |  SELECT i, cand, max(eic) AS eic FROM (
         |    SELECT u.src AS i, c.cc AS cand, CAST(count(*) AS BIGINT) AS eic
         |    FROM und u JOIN c${r - 1} c ON c.cid = u.dst GROUP BY 1, 2
         |    UNION ALL SELECT cid, cc, CAST(0 AS BIGINT) FROM c${r - 1})
         |  GROUP BY i, cand),
         |sc$r AS MATERIALIZED (
         |  SELECT x.i, x.cand,
         |    (SELECT m2 FROM tm) * x.eic - COALESCE(d.deg, 0) *
         |      (COALESCE(t.tot, 0) -
         |       CASE WHEN x.cand = o.cc THEN COALESCE(d.deg, 0) ELSE 0 END) AS gain
         |  FROM cand$r x LEFT JOIN tot$r t ON t.tc = x.cand
         |  LEFT JOIN deg d ON d.id = x.i
         |  JOIN c${r - 1} o ON o.cid = x.i
         |  WHERE x.cand <= o.cc),
         |c$r AS MATERIALIZED (
         |  SELECT i AS cid, cand AS cc FROM (
         |    SELECT i, cand,
         |      row_number() OVER (PARTITION BY i ORDER BY gain DESC, cand ASC) AS rn
         |    FROM sc$r) WHERE rn = 1)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT cid AS node_id, CAST(cc AS BIGINT) AS community FROM c$rounds"
  }

  /** DuckDB oracle replaying Gds.labelPropagation's deterministic
    * recurrence over the part co-purchase graph: per iteration each
    * node adopts the (count DESC, label ASC)-first label among its
    * undirected neighbors; isolated nodes keep theirs. Labels are
    * BIGINT node ids throughout, so the hash gate holds. */
  private def lpaOracleSql(iterations: Int): String = {
    val base =
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e AS (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |l0 AS (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id,
        |              CAST(p*10+6 AS BIGINT) AS label FROM li)""".stripMargin
    val steps = (1 to iterations).map { i =>
      s"""l$i AS (
         |  SELECT n.id, COALESCE(p.newlab, n.label) AS label
         |  FROM l${i - 1} n LEFT JOIN (
         |    SELECT id, label AS newlab FROM (
         |      SELECT id, label,
         |        row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn
         |      FROM (SELECT u.src AS id, l.label, count(*) AS c
         |            FROM und u JOIN l${i - 1} l ON l.id = u.dst
         |            GROUP BY u.src, l.label))
         |    WHERE rn = 1) p ON p.id = n.id)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"\nSELECT id AS node_id, CAST(label AS BIGINT) AS label FROM l$iterations ORDER BY node_id"
  }

  /** Closed-form DuckDB oracle for closeness/harmonic over the IN
    * forest. Each region tree is region <- Nr nations <- Lr leaves
    * (customers+suppliers; Ln per nation), so undirected hop distances
    * are fully determined:
    *   region:  Nr at d=1, Lr at d=2
    *   nation:  region+own leaves at d=1, sibling nations at d=2,
    *            other nations' leaves at d=3
    *   leaf:    own nation d=1, region d=2, same-nation leaves d=2,
    *            other nations d=3, their leaves d=4
    * Reachable others = Nr + Lr for every node in the tree. Harmonic
    * uses the same per-distance integer quotients the engine sums
    * (1e6//2=500000, //3=333333, //4=250000). */
  private def centralityOracleSql(closeness: Boolean): String = {
    val base =
      """WITH leaves AS (
        |  SELECT c_custkey*10+3 AS id, c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_suppkey*10+5, s_nationkey FROM supplier),
        |lcnt AS (SELECT nk, count(*) AS lnn FROM leaves GROUP BY nk),
        |nat AS (SELECT n_nationkey AS nk, n_regionkey AS rk, COALESCE(l.lnn, 0) AS lnn
        |        FROM nation n LEFT JOIN lcnt l ON l.nk = n.n_nationkey),
        |reg AS (SELECT rk, CAST(count(*) AS BIGINT) AS nr,
        |               CAST(sum(lnn) AS BIGINT) AS lr FROM nat GROUP BY rk),
        |scores AS (
        |  SELECT r_regionkey*10+1 AS node_id, nr + lr AS reach,
        |         nr + 2*lr AS sd,
        |         nr*1000000 + lr*500000 AS hs
        |  FROM region JOIN reg ON reg.rk = r_regionkey
        |  UNION ALL
        |  SELECT nk*10+2, nr + lr,
        |         1 + lnn + 2*(nr-1) + 3*(lr-lnn),
        |         1000000 + 1000000*lnn + 500000*(nr-1) + 333333*(lr-lnn)
        |  FROM nat JOIN reg USING (rk)
        |  UNION ALL
        |  SELECT lv.id, nr + lr,
        |         3 + 2*(lnn-1) + 3*(nr-1) + 4*(lr-lnn),
        |         1500000 + 500000*(lnn-1) + 333333*(nr-1) + 250000*(lr-lnn)
        |  FROM leaves lv JOIN nat ON nat.nk = lv.nk JOIN reg USING (rk))""".stripMargin
    // mirror of the engine's sampled source set (id % 97 < 2)
    val sel =
      if (closeness)
        """SELECT node_id, CAST(reach AS BIGINT) AS n_reachable,
          |  CAST(sd AS BIGINT) AS sum_dist,
          |  CAST(reach * 1000000 // sd AS BIGINT) AS iscore
          |FROM scores WHERE node_id % 97 < 2""".stripMargin
      else
        "SELECT node_id, CAST(hs AS BIGINT) AS hscore FROM scores WHERE node_id % 97 < 2"
    base + "\n" + sel
  }

  def all: Seq[QueryDef] = Seq(

    // WCC over IN edges: component = min node id in the region tree.
    // Output restricted to customer nodes (tag 3) to keep the result
    // labeled; the oracle recomputes the component min by construction.
    // degree centrality over ALL edge types: orders/lineitem fan-out
    // per node, with isolated-node zeroes preserved
    sql("gds_degree",
      """WITH nodes AS (
        |  SELECT r_regionkey*10+1 AS id FROM region
        |  UNION ALL SELECT n_nationkey*10+2 FROM nation
        |  UNION ALL SELECT c_custkey*10+3 FROM customer
        |  UNION ALL SELECT s_suppkey*10+5 FROM supplier
        |  UNION ALL SELECT p_partkey*10+6 FROM part
        |  UNION ALL SELECT o_orderkey*10+4 FROM orders),
        |edges AS (
        |  SELECT o_custkey*10+3 AS src, o_orderkey*10+4 AS dst FROM orders
        |  UNION ALL SELECT c_custkey*10+3, c_nationkey*10+2 FROM customer
        |  UNION ALL SELECT s_suppkey*10+5, s_nationkey*10+2 FROM supplier
        |  UNION ALL SELECT n_nationkey*10+2, n_regionkey*10+1 FROM nation
        |  UNION ALL SELECT l_orderkey*10+4, l_partkey*10+6 FROM lineitem
        |  UNION ALL SELECT l_suppkey*10+5, l_partkey*10+6 FROM lineitem),
        |outd AS (SELECT src, CAST(count(*) AS BIGINT) AS o FROM edges GROUP BY src),
        |ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS i FROM edges GROUP BY dst)
        |SELECT nodes.id AS node_id,
        |  coalesce(outd.o, 0) AS out_degree, coalesce(ind.i, 0) AS in_degree
        |FROM nodes LEFT JOIN outd ON outd.src = nodes.id
        |LEFT JOIN ind ON ind.dst = nodes.id""".stripMargin) { (s, dir) =>
      session(s, dir).cypher(
        "CALL gds.degree() YIELD node_id, out_degree, in_degree RETURN node_id, out_degree, in_degree")
    },

    // Degree through a NAMED projection (gds.graph.project → the
    // algorithm resolves the projection name): the projected view
    // keeps all nodes and only PLACED edges (both endpoints survive),
    // so out-degree = orders per customer, in-degree = 1 per order,
    // 0 elsewhere — the projection surface graded end to end, not
    // just PacksSpec-tested.
    sql("gds_degree_projected",
      """WITH nodes AS (
        |  SELECT r_regionkey*10+1 AS id FROM region
        |  UNION ALL SELECT n_nationkey*10+2 FROM nation
        |  UNION ALL SELECT c_custkey*10+3 FROM customer
        |  UNION ALL SELECT s_suppkey*10+5 FROM supplier
        |  UNION ALL SELECT p_partkey*10+6 FROM part
        |  UNION ALL SELECT o_orderkey*10+4 FROM orders),
        |outd AS (SELECT o_custkey*10+3 AS id, CAST(count(*) AS BIGINT) AS c
        |         FROM orders GROUP BY 1),
        |ind AS (SELECT o_orderkey*10+4 AS id, CAST(count(*) AS BIGINT) AS c
        |        FROM orders GROUP BY 1)
        |SELECT n.id AS node_id, coalesce(o.c, 0) AS out_degree,
        |       coalesce(i.c, 0) AS in_degree
        |FROM nodes n LEFT JOIN outd o ON o.id = n.id
        |LEFT JOIN ind i ON i.id = n.id""".stripMargin) { (s, dir) =>
      val gs = session(s, dir)
      gs.cypher(
        "CALL gds.graph.project('placed_proj', '*', 'PLACED') YIELD graphName RETURN graphName")
        .collect()
      gs.cypher(
        "CALL gds.degree('placed_proj') YIELD node_id, out_degree, in_degree " +
          "RETURN node_id, out_degree, in_degree")
    },

    sql("gds_wcc",
      """WITH m AS (
        |  SELECT rk, min(id) AS component FROM (
        |    SELECT r_regionkey AS rk, r_regionkey*10+1 AS id FROM region
        |    UNION ALL SELECT n_regionkey, n_nationkey*10+2 FROM nation
        |    UNION ALL SELECT n.n_regionkey, c.c_custkey*10+3
        |      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |    UNION ALL SELECT n.n_regionkey, s.s_suppkey*10+5
        |      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |  GROUP BY rk)
        |SELECT c.c_custkey*10+3 AS node_id, m.component AS component
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN m ON m.rk = n.n_regionkey""".stripMargin) { (s, dir) =>
      session(s, dir).cypher(
        "CALL gds.wcc('IN') YIELD node_id, component WHERE node_id % 10 = 3 RETURN node_id, component")
    },

    // Hop distance to the region-0 landmark (node id 1) along IN edges:
    // region 0, its nations at 1, their customers/suppliers at 2.
    sql("gds_shortest_path",
      """SELECT CAST(1 AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS distance
        |UNION ALL SELECT n_nationkey*10+2, 1 FROM nation WHERE n_regionkey = 0
        |UNION ALL SELECT c.c_custkey*10+3, 2
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = 0
        |UNION ALL SELECT s.s_suppkey*10+5, 2
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = 0""".stripMargin) { (s, dir) =>
      session(s, dir).cypher(
        "CALL gds.shortestPath(1, 'IN') YIELD node_id, distance RETURN node_id, distance")
    },

    // Weighted SSSP (Dijkstra) over the co-purchase graph: edge cost =
    // (p + p2) % 9 + 1 (a pure function of the canonical pair, so the
    // oracle recomputes it), source = the smallest part node, costs
    // capped at 15 on BOTH sides. The engine runs GraphX Pregel
    // min-plus to convergence; the oracle explores (node, cost) states
    // with a DuckDB recursive CTE — the UNION dedups states and the
    // cap bounds them, so it terminates, and positive weights mean any
    // path with total cost <= 15 has all prefixes <= 15: min(cost) per
    // node equals the true shortest cost wherever that is <= 15.
    sql("gds_dijkstra",
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |pair AS (SELECT DISTINCT a.p AS pa, b.p AS pb
        |         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |e AS (SELECT pa*10+6 AS src, pb*10+6 AS dst, (pa + pb) % 9 + 1 AS w FROM pair
        |      UNION ALL
        |      SELECT pb*10+6, pa*10+6, (pa + pb) % 9 + 1 FROM pair),
        |walk(node, cost) AS (
        |  SELECT CAST(min(p)*10+6 AS BIGINT), CAST(0 AS BIGINT) FROM li
        |  UNION
        |  SELECT e.dst, walk.cost + e.w
        |  FROM walk JOIN e ON e.src = walk.node
        |  WHERE walk.cost + e.w <= 15)
        |SELECT node AS node_id, CAST(min(cost) AS BIGINT) AS cost
        |FROM walk GROUP BY node""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{col, min}
      val src = graft.core.Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 3000)
        .agg(min("l_partkey")).collect().head.getLong(0) * 10 + 6
      coSession(s, dir).cypher(
        s"CALL gds.dijkstra($src, 'CO') YIELD node_id, cost " +
          "WHERE cost <= 15 RETURN node_id, cost")
    },

    // Same recurrence over a WEIGHTED NAMED PROJECTION (r11 verdict
    // #6, the GDS calling convention): gds.graph.project declares
    // relationshipProperties='weight', and dijkstra names it via
    // relationshipWeightProperty — the projected edge set carries
    // ONLY topology + the declared property. Identical subgraph, so
    // the row hash-matches the same recursive-CTE oracle.
    sql("gds_dijkstra_projected",
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |pair AS (SELECT DISTINCT a.p AS pa, b.p AS pb
        |         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |e AS (SELECT pa*10+6 AS src, pb*10+6 AS dst, (pa + pb) % 9 + 1 AS w FROM pair
        |      UNION ALL
        |      SELECT pb*10+6, pa*10+6, (pa + pb) % 9 + 1 FROM pair),
        |walk(node, cost) AS (
        |  SELECT CAST(min(p)*10+6 AS BIGINT), CAST(0 AS BIGINT) FROM li
        |  UNION
        |  SELECT e.dst, walk.cost + e.w
        |  FROM walk JOIN e ON e.src = walk.node
        |  WHERE walk.cost + e.w <= 15)
        |SELECT node AS node_id, CAST(min(cost) AS BIGINT) AS cost
        |FROM walk GROUP BY node""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{col, min}
      val src = graft.core.Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 3000)
        .agg(min("l_partkey")).collect().head.getLong(0) * 10 + 6
      val gs = coSession(s, dir)
      gs.cypher(
        "CALL gds.graph.project('wco', 'part', 'CO', 'weight') YIELD graphName RETURN graphName")
        .collect()
      gs.cypher(
        s"CALL gds.dijkstra($src, 'wco', 'weight') YIELD node_id, cost " +
          "WHERE cost <= 15 RETURN node_id, cost")
    },

    // k-core of the co-purchase graph: both engines peel synchronously
    // for the same fixed round budget (engine early-exits only on a
    // converged graph, where further rounds are no-ops — identical
    // output either way); the oracle replays the rounds as chained
    // CTEs, the same generate-N-rounds idiom the pagerank oracle uses.
    sql("gds_kcore", kcoreOracleSql(k = 14, rounds = 8)) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.kcore('CO', 14, 8) YIELD node_id, deg RETURN node_id, deg")
    },

    // Hash-determinized random walks over the CO graph (node2vec
    // corpus prep): 5 steps from the ~2% start sample, step choice =
    // (start + (s+1)·7919) mod deg over rank-sorted neighbors. The
    // oracle replays every step as a chained join on the same ranked
    // neighbor table.
    sql("gds_randomwalk", {
      val base =
        """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          |            FROM lineitem WHERE l_orderkey < 3000),
          |pair AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
          |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
          |und AS MATERIALIZED (SELECT src, dst FROM pair
          |       UNION SELECT dst, src FROM pair),
          |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
          |rk AS MATERIALIZED (
          |  SELECT src, dst,
          |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rnk,
          |    CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg
          |  FROM und),
          |w0 AS MATERIALIZED (
          |  SELECT id AS start, CAST(0 AS BIGINT) AS step, id AS node
          |  FROM pnodes WHERE (id // 10) % 50 = 0)""".stripMargin
      val steps = (1 to 5).map { s =>
        s"""w$s AS MATERIALIZED (
           |  SELECT c.start, CAST($s AS BIGINT) AS step, r.dst AS node
           |  FROM w${s - 1} c JOIN rk r ON r.src = c.node
           |   AND r.rnk = (c.start + ${s * 7919}) % r.deg)""".stripMargin
      }
      (Seq(base) ++ steps).mkString(",\n") +
        "\nSELECT start, step, node FROM (" +
        (0 to 5).map(s => s"SELECT * FROM w$s").mkString(" UNION ALL ") + ")"
    }) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.randomWalk('CO', 5, 50) YIELD start, step, node RETURN start, step, node")
    },

    // FastRP-style integer embeddings over the CO graph: 8 dims, 2
    // neighbor-sum rounds from the deterministic sparse ±1/0 init.
    // The oracle replays init + both rounds dim-by-dim in SQL.
    sql("gds_fastrp",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT src, dst FROM pair
        |       UNION SELECT dst, src FROM pair),
        |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
        |dims AS MATERIALIZED (SELECT unnest(range(0, 8)) AS d),
        |v0 AS MATERIALIZED (
        |  SELECT n.id, d.d, (n.id * 1000003 + d.d * 7919) % 97 % 3 - 1 AS val
        |  FROM pnodes n, dims d),
        |a1 AS MATERIALIZED (
        |  SELECT u.src AS id, v.d, SUM(v.val) AS val
        |  FROM und u JOIN v0 v ON v.id = u.dst GROUP BY 1, 2),
        |v1 AS MATERIALIZED (
        |  SELECT nd.id, nd.d, COALESCE(a.val, 0) AS val
        |  FROM (SELECT n.id, d.d FROM pnodes n, dims d) nd
        |  LEFT JOIN a1 a ON a.id = nd.id AND a.d = nd.d),
        |a2 AS MATERIALIZED (
        |  SELECT u.src AS id, v.d, SUM(v.val) AS val
        |  FROM und u JOIN v1 v ON v.id = u.dst GROUP BY 1, 2),
        |v2 AS (
        |  SELECT nd.id, nd.d, COALESCE(a.val, 0) AS val
        |  FROM (SELECT n.id, d.d FROM pnodes n, dims d) nd
        |  LEFT JOIN a2 a ON a.id = nd.id AND a.d = nd.d)
        |SELECT id AS node_id, CAST(d AS BIGINT) AS dim, CAST(val AS BIGINT) AS ival
        |FROM v2""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.fastRP('CO', 8, 2) YIELD node_id, dim, ival RETURN node_id, dim, ival")
    },

    // Graph-embedding similarity — the full "embed the graph, then
    // search it" pipeline in one graded query: fastRP integer
    // embeddings over CO, pivoted to per-node vectors, then exact
    // top-5 neighbors by integer dot product for a ~2% sampled query
    // set (brute force over the embedded table — the ann_topk
    // discipline; at 100 TB the LSH/IVF/PQ routes in Similarity.scala
    // take over on the same vectors). Ties break on neighbor id.
    sql("ann_graph_embed",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT src, dst FROM pair
        |       UNION SELECT dst, src FROM pair),
        |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
        |dims AS MATERIALIZED (SELECT unnest(range(0, 8)) AS d),
        |v0 AS MATERIALIZED (
        |  SELECT n.id, d.d, (n.id * 1000003 + d.d * 7919) % 97 % 3 - 1 AS val
        |  FROM pnodes n, dims d),
        |a1 AS MATERIALIZED (
        |  SELECT u.src AS id, v.d, SUM(v.val) AS val
        |  FROM und u JOIN v0 v ON v.id = u.dst GROUP BY 1, 2),
        |v1 AS MATERIALIZED (
        |  SELECT nd.id, nd.d, COALESCE(a.val, 0) AS val
        |  FROM (SELECT n.id, d.d FROM pnodes n, dims d) nd
        |  LEFT JOIN a1 a ON a.id = nd.id AND a.d = nd.d),
        |a2 AS MATERIALIZED (
        |  SELECT u.src AS id, v.d, SUM(v.val) AS val
        |  FROM und u JOIN v1 v ON v.id = u.dst GROUP BY 1, 2),
        |v2 AS MATERIALIZED (
        |  SELECT nd.id, nd.d, COALESCE(a.val, 0) AS val
        |  FROM (SELECT n.id, d.d FROM pnodes n, dims d) nd
        |  LEFT JOIN a2 a ON a.id = nd.id AND a.d = nd.d),
        |scored AS (
        |  SELECT a.id AS q_id, b.id AS neighbor,
        |    CAST(SUM(a.val * b.val) AS BIGINT) AS idot
        |  FROM v2 a JOIN v2 b ON a.d = b.d AND b.id <> a.id
        |  WHERE (a.id // 10) % 50 = 0
        |  GROUP BY 1, 2)
        |SELECT q_id, neighbor, idot, rnk FROM (
        |  SELECT q_id, neighbor, idot,
        |    row_number() OVER (PARTITION BY q_id ORDER BY idot DESC, neighbor) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val emb = coSession(s, dir).cypher(
        "CALL gds.fastRP('CO', 8, 2) YIELD node_id, dim, ival RETURN node_id, dim, ival")
        .groupBy("node_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("ival")))),
          x => x.getField("ival")).as("vec"))
        // both the query side and the corpus side read this frame —
        // cache so the fastRP pipeline runs once, and RELEASE it once
        // the (tiny) result materializes: the Gds.finish discipline —
        // without it a rerun carries the prior run's blocks in
        // executor memory and re-executes the pipeline on top
        .persist()
      val qs = emb.filter(expr("(node_id div 10) % 50 = 0"))
        .select(col("node_id").as("q_id"), col("vec").as("qv"))
      val scored = emb.crossJoin(broadcast(qs))
        .filter(col("node_id") =!= col("q_id"))
        .select(col("q_id"), col("node_id").as("neighbor"),
          graft.functions.VectorFunctions.intDot(col("qv"), col("vec")).as("idot"))
      val w = Window.partitionBy("q_id").orderBy(col("idot").desc, col("neighbor"))
      val out = scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .localCheckpoint(true)
      emb.unpersist(blocking = false)
      out
    },

    // The 100 TB route for graph-embedding search, graded end to end:
    // fastRP embeddings → sign-LSH bucketing (4 deterministic ±1
    // hyperplanes over the 8 integer dims, bit = dot ≥ 0) → candidates
    // from a bucket EQUI join (work ∝ bucket collision volume, never
    // all-pairs) → exact integer-dot rerank, top-5 per query. The
    // oracle replays the identical pipeline (same hyperplane formula,
    // same tie rules), so recall differences vs brute force cannot
    // hide — both engines see the same buckets.
    sql("ann_graph_embed_lsh",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT src, dst FROM pair
        |       UNION SELECT dst, src FROM pair),
        |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
        |dims AS MATERIALIZED (SELECT unnest(range(0, 8)) AS d),
        |v0 AS MATERIALIZED (
        |  SELECT n.id, d.d, (n.id * 1000003 + d.d * 7919) % 97 % 3 - 1 AS val
        |  FROM pnodes n, dims d),
        |a1 AS MATERIALIZED (
        |  SELECT u.src AS id, v.d, SUM(v.val) AS val
        |  FROM und u JOIN v0 v ON v.id = u.dst GROUP BY 1, 2),
        |v1 AS MATERIALIZED (
        |  SELECT nd.id, nd.d, COALESCE(a.val, 0) AS val
        |  FROM (SELECT n.id, d.d FROM pnodes n, dims d) nd
        |  LEFT JOIN a1 a ON a.id = nd.id AND a.d = nd.d),
        |a2 AS MATERIALIZED (
        |  SELECT u.src AS id, v.d, SUM(v.val) AS val
        |  FROM und u JOIN v1 v ON v.id = u.dst GROUP BY 1, 2),
        |v2 AS MATERIALIZED (
        |  SELECT nd.id, nd.d, COALESCE(a.val, 0) AS val
        |  FROM (SELECT n.id, d.d FROM pnodes n, dims d) nd
        |  LEFT JOIN a2 a ON a.id = nd.id AND a.d = nd.d),
        |sig AS MATERIALIZED (
        |  SELECT v.id, j.j,
        |    CASE WHEN SUM(v.val * (((j.j*31 + v.d*17) % 7) % 2 * 2 - 1)) >= 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM v2 v, (SELECT unnest(range(0, 4)) AS j) j
        |  GROUP BY v.id, j.j),
        |bkt AS MATERIALIZED (
        |  SELECT id, CAST(SUM(bit << j) AS BIGINT) AS bucket FROM sig GROUP BY id),
        |cand AS (
        |  SELECT q.id AS q_id, c.id AS neighbor
        |  FROM bkt q JOIN bkt c ON c.bucket = q.bucket AND c.id <> q.id
        |  WHERE (q.id // 10) % 50 = 0),
        |scored AS (
        |  SELECT cd.q_id, cd.neighbor, CAST(SUM(a.val * b.val) AS BIGINT) AS idot
        |  FROM cand cd JOIN v2 a ON a.id = cd.q_id
        |  JOIN v2 b ON b.id = cd.neighbor AND b.d = a.d
        |  GROUP BY 1, 2)
        |SELECT q_id, neighbor, idot, rnk FROM (
        |  SELECT q_id, neighbor, idot,
        |    row_number() OVER (PARTITION BY q_id ORDER BY idot DESC, neighbor) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val emb = coSession(s, dir).cypher(
        "CALL gds.fastRP('CO', 8, 2) YIELD node_id, dim, ival RETURN node_id, dim, ival")
        .groupBy("node_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("ival")))),
          x => x.getField("ival")).as("vec"))
      // sign-LSH bucket: 4 deterministic ±1 hyperplanes over 8 dims
      val bucketCol = (0 until 4).map { j =>
        val dot = (0 until 8).map { d =>
          element_at(col("vec"), d + 1) * lit(((j * 31 + d * 17) % 7) % 2 * 2 - 1)
        }.reduce(_ + _)
        when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      val bucketed = emb.withColumn("bucket", bucketCol)
      val qs = bucketed.filter(expr("(node_id div 10) % 50 = 0"))
        .select(col("node_id").as("q_id"), col("vec").as("qv"), col("bucket").as("qb"))
      val scored = bucketed.join(qs,
          col("bucket") === col("qb") && col("node_id") =!= col("q_id"))
        .select(col("q_id"), col("node_id").as("neighbor"),
          graft.functions.VectorFunctions.intDot(col("qv"), col("vec")).as("idot"))
      val w = Window.partitionBy("q_id").orderBy(col("idot").desc, col("neighbor"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
    },

    // Louvain-style modularity moves over the CO graph: 4 rounds of
    // monotone (label-non-increasing — see Gds.louvain) integer-exact
    // gain argmax, tiebroken by community id.
    sql("gds_louvain", louvainOracleSql(rounds = 4)) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.louvain('CO', 4) YIELD node_id, community RETURN node_id, community")
    },

    // ArticleRank over the directed CO graph (canonical src<dst) —
    // the avg-degree-damped PageRank variant; on this view avgdeg is
    // genuinely nonzero so the recurrence differs from pageRank's.
    // Both engines run the identical scaled-Long recurrence with
    // davg = |E| // |V|; 10 chained-CTE iterations replay it exactly.
    sql("gds_articlerank", articleRankOracleSql(iterations = 10)) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.articleRank('CO', 10) YIELD node_id, iscore RETURN node_id, iscore")
    },

    // SCC over the directed part-flow graph (the one graded view with
    // real cycles — sf0.01 has a 432-node giant SCC plus singletons).
    // Engine: GraphX SCC (iterative peel, min-id labels). Oracle:
    // DuckDB builds the transitive closure of the SAME bounded edge
    // set and labels each node with the min id among mutually
    // reachable nodes — definitionally the SCC, computed a way only a
    // bounded probe can afford (closure is O(V·E); the engine's peel
    // is the scale path).
    sql("gds_scc",
      """WITH RECURSIVE li AS MATERIALIZED (
        |  SELECT l_orderkey AS o, l_partkey AS p, min(l_linenumber) AS ln
        |  FROM lineitem WHERE l_orderkey < 600 GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
        |  FROM li a JOIN li b ON a.o = b.o AND a.ln < b.ln),
        |pnodes AS MATERIALIZED (SELECT DISTINCT p FROM li),
        |reach(s, t) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN e ON e.src = r.t),
        |mutual AS (SELECT a.s AS a, a.t AS b
        |  FROM reach a JOIN reach b ON a.s = b.t AND a.t = b.s),
        |scc AS (SELECT n.p AS node, least(n.p, coalesce(min(m.b), n.p)) AS cmin
        |        FROM pnodes n LEFT JOIN mutual m ON m.a = n.p GROUP BY n.p)
        |SELECT CAST(node*10+6 AS BIGINT) AS node_id,
        |       CAST(cmin*10+6 AS BIGINT) AS component FROM scc""".stripMargin) { (s, dir) =>
      flowSession(s, dir).cypher(
        "CALL gds.scc('FLOW', 30) YIELD node_id, component RETURN node_id, component")
    },

    // Betweenness (integer stress form) over the co-purchase graph,
    // sampled sources (id % 97 < 2), 3-hop horizon. The oracle
    // enumerates simple paths of <= 3 hops from the same sources,
    // keeps each (s,t)'s minimum length, and counts (shortest path,
    // interior vertex) incidences — definitionally Σ σ_st(v), the
    // quantity the engine computes with the two-phase Brandes shape
    // (forward σ, backward continuation counts), never per-path.
    sql("gds_betweenness",
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |pair AS (SELECT DISTINCT a.p AS pa, b.p AS pb
        |         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |e AS (SELECT pa*10+6 AS src, pb*10+6 AS dst FROM pair
        |      UNION ALL SELECT pb*10+6, pa*10+6 FROM pair),
        |paths(s, v, len, pth) AS (
        |  SELECT src, dst, 1, [src, dst] FROM e WHERE src % 97 < 2
        |  UNION ALL
        |  SELECT s, e.dst, len+1, list_append(pth, e.dst)
        |  FROM paths JOIN e ON e.src = paths.v
        |  WHERE len < 3 AND NOT list_contains(pth, e.dst)),
        |mind AS (SELECT s, v AS t, min(len) AS d FROM paths GROUP BY s, v),
        |sp AS (SELECT p.s, p.v AS t, p.pth FROM paths p
        |       JOIN mind m ON m.s = p.s AND m.t = p.v AND m.d = p.len),
        |interior AS (SELECT u.x AS v FROM sp, unnest(pth[2:len(pth)-1]) u(x))
        |SELECT v AS node_id, CAST(count(*) AS BIGINT) AS stress
        |FROM interior GROUP BY v""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.betweenness('CO', 3, 97, 2) YIELD node_id, stress " +
          "RETURN node_id, stress")
    },

    // PageRank over IN edges, 10 fixed iterations. Rank arithmetic is
    // scaled-Long on both engines (Gds.pageRank), so the hash gate
    // holds: the oracle replays the same integer recurrence as chained
    // CTEs — `//` floor division == Long division for positive ranks,
    // and BIGINT sums are order-independent.
    sql("gds_pagerank", pagerankOracleSql(10)) { (s, dir) =>
      session(s, dir).cypher(
        "CALL gds.pageRank('IN', 10) YIELD node_id, iscore RETURN node_id, iscore")
    },

    // GDS WRITE mode end to end: the same 10-iteration PageRank, but
    // the scores fold BACK onto the nodes as a property through the
    // node delta-log (gds.pageRank.write), and the graded read-back
    // goes through ordinary Cypher property access — algorithms
    // compose with the mutation machinery, not just YIELD. Fresh
    // session (the write mutates); identical oracle to gds_pagerank.
    sql("gds_pagerank_write", pagerankOracleSql(10)) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.tpch(s, dir))
      Packs.install(gs, Seq("graph-data-science"))
      gs.cypher(
        "CALL gds.pageRank.write('IN', 10, 'pr10') " +
          "YIELD nodePropertiesWritten RETURN nodePropertiesWritten").collect()
      gs.cypher(
        "MATCH (n) WHERE n.pr10 IS NOT NULL RETURN id(n) AS node_id, n.pr10 AS iscore")
    },

    // Eigenvector centrality over the CO graph, 10 power iterations:
    // neighbor-sum then max-renormalize, all scaled-Long — the oracle
    // replays the identical integer recurrence (eigenvectorOracleSql).
    sql("gds_eigenvector", eigenvectorOracleSql(10)) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.eigenvector('CO', 10) YIELD node_id, iscore RETURN node_id, iscore")
    },

    // HITS hubs & authorities over the FLOW digraph, 8 rounds of the
    // mutually-recursive update, each half max-renormalized — exact
    // scaled-Long on both engines (hitsOracleSql).
    sql("gds_hits", hitsOracleSql(8)) { (s, dir) =>
      flowSession(s, dir).cypher(
        "CALL gds.hits('FLOW', 8) YIELD node_id, ihub, iauth RETURN node_id, ihub, iauth")
    },

    // Weighted PageRank over the directed CO graph: the view's
    // deterministic weight property splits each node's rank
    // proportionally — exact scaled-Long on both engines, 10 chained
    // CTE iterations replay the recurrence.
    sql("gds_pagerank_weighted", weightedPagerankOracleSql(10)) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.pageRank('CO', 10, 'weight') YIELD node_id, iscore " +
          "RETURN node_id, iscore")
    },

    // Local clustering coefficient over the CO graph: triangles from
    // the GraphX pass, degree from the distinct symmetrized edge set,
    // ilcc = 2·t·1e6 // (d·(d−1)). The oracle enumerates each node's
    // connected neighbor pairs directly (u1/u2 fan joined back to the
    // canonical edge set) — affordable exactly because the probe
    // graph is bounded; the engine's GraphX pass is the scale path.
    sql("gds_lcc",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e0 AS MATERIALIZED (SELECT DISTINCT CAST(a.p*10+6 AS BIGINT) AS src,
        |        CAST(b.p*10+6 AS BIGINT) AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT src, dst FROM e0
        |       UNION SELECT dst, src FROM e0),
        |pnodes AS MATERIALIZED (SELECT DISTINCT CAST(p*10+6 AS BIGINT) AS id FROM li),
        |deg AS MATERIALIZED (SELECT src, count(*) AS degree FROM und GROUP BY src),
        |tri AS MATERIALIZED (
        |  SELECT u1.src AS id, count(*) AS t
        |  FROM und u1 JOIN und u2 ON u2.src = u1.src AND u1.dst < u2.dst
        |  JOIN e0 e ON e.src = u1.dst AND e.dst = u2.dst
        |  GROUP BY u1.src)
        |SELECT n.id AS node_id, CAST(COALESCE(t.t, 0) AS BIGINT) AS triangles,
        |  CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
        |  CAST(CASE WHEN COALESCE(d.degree, 0) >= 2
        |       THEN COALESCE(t.t, 0) * 2000000 // (d.degree * (d.degree - 1))
        |       ELSE 0 END AS BIGINT) AS ilcc
        |FROM pnodes n LEFT JOIN deg d ON d.src = n.id
        |LEFT JOIN tri t ON t.id = n.id""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.localClusteringCoefficient('CO') " +
          "YIELD node_id, triangles, degree, ilcc " +
          "RETURN node_id, triangles, degree, ilcc")
    },

    // gds.modularity over the CO graph's stored `community` property
    // (p mod 5 — a pure function of the part key, so the oracle
    // recomputes it): per community, internal edges, degree volume,
    // and the exact scaled (Q_c + 1) term. Both sides floor-divide
    // a non-negative Long numerator, so the hash gate holds.
    sql("gds_modularity",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p AS pa, b.p AS pb
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |mm AS (SELECT count(*) AS m FROM pair),
        |pn AS MATERIALIZED (SELECT DISTINCT p FROM li),
        |deg AS MATERIALIZED (SELECT x, count(*) AS d FROM
        |  (SELECT pa AS x FROM pair UNION ALL SELECT pb FROM pair) GROUP BY x),
        |vol AS MATERIALIZED (
        |  SELECT pn.p % 5 AS community, sum(COALESCE(deg.d, 0)) AS vol
        |  FROM pn LEFT JOIN deg ON deg.x = pn.p GROUP BY 1),
        |ein AS (SELECT pa % 5 AS community, count(*) AS e_in FROM pair
        |  WHERE pa % 5 = pb % 5 GROUP BY 1)
        |SELECT CAST(v.community AS BIGINT) AS community,
        |  CAST(COALESCE(e.e_in, 0) AS BIGINT) AS e_in,
        |  CAST(v.vol AS BIGINT) AS vol,
        |  CAST((COALESCE(e.e_in, 0) * 4 * mm.m - v.vol * v.vol + 4 * mm.m * mm.m)
        |    * 1000000 // (4 * mm.m * mm.m) AS BIGINT) AS iq1m
        |FROM vol v CROSS JOIN mm
        |LEFT JOIN ein e ON e.community = v.community""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.modularity('CO', 'community') YIELD community, e_in, vol, iq1m " +
          "RETURN community, e_in, vol, iq1m")
    },

    // gds.conductance over the same stored assignment: cut edges count
    // toward both endpoint communities; denominator = the smaller
    // side's degree volume.
    sql("gds_conductance",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT a.p AS pa, b.p AS pb
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |mm AS (SELECT count(*) AS m FROM pair),
        |pn AS MATERIALIZED (SELECT DISTINCT p FROM li),
        |deg AS MATERIALIZED (SELECT x, count(*) AS d FROM
        |  (SELECT pa AS x FROM pair UNION ALL SELECT pb FROM pair) GROUP BY x),
        |vol AS MATERIALIZED (
        |  SELECT pn.p % 5 AS community, sum(COALESCE(deg.d, 0)) AS vol
        |  FROM pn LEFT JOIN deg ON deg.x = pn.p GROUP BY 1),
        |cut AS (SELECT c AS community, count(*) AS cut FROM (
        |  SELECT pa % 5 AS c FROM pair WHERE pa % 5 <> pb % 5
        |  UNION ALL SELECT pb % 5 FROM pair WHERE pa % 5 <> pb % 5) GROUP BY c)
        |SELECT CAST(v.community AS BIGINT) AS community,
        |  CAST(COALESCE(ct.cut, 0) AS BIGINT) AS cut,
        |  CAST(v.vol AS BIGINT) AS vol,
        |  CAST(CASE WHEN LEAST(v.vol, 2 * mm.m - v.vol) <= 0 THEN 0
        |    ELSE COALESCE(ct.cut, 0) * 1000000 // LEAST(v.vol, 2 * mm.m - v.vol)
        |    END AS BIGINT) AS icond1m
        |FROM vol v CROSS JOIN mm
        |LEFT JOIN cut ct ON ct.community = v.community""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.conductance('CO', 'community') YIELD community, cut, vol, icond1m " +
          "RETURN community, cut, vol, icond1m")
    },

    // apoc.path.subgraphNodes — filtered BFS from region 0 following
    // INCOMING `IN` edges two levels deep: level 1 = the region's
    // nations, level 2 = their customers and suppliers. The node-id
    // tag spaces are disjoint, so the oracle is three closed-form
    // unions (no recursion needed at this bounded depth).
    sql("apoc_subgraph_nodes",
      """SELECT CAST(1 AS BIGINT) AS node_id, CAST(0 AS BIGINT) AS level
        |UNION ALL
        |SELECT CAST(n_nationkey*10+2 AS BIGINT), CAST(1 AS BIGINT)
        |FROM nation WHERE n_regionkey = 0
        |UNION ALL
        |SELECT CAST(c_custkey*10+3 AS BIGINT), CAST(2 AS BIGINT)
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE n.n_regionkey = 0
        |UNION ALL
        |SELECT CAST(s_suppkey*10+5 AS BIGINT), CAST(2 AS BIGINT)
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_regionkey = 0""".stripMargin) { (s, dir) =>
      session(s, dir).cypher(
        "CALL apoc.path.subgraphNodes(1, '<IN', 2) YIELD node_id, level " +
          "RETURN node_id, level")
    },

    // apoc.path.expandConfig with a label blacklist: same traversal,
    // but `-supplier` prunes supplier nodes from the frontier and
    // minLevel = maxLevel = 2 keeps only the outermost ring — the
    // region's customers.
    sql("apoc_path_expand",
      """SELECT CAST(c_custkey*10+3 AS BIGINT) AS node_id, CAST(2 AS BIGINT) AS level
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE n.n_regionkey = 0""".stripMargin) { (s, dir) =>
      session(s, dir).cypher(
        "CALL apoc.path.expandConfig(1, '<IN', '-supplier', 2, 2) " +
          "YIELD node_id, level RETURN node_id, level")
    },

    // apoc.path.spanningTree over the CO graph (both directions, two
    // levels from the smallest edge-incident part node): each node
    // reports the smallest-id neighbor that discovered it — the
    // deterministic parent rule lets DuckDB replay the tree exactly
    // with two min-aggregated frontier joins.
    sql("apoc_spanning_tree",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |pair AS MATERIALIZED (SELECT DISTINCT CAST(a.p*10+6 AS BIGINT) AS src,
        |        CAST(b.p*10+6 AS BIGINT) AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT src, dst FROM pair
        |       UNION SELECT dst, src FROM pair),
        |s0 AS (SELECT min(src) AS s FROM und),
        |l1 AS MATERIALIZED (
        |  SELECT u.dst AS node_id, min(u.src) AS parent_id
        |  FROM und u JOIN s0 ON u.src = s0.s GROUP BY u.dst),
        |l2 AS (
        |  SELECT u.dst AS node_id, min(u.src) AS parent_id
        |  FROM und u JOIN l1 ON u.src = l1.node_id
        |  WHERE u.dst NOT IN (SELECT node_id FROM l1)
        |    AND u.dst <> (SELECT s FROM s0)
        |  GROUP BY u.dst)
        |SELECT s AS node_id, CAST(NULL AS BIGINT) AS parent_id,
        |  CAST(0 AS BIGINT) AS level FROM s0
        |UNION ALL
        |SELECT node_id, parent_id, CAST(1 AS BIGINT) FROM l1
        |UNION ALL
        |SELECT node_id, parent_id, CAST(2 AS BIGINT) FROM l2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{min => smin}
      val gs = coSession(s, dir)
      val start = gs.graph().edges.agg(smin("src")).collect()(0).getLong(0)
      gs.cypher(
        s"CALL apoc.path.spanningTree($start, 'CO', 2) " +
          "YIELD node_id, parent_id, level RETURN node_id, parent_id, level")
    },

    // nodeSimilarity over a bounded order->part subgraph (CONTAINS
    // edges, l_orderkey < 3000): Jaccard of part sets for order pairs
    // sharing a part. Integer scores; the oracle mirrors the blocking.
    sql("gds_node_similarity",
      """WITH e AS (SELECT DISTINCT l_orderkey*10+4 AS src, l_partkey*10+6 AS dst
        |           FROM lineitem WHERE l_orderkey < 3000),
        |d AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM e)
        |SELECT node1, node2, ijac FROM (
        |  SELECT a.src AS node1, b.src AS node2,
        |    CAST(floor(count(*)*1000000.0/(a.deg + b.deg - count(*)) + 0.5) AS BIGINT) AS ijac
        |  FROM d a JOIN d b ON a.dst = b.dst AND a.src < b.src
        |  GROUP BY a.src, b.src, a.deg, b.deg)
        |ORDER BY node1, node2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val li = graft.core.Tables.lineitem(s, dir).filter(col("l_orderkey") < 3000)
      val edges = li.select(
        (col("l_orderkey") * 10 + 4).as("src"),
        (col("l_partkey") * 10 + 6).as("dst"),
        lit("CONTAINS").as("relType"))
      val g = graft.core.PropertyGraph(
        graft.core.PropertyGraph.empty(s).nodes, edges)
      graft.procs.Gds.nodeSimilarity(s, g, None)
    },

    // Resource-allocation link prediction over the bounded co-purchase
    // graph: candidate pairs blocked on the shared neighbor, each
    // common neighbor z contributing floor(1e6/deg(z)) — integer
    // division on both engines, so the score is hash-exact. The
    // oracle recomputes degrees with the same window over the
    // symmetrized edge set.
    sql("gds_resource_allocation",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e0 AS (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |       FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |adj AS (SELECT src AS z, dst AS n,
        |               count(*) OVER (PARTITION BY src) AS deg FROM sym)
        |SELECT a.n AS node1, b.n AS node2,
        |       CAST(sum(1000000 // a.deg) AS BIGINT) AS ira
        |FROM adj a JOIN adj b ON a.z = b.z AND a.n < b.n
        |GROUP BY 1, 2
        |HAVING sum(1000000 // a.deg) >= 200000
        |ORDER BY node1, node2""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.resourceAllocation('CO', 200000) YIELD node1, node2, ira RETURN node1, node2, ira")
    },

    // Resource allocation with the maxDeg hub cap engaged: adjacency
    // rows whose MIDDLE node z has degree above the cap are dropped
    // before the blocked self-join (the standard LP practice — hubs
    // contribute ≈0 anyway and their blocks are the deg(z)² skew
    // hazard). The oracle mirrors the cap with the same window +
    // filter on the symmetrized adjacency, so a regression in WHICH
    // degree the cap applies to (middle vs endpoint) hash-fails.
    sql("gds_resource_allocation_capped",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e0 AS (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |       FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |adj AS (SELECT src AS z, dst AS n,
        |               count(*) OVER (PARTITION BY src) AS deg FROM sym),
        |capped AS (SELECT z, n, deg FROM adj WHERE deg <= 30)
        |SELECT a.n AS node1, b.n AS node2,
        |       CAST(sum(1000000 // a.deg) AS BIGINT) AS ira
        |FROM capped a JOIN capped b ON a.z = b.z AND a.n < b.n
        |GROUP BY 1, 2
        |HAVING sum(1000000 // a.deg) >= 100000
        |ORDER BY node1, node2""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.resourceAllocation('CO', 100000, 30) YIELD node1, node2, ira " +
          "RETURN node1, node2, ira")
    },

    // nodeSimilarity with GDS's topK knob (default 10 there): each
    // canonical pair owner keeps its K most similar neighbors under
    // the deterministic (ijac DESC, node2 ASC) rank — the knob that
    // bounds output and downstream shuffle on dense graphs. Oracle
    // mirrors the window exactly.
    sql("gds_node_similarity_topk",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e AS (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |d AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM e),
        |sim AS (SELECT a.src AS node1, b.src AS node2,
        |    CAST(floor(count(*)*1000000.0/(a.deg + b.deg - count(*)) + 0.5) AS BIGINT) AS ijac
        |  FROM d a JOIN d b ON a.dst = b.dst AND a.src < b.src
        |  GROUP BY a.src, b.src, a.deg, b.deg),
        |ranked AS (SELECT node1, node2, ijac,
        |    row_number() OVER (PARTITION BY node1 ORDER BY ijac DESC, node2) AS rn
        |  FROM sim WHERE ijac >= 1)
        |SELECT node1, node2, ijac FROM ranked WHERE rn <= 3
        |ORDER BY node1, node2""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.nodeSimilarity('CO', 1, 3) YIELD node1, node2, ijac " +
          "RETURN node1, node2, ijac")
    },

    // GDS RELATIONSHIP write mode end to end (r14 verdict #5): the same
    // topK-bounded similarity, but each scored pair materializes as a
    // NEW (node1)-[:SIMILAR {score}]->(node2) relationship through the
    // eid-keyed edge delta (GraftSession.writeRelationships), and the
    // graded read-back goes through ordinary pattern matching —
    // algorithm output composes with the mutation machinery on the
    // EDGE side too. Fresh session (the write mutates); identical
    // oracle to gds_node_similarity_topk.
    sql("gds_node_similarity_write",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e AS (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |d AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM e),
        |sim AS (SELECT a.src AS node1, b.src AS node2,
        |    CAST(floor(count(*)*1000000.0/(a.deg + b.deg - count(*)) + 0.5) AS BIGINT) AS ijac
        |  FROM d a JOIN d b ON a.dst = b.dst AND a.src < b.src
        |  GROUP BY a.src, b.src, a.deg, b.deg),
        |ranked AS (SELECT node1, node2, ijac,
        |    row_number() OVER (PARTITION BY node1 ORDER BY ijac DESC, node2) AS rn
        |  FROM sim WHERE ijac >= 1)
        |SELECT node1, node2, ijac FROM ranked WHERE rn <= 3
        |ORDER BY node1, node2""".stripMargin) { (s, dir) =>
      val gs = new GraftSession(s)
      gs.setGraph(GraphViews.copurchase(s, dir))
      Packs.install(gs, Seq("graph-data-science"))
      gs.cypher(
        "CALL gds.nodeSimilarity.write('CO', 1, 3, 'SIMILAR', 'score') " +
          "YIELD relationshipsWritten RETURN relationshipsWritten").collect()
      gs.cypher(
        """MATCH (a:part)-[r:SIMILAR]->(b:part)
          |RETURN id(a) AS node1, id(b) AS node2, r.score AS ijac
          |ORDER BY node1, node2""".stripMargin)
    },

    // Per-node triangle count over the bounded part co-purchase graph
    // (parts sharing an order, l_orderkey < 3000, canonical src < dst).
    // The oracle enumerates triangles a<b<c by a three-way edge join
    // and credits each corner — exactly GraphX TriangleCount's
    // "triangles passing through each vertex" semantic. Counts are
    // integers, so the hash gate holds.
    sql("gds_triangle_count",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e AS (SELECT DISTINCT a.p*10+6 AS src, b.p*10+6 AS dst
        |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |        JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |cnt AS (SELECT node_id, count(*) AS t FROM (
        |          SELECT a AS node_id FROM tri
        |          UNION ALL SELECT b FROM tri
        |          UNION ALL SELECT c FROM tri) GROUP BY node_id)
        |SELECT n.id AS node_id, CAST(COALESCE(cnt.t, 0) AS BIGINT) AS triangles
        |FROM (SELECT DISTINCT p*10+6 AS id FROM li) n
        |LEFT JOIN cnt ON cnt.node_id = n.id
        |ORDER BY node_id""".stripMargin) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.triangleCount('CO') YIELD node_id, triangles RETURN node_id, triangles")
    },

    // Label propagation over the co-purchase graph, 4 fixed sync
    // iterations with the deterministic smallest-label tie-break —
    // community detection as DataFrame argmax iterations, replayed by
    // the oracle as chained CTEs.
    sql("gds_label_propagation", lpaOracleSql(4)) { (s, dir) =>
      coSession(s, dir).cypher(
        "CALL gds.labelPropagation('CO', 4) YIELD node_id, label RETURN node_id, label")
    },

    // Closeness + harmonic centrality over the IN forest. The engine
    // runs the generic iterative-BFS operator (Gds.hopDistances); the
    // oracle exploits the KNOWN topology — each region tree is
    // region <- nations <- leaves, so every node's distance profile is
    // a closed form of (leaves-in-my-nation Ln, nations-in-region Nr,
    // leaves-in-region Lr). A disagreement in ANY node's score means
    // the BFS visited a wrong frontier — strong coverage for 4 hops.
    // Source-sampled (id % 97 < 2, ~2%): exact all-pairs BFS is O(V·E)
    // message volume by definition — unaffordable already at sf0.1
    // (measured, not guessed), which is exactly why production
    // centrality on big graphs samples sources. The oracle applies the
    // same root predicate to the closed-form scores, so the sampled
    // run is still hash-exact. Exhaustive coverage of the BFS itself
    // comes from sf0.01-equivalent PacksSpec fixtures (sampleMod=1).
    sql("gds_closeness", centralityOracleSql(closeness = true)) { (s, dir) =>
      session(s, dir).cypher(
        "CALL gds.closeness('IN', 4, 97, 2) YIELD node_id, n_reachable, sum_dist, iscore " +
          "RETURN node_id, n_reachable, sum_dist, iscore")
    },

    sql("gds_harmonic", centralityOracleSql(closeness = false)) { (s, dir) =>
      session(s, dir).cypher(
        "CALL gds.harmonic('IN', 4, 97, 2) YIELD node_id, hscore RETURN node_id, hscore")
    },

    // Closeness WRITE mode (r15 verdict #2 — finishing the write
    // sweep): the same sampled 4-hop BFS, scores folded back onto the
    // nodes through the delta-log and read back via ordinary Cypher
    // property access. Fresh session (the write mutates); the oracle
    // is gds_closeness's closed form projected to the written column.
    sql("gds_closeness_write",
      s"SELECT node_id, iscore FROM (${centralityOracleSql(closeness = true)}) t") {
      (s, dir) =>
        val gs = new GraftSession(s)
        gs.setGraph(GraphViews.tpch(s, dir))
        Packs.install(gs, Seq("graph-data-science"))
        gs.cypher("CALL gds.closeness.write('IN', 4, 97, 2, 'cw4') " +
          "YIELD nodePropertiesWritten RETURN nodePropertiesWritten").collect()
        gs.cypher(
          "MATCH (n) WHERE n.cw4 IS NOT NULL RETURN id(n) AS node_id, n.cw4 AS iscore")
    }
  )
}
