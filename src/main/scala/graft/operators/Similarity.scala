package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor similarity search over the
  * `embeddings` table (driver north star; the gds.nodeSimilarity /
  * genai-pack analog — ref neo4j-plugins.json:31-36).
  *
  * Three plans, all oracle-checked with exact integer cosine scores
  * (see [[graft.functions.VectorFunctions]] quantization). Per-vector
  * norms are computed once before any join so per-pair scoring folds
  * the arrays exactly once.
  *
  *  - `ann_topk`: brute-force exact top-k. The tiny query side is
  *    broadcast and every data row is scanned once — for a handful of
  *    query vectors this IS the right distributed plan (one narrow
  *    pass over n rows, top-k via window).
  *  - `ann_topk_lsh`: sign-LSH path — queries and data bucket on the
  *    signature and equi-join (hash join), so each query scores only
  *    its bucket's candidates. Recall < 1 by design; the oracle
  *    mirrors the same bucketing.
  *  - `ann_topk_ivf`: IVF path — a deterministic "coarse quantizer"
  *    (the first NLIST vectors act as centroids), every vector is
  *    assigned to its nearest centroid cell, and each query probes
  *    only its own cell. At scale the centroid table stays broadcast
  *    (NLIST << n) and the cell assignment is one narrow pass.
  */
object Similarity {

  private val LSH_BITS = 4
  private val DIM = 64
  private val K = 5
  private val NQ = 8 // query vectors: vec_id < NQ
  private val NLIST = 16 // IVF centroid count (vec_id < NLIST)
  private val PQ_M = 8 // PQ subspaces
  private val PQ_SUB = DIM / PQ_M // dims per subspace
  private val PQ_KC = 16 // codewords per subspace (vec_id < PQ_KC "train")

  private def topkSql(scoredCte: String) =
    s"""SELECT q_id, neighbor, icos, rnk FROM (
       |  SELECT q_id, neighbor, icos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY icos DESC, neighbor) AS rnk
       |  FROM $scoredCte)
       |WHERE rnk <= $K""".stripMargin

  private def topk(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("icos").desc, col("neighbor"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
  }

  /** vec_id, q (quantized), nrm — the shared scan. */
  private def qe(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"), V.qNorm(col("q")).as("nrm"))

  private val qeSql =
    s"""qe AS (SELECT vec_id, q, ${V.qNormSql("q")} AS nrm FROM
       |  (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings))""".stripMargin

  def all: Seq[QueryDef] = Seq(

    sql("ann_topk", {
      s"""WITH $qeSql,
         |qs AS (SELECT vec_id AS q_id, q AS qq, nrm AS qn FROM qe WHERE vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor,
         |    ${V.icosNSql("qq", "e.q", "qn", "e.nrm")} AS icos
         |  FROM qs JOIN qe e ON e.vec_id <> qs.q_id)
         |${topkSql("scored")}""".stripMargin
    }) { (s, d) =>
      val e = qe(s, d)
      val qs = e.filter(col("vec_id") < NQ).toDF("q_id", "qq", "qn")
      val scored = e.toDF("neighbor", "qv", "nv")
        .crossJoin(broadcast(qs))
        .filter(col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"),
          V.icosN(col("qq"), col("qv"), col("qn"), col("nv")).as("icos"))
      topk(scored)
    },

    // Maximum-inner-product search (the retrieval scoring for
    // dot-product-trained embedding models): identical broadcast plan
    // to ann_topk but the score is the RAW integer dot product — no
    // norm divide, so high-magnitude vectors legitimately dominate.
    // Pure Long arithmetic via the codegen'd IntDotProduct expression
    // → exact, order-independent, hash-gradeable. At scale the
    // LSH-bucketed variant applies after the standard norm-augmentation
    // reduction ([x; sqrt(M²-|x|²)] turns MIPS into cosine); the
    // brute pass here is the exact baseline recall is measured against.
    sql("ann_mips", {
      s"""WITH $qeSql,
         |qs AS (SELECT vec_id AS q_id, q AS qq FROM qe WHERE vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor,
         |    CAST(list_dot_product(qq, e.q) AS BIGINT) AS idp
         |  FROM qs JOIN qe e ON e.vec_id <> qs.q_id)
         |SELECT q_id, neighbor, idp, rnk FROM (
         |  SELECT q_id, neighbor, idp,
         |    row_number() OVER (PARTITION BY q_id ORDER BY idp DESC, neighbor) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin
    }) { (s, d) =>
      val e = qe(s, d)
      val qs = e.filter(col("vec_id") < NQ).select(col("vec_id").as("q_id"), col("q").as("qq"))
      val scored = e.select(col("vec_id").as("neighbor"), col("q").as("qv"))
        .crossJoin(broadcast(qs))
        .filter(col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"), V.intDot(col("qq"), col("qv")).as("idp"))
      val w = Window.partitionBy("q_id").orderBy(col("idp").desc, col("neighbor"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
    },

    sql("ann_topk_lsh", {
      val sig = V.lshSignatureSql("q", LSH_BITS, DIM)
      s"""WITH $qeSql,
         |sg AS (SELECT vec_id, q, nrm, $sig AS bucket FROM qe),
         |qs AS (SELECT vec_id AS q_id, q AS qq, nrm AS qn, bucket FROM sg WHERE vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor,
         |    ${V.icosNSql("qq", "e.q", "qn", "e.nrm")} AS icos
         |  FROM qs JOIN sg e ON e.bucket = qs.bucket AND e.vec_id <> qs.q_id)
         |${topkSql("scored")}""".stripMargin
    }) { (s, d) =>
      val sg = qe(s, d)
        .withColumn("bucket", V.lshSignature(col("q"), LSH_BITS, DIM))
      val qs = sg.filter(col("vec_id") < NQ).toDF("q_id", "qq", "qn", "qbucket")
      val scored = sg.toDF("neighbor", "qv", "nv", "bucket")
        .join(broadcast(qs), col("bucket") === col("qbucket") && col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"),
          V.icosN(col("qq"), col("qv"), col("qn"), col("nv")).as("icos"))
      topk(scored)
    },

    // kNN GRAPH construction: EVERY vector is a query (retrieval-eval /
    // dedup-graph building). No broadcast side — both sides are the
    // full table, equi-joined on the LSH bucket (shuffled hash join),
    // so work is proportional to bucket collision volume and the plan
    // scales with executors, not with a driver-side query list.
    // LSH_BITS grows with log n at scale to bound bucket sizes.
    sql("ann_knn_graph", {
      val sig = V.lshSignatureSql("q", LSH_BITS, DIM)
      s"""WITH $qeSql,
         |sg AS (SELECT vec_id, q, nrm, $sig AS bucket FROM qe),
         |scored AS (
         |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor,
         |    ${V.icosNSql("a.q", "b.q", "a.nrm", "b.nrm")} AS icos
         |  FROM sg a JOIN sg b ON b.bucket = a.bucket AND b.vec_id <> a.vec_id)
         |SELECT q_id, neighbor, icos, rnk FROM (
         |  SELECT q_id, neighbor, icos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY icos DESC, neighbor) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3""".stripMargin
    }) { (s, d) =>
      val sg = qe(s, d).withColumn("bucket", V.lshSignature(col("q"), LSH_BITS, DIM))
      val a = sg.toDF("q_id", "qa", "na", "bucket")
      val b = sg.toDF("neighbor", "qb", "nb", "bucket2")
      val scored = a.join(b,
          col("bucket") === col("bucket2") && col("q_id") =!= col("neighbor"))
        .select(col("q_id"), col("neighbor"),
          V.icosN(col("qa"), col("qb"), col("na"), col("nb")).as("icos"))
      val w = Window.partitionBy("q_id").orderBy(col("icos").desc, col("neighbor"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    },

    // RANGE (radius) search: every neighbor with cosine >= tau per
    // query — the other retrieval contract besides top-k (dedup
    // candidate pull, near-duplicate fetch). LSH-bucketed like
    // ann_topk_lsh so each query scores only its bucket; the result
    // set size is data-driven, not k-bounded, so there is no window —
    // just the threshold filter (cheaper than top-k at scale).
    sql("ann_range", {
      val sig = V.lshSignatureSql("q", LSH_BITS, DIM)
      s"""WITH $qeSql,
         |sg AS (SELECT vec_id, q, nrm, $sig AS bucket FROM qe),
         |qs AS (SELECT vec_id AS q_id, q AS qq, nrm AS qn, bucket FROM sg WHERE vec_id < $NQ)
         |SELECT q_id, e.vec_id AS neighbor,
         |  ${V.icosNSql("qq", "e.q", "qn", "e.nrm")} AS icos
         |FROM qs JOIN sg e ON e.bucket = qs.bucket AND e.vec_id <> qs.q_id
         |WHERE ${V.icosNSql("qq", "e.q", "qn", "e.nrm")} >= 150000""".stripMargin
    }) { (s, d) =>
      val sg = qe(s, d)
        .withColumn("bucket", V.lshSignature(col("q"), LSH_BITS, DIM))
      val qs = sg.filter(col("vec_id") < NQ).toDF("q_id", "qq", "qn", "qbucket")
      sg.toDF("neighbor", "qv", "nv", "bucket")
        .join(broadcast(qs), col("bucket") === col("qbucket") && col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"),
          V.icosN(col("qq"), col("qv"), col("qn"), col("nv")).as("icos"))
        .filter(col("icos") >= 150000L)
    },

    sql("ann_topk_ivf", {
      // cell = argmax centroid cosine (ties -> lowest centroid id)
      s"""WITH $qeSql,
         |cent AS (SELECT vec_id AS c_id, q AS cq, nrm AS cn FROM qe WHERE vec_id < $NLIST),
         |assign AS (
         |  SELECT vec_id, q, nrm, c_id AS cell FROM (
         |    SELECT e.vec_id, e.q, e.nrm, cent.c_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${V.icosNSql("e.q", "cq", "e.nrm", "cn")} DESC, cent.c_id) AS rc
         |    FROM qe e, cent)
         |  WHERE rc = 1),
         |qs AS (SELECT vec_id AS q_id, q AS qq, nrm AS qn, cell FROM assign WHERE vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor,
         |    ${V.icosNSql("qq", "e.q", "qn", "e.nrm")} AS icos
         |  FROM qs JOIN assign e ON e.cell = qs.cell AND e.vec_id <> qs.q_id)
         |${topkSql("scored")}""".stripMargin
    }) { (s, d) =>
      val e = qe(s, d)
      val cent = e.filter(col("vec_id") < NLIST).toDF("c_id", "cq", "cn")
      val wc = Window.partitionBy("vec_id")
        .orderBy(V.icosN(col("q"), col("cq"), col("nrm"), col("cn")).desc, col("c_id"))
      val assign = e.crossJoin(broadcast(cent))
        .withColumn("rc", row_number().over(wc))
        .filter(col("rc") === 1)
        .select(col("vec_id"), col("q"), col("nrm"), col("c_id").as("cell"))
      val qs = assign.filter(col("vec_id") < NQ).toDF("q_id", "qq", "qn", "qcell")
      val scored = assign.toDF("neighbor", "qv", "nv", "cell")
        .join(broadcast(qs), col("cell") === col("qcell") && col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"),
          V.icosN(col("qq"), col("qv"), col("qn"), col("nv")).as("icos"))
      topk(scored)
    },

    // IVF multi-probe: queries probe their top-2 nearest cells (the
    // standard recall knob — a query near a cell boundary also checks
    // the runner-up cell). Corpus assignment stays single-cell, so a
    // (query, neighbor) pair can match through at most one probe and
    // no dedup pass is needed. Work doubles on the (tiny, broadcast)
    // query side only.
    sql("ann_topk_ivf_probe2", {
      s"""WITH $qeSql,
         |cent AS (SELECT vec_id AS c_id, q AS cq, nrm AS cn FROM qe WHERE vec_id < $NLIST),
         |ranked AS (
         |  SELECT e.vec_id, e.q, e.nrm, cent.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${V.icosNSql("e.q", "cq", "e.nrm", "cn")} DESC, cent.c_id) AS rc
         |  FROM qe e, cent),
         |assign AS (SELECT vec_id, q, nrm, c_id AS cell FROM ranked WHERE rc = 1),
         |probe AS (SELECT vec_id AS q_id, q AS qq, nrm AS qn, c_id AS qcell
         |          FROM ranked WHERE rc <= 2 AND vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor,
         |    ${V.icosNSql("qq", "e.q", "qn", "e.nrm")} AS icos
         |  FROM probe JOIN assign e ON e.cell = probe.qcell AND e.vec_id <> probe.q_id)
         |${topkSql("scored")}""".stripMargin
    }) { (s, d) =>
      val e = qe(s, d)
      val cent = e.filter(col("vec_id") < NLIST).toDF("c_id", "cq", "cn")
      val wc = Window.partitionBy("vec_id")
        .orderBy(V.icosN(col("q"), col("cq"), col("nrm"), col("cn")).desc, col("c_id"))
      val ranked = e.crossJoin(broadcast(cent))
        .withColumn("rc", row_number().over(wc))
      val assign = ranked.filter(col("rc") === 1)
        .select(col("vec_id"), col("q"), col("nrm"), col("c_id").as("cell"))
      val probe = ranked.filter(col("rc") <= 2 && col("vec_id") < NQ)
        .select(col("vec_id").as("q_id"), col("q").as("qq"),
          col("nrm").as("qn"), col("c_id").as("qcell"))
      val scored = assign.toDF("neighbor", "qv", "nv", "cell")
        .join(broadcast(probe), col("cell") === col("qcell") && col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"),
          V.icosN(col("qq"), col("qv"), col("qn"), col("nv")).as("icos"))
      topk(scored)
    },

    // One k-means update step over the IVF assignment: new centroid =
    // per-dimension integer mean (truncated toward zero — DuckDB's
    // BIGINT `//` truncates for negative quotients, so the Spark side
    // uses `div`, which matches) of the cell's members. The
    // iterative-ML shuffle shape: assignment is a broadcast-join
    // narrow pass, the update one (cell, dim) hash aggregate over the
    // exploded vectors. Exact quantized-Long math end to end, so the
    // step is hash-graded — emitted as (cell, dim, icentroid) rows.
    sql("ann_kmeans_step", {
      s"""WITH $qeSql,
         |cent AS (SELECT vec_id AS c_id, q AS cq, nrm AS cn FROM qe WHERE vec_id < $NLIST),
         |assign AS (
         |  SELECT vec_id, q, c_id AS cell FROM (
         |    SELECT e.vec_id, e.q, cent.c_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${V.icosNSql("e.q", "cq", "e.nrm", "cn")} DESC, cent.c_id) AS rc
         |    FROM qe e, cent)
         |  WHERE rc = 1)
         |SELECT cell, u.i - 1 AS dim,
         |  CAST(sum(q[u.i]) AS BIGINT) // count(*) AS icentroid
         |FROM assign, unnest(range(1, $DIM + 1)) u(i)
         |GROUP BY cell, u.i ORDER BY cell, dim""".stripMargin
    }) { (s, d) =>
      val e = qe(s, d)
      val cent = e.filter(col("vec_id") < NLIST).toDF("c_id", "cq", "cn")
      val wc = Window.partitionBy("vec_id")
        .orderBy(V.icosN(col("q"), col("cq"), col("nrm"), col("cn")).desc, col("c_id"))
      val assign = e.crossJoin(broadcast(cent))
        .withColumn("rc", row_number().over(wc))
        .filter(col("rc") === 1)
        .select(col("vec_id"), col("q"), col("c_id").as("cell"))
      assign.select(col("cell"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(expr("CAST(sum(x) div count(1) AS BIGINT)").as("icentroid"))
    },

    // Hybrid retrieval — the RAG-retriever shape: a cheap term-match
    // stage prunes the corpus (top-20 docs by query-term occurrence
    // count), then a vector stage reranks only those candidates by
    // exact integer cosine against the query document's embedding.
    // At 100 TB the term stage is an inverted-index/semi-join prune
    // and the rerank touches k docs, never the corpus — the join to
    // embeddings is keyed on doc id, candidates broadcast.
    sql("ann_hybrid_rerank", {
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, CAST(len(list_filter(t,
         |    x -> list_contains(['spark', 'join', 'window'], x))) AS BIGINT) AS tf
         |  FROM toks),
         |cands AS (
         |  SELECT doc_id, tf FROM (
         |    SELECT doc_id, tf,
         |      row_number() OVER (ORDER BY tf DESC, doc_id) AS rc
         |    FROM tf WHERE tf > 0 AND doc_id <> 0)
         |  WHERE rc <= 20),
         |qe AS (SELECT vec_id, q, ${V.qNormSql("q")} AS nrm FROM
         |  (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings)),
         |qv AS (SELECT q AS qq, nrm AS qn FROM qe WHERE vec_id = 0),
         |scored AS (
         |  SELECT c.doc_id, c.tf,
         |    ${V.icosNSql("qv.qq", "e.q", "qv.qn", "e.nrm")} AS icos
         |  FROM cands c JOIN qe e ON e.vec_id = c.doc_id, qv)
         |SELECT doc_id, tf, icos, rnk FROM (
         |  SELECT doc_id, tf, icos,
         |    row_number() OVER (ORDER BY icos DESC, doc_id) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFunctions.tokens
      val terms = Seq("spark", "join", "window")
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"),
          size(filter(col("t"), x => x.isin(terms.map(lit(_)): _*))).cast("long").as("tf"))
      val wc = Window.orderBy(col("tf").desc, col("doc_id"))
      val cands = tf.filter(col("tf") > 0 && col("doc_id") =!= 0)
        .withColumn("rc", row_number().over(wc)).filter(col("rc") <= 20)
        .select("doc_id", "tf")
      val e = qe(s, d)
      val qv = e.filter(col("vec_id") === 0)
        .select(col("q").as("qq"), col("nrm").as("qn"))
      val scored = broadcast(cands)
        .join(e, e("vec_id") === col("doc_id"))
        .crossJoin(broadcast(qv))
        .select(col("doc_id"), col("tf"),
          V.icosN(col("qq"), col("q"), col("qn"), col("nrm")).as("icos"))
      val w = Window.orderBy(col("icos").desc, col("doc_id"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
    },

    // Product quantization + ADC — THE 100 TB ANN memory play: each
    // 64-dim vector compresses to M=8 one-byte codes (argmin-L2
    // codeword per 8-dim subspace), and a query scores a candidate by
    // summing 8 LUT entries instead of folding 64 dims. The LUT
    // (query × subspace × codeword inner products, NQ·M·KC = 1024
    // rows) broadcasts; the scored join is keyed on (m, code) and the
    // per-pair work is ONE add per subspace. Codebook "training" is
    // the same deterministic first-KC-vectors discipline the IVF
    // coarse quantizer documents; argmins and dot products are exact
    // integer math end to end, so the ADC scores hash-match. L2² uses
    // ‖a‖² + ‖c‖² − 2⟨a,c⟩ — three integer dots, norms precomputed.
    sql("ann_pq_adc", {
      val mList = (0 until PQ_M).mkString("[", ", ", "]")
      s"""WITH qv AS (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings),
         |subs AS (
         |  SELECT vec_id, u.m,
         |    list_slice(q, u.m * $PQ_SUB + 1, u.m * $PQ_SUB + $PQ_SUB) AS sub
         |  FROM qv, (SELECT unnest($mList) AS m) u),
         |subn AS (SELECT vec_id, m, sub, list_dot_product(sub, sub) AS sn FROM subs),
         |cent AS (SELECT m, vec_id AS k, sub AS csub, sn AS cn
         |         FROM subn WHERE vec_id < $PQ_KC),
         |enc AS (
         |  SELECT vec_id, m, k AS code FROM (
         |    SELECT s.vec_id, s.m, c.k,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m
         |        ORDER BY s.sn + c.cn - 2 * list_dot_product(s.sub, c.csub) ASC, c.k)
         |        AS rn
         |    FROM subn s JOIN cent c ON c.m = s.m)
         |  WHERE rn = 1),
         |lut AS (
         |  SELECT s.vec_id AS q_id, s.m, c.k,
         |    CAST(list_dot_product(s.sub, c.csub) AS BIGINT) AS pdot
         |  FROM subn s JOIN cent c ON c.m = s.m WHERE s.vec_id < $NQ),
         |scored AS (
         |  SELECT l.q_id, e.vec_id AS neighbor, CAST(SUM(l.pdot) AS BIGINT) AS iadc
         |  FROM enc e JOIN lut l ON l.m = e.m AND l.k = e.code
         |  WHERE e.vec_id <> l.q_id GROUP BY 1, 2)
         |SELECT q_id, neighbor, iadc, rnk FROM (
         |  SELECT q_id, neighbor, iadc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY iadc DESC, neighbor) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin
    }) { (s, d) =>
      val qv = Tables.embeddings(s, d)
        .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
      val subArr = array((0 until PQ_M).map(m => struct(lit(m).as("m"),
        slice(col("q"), m * PQ_SUB + 1, PQ_SUB).as("sub"))): _*)
      val subs = qv.select(col("vec_id"), explode(subArr).as("s"))
        .select(col("vec_id"), col("s.m").as("m"), col("s.sub").as("sub"))
        .withColumn("sn", V.intDot(col("sub"), col("sub")))
      val cent = subs.filter(col("vec_id") < PQ_KC)
        .select(col("m").as("cm"), col("vec_id").as("k"),
          col("sub").as("csub"), col("sn").as("cn"))
      val we = Window.partitionBy("vec_id", "m").orderBy(
        (col("sn") + col("cn") - lit(2) * V.intDot(col("sub"), col("csub"))).asc,
        col("k").asc)
      val enc = subs.join(broadcast(cent), col("cm") === col("m"))
        .withColumn("rn", row_number().over(we)).filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("k").as("code"))
      val lut = subs.filter(col("vec_id") < NQ)
        .join(broadcast(cent), col("cm") === col("m"))
        .select(col("vec_id").as("q_id"), col("m").as("lm"), col("k").as("lk"),
          V.intDot(col("sub"), col("csub")).as("pdot"))
      val scored = enc.join(broadcast(lut),
          col("lm") === col("m") && col("lk") === col("code") &&
            col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id").as("neighbor"))
        .agg(sum("pdot").as("iadc"))
      val w = Window.partitionBy("q_id").orderBy(col("iadc").desc, col("neighbor"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
    },

    // ---- IVF recall, measured end to end (r16 verdict #3) ----
    // The VECTOR-index probe path against its own exact scan: a
    // snapshot-backed session trains the IVF coarse quantizer at save
    // (Lloyd from the lowest-id seeds — SnapshotStore.writeIndexAux),
    // then for NQ query vectors each partition-pruned probe budget in
    // {4, 8, 16} (of 64 cells) is scored against the exhaustive
    // top-10 — the recall-vs-probe-budget CURVE, not one point (r17
    // verdict #3): a user tuning `probes` reads the measured tradeoff
    // straight off this row. The recall numbers are a deterministic
    // function of the corpus (seeding, tie-breaks, and the decimal
    // centroid means are all order-independent) but NOT
    // SQL-expressible — DuckDB cannot replay the trained quantizer —
    // so this row is rows-only by design; PacksSpec pins the recall
    // floor on a clustered synthetic corpus.
    QueryDef.rowsOnly("ann_ivf_recall") { (s, d) =>
      import s.implicits._
      val gs = vectorSession(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < NQ)
        .orderBy("vec_id").collect().map { r =>
          (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))
        }
      // exact side in ONE pass: the NQ query vectors broadcast against
      // the indexed slice, rank ≤ 10 per query under the probe path's
      // exact ordering (cosine desc, id asc) — not NQ separate scans
      val qdf = queries.toSeq.toDF("q_id", "qv")
      val scored = gs.graph().nodes
        .filter(array_contains(col("labels"), "emb") && col("embedding").isNotNull)
        .crossJoin(broadcast(qdf))
        .select(col("q_id"), col("id"),
          V.cosine(col("embedding").cast("array<double>"), col("qv")).as("score"))
      val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("id"))
      val exact = scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10).select("q_id", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rows = for {
        probes <- Seq(4, 8, 16)
        (qid, v) <- queries
      } yield {
        // the vector rides as a parameter — double literals can carry
        // scientific notation the Cypher lexer doesn't take
        val ivf = gs.cypher(
          s"CALL db.index.vector.queryNodes('emb_ivf', 10, $$v, {probes: $probes}) " +
            "YIELD nodeId RETURN nodeId", Map("v" -> v)).collect().map(_.getLong(0)).toSet
        val ex = exact.getOrElse(qid, Set.empty)
        (probes.toLong, qid, ex.size.toLong, ivf.intersect(ex).size.toLong)
      }
      rows.toDF("probes", "q_id", "k", "overlap")
        .select(col("probes"), col("q_id"), col("k"), col("overlap"),
          floor(col("overlap") * lit(1000000.0) / col("k") + lit(0.5))
            .cast("long").as("irecall"))
    }
  )

  /** Snapshot-backed session with a VECTOR index over the embeddings
    * table — the IVF-recall fixture: one full save trains the coarse
    * quantizer and lays out the cells/centroids projection the probe
    * path partition-prunes. */
  private val vecCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.GraftSession]()
  private def vectorSession(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.GraftSession =
    vecCache.computeIfAbsent(dir, _ => {
      val gs = new graft.GraftSession(s)
      val nodes = Tables.embeddings(s, dir).select(
        (col("vec_id") * 10 + 5).cast("long").as("id"),
        array(lit("emb")).as("labels"),
        col("embedding"), col("vec_id"))
      gs.setGraph(graft.core.PropertyGraph(nodes,
        graft.core.PropertyGraph.empty(s).edges))
      gs.cypher("CREATE VECTOR INDEX emb_ivf FOR (n:emb) ON n.embedding " +
        "OPTIONS {indexConfig: {`vector.similarity_function`: 'cosine'}}")
      gs.saveDatabase(
        java.nio.file.Files.createTempDirectory("graft_ivfrec_row_").toString)
      gs
    })
}
