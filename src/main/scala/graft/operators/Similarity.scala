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
  * Two plans, both oracle-checked with exact integer cosine scores
  * (see [[graft.functions.VectorFunctions]] quantization):
  *
  *  - `ann_topk`: brute-force exact top-k. The tiny query side is
  *    broadcast and every data row is scanned once — for a handful of
  *    query vectors this IS the right distributed plan (one narrow
  *    pass over n rows, top-k via window; no shuffle of the data
  *    side beyond the final per-query k rows).
  *  - `ann_topk_lsh`: the 100 TB path — queries and data bucket on a
  *    sign-LSH signature and equi-join (hash join) on the bucket, so
  *    each query only scores its bucket's candidates. Recall < 1 by
  *    design; the oracle mirrors the same bucketing, so correctness
  *    checks the algorithm, not brute force.
  */
object Similarity {

  private val LSH_BITS = 4
  private val DIM = 64
  private val K = 5
  private val NQ = 8 // query vectors: vec_id < NQ

  def all: Seq[QueryDef] = Seq(

    sql("ann_topk", {
      s"""WITH qe AS (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, q AS qq FROM qe WHERE vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor, ${V.icosSql("qq", "e.q")} AS icos
         |  FROM qs JOIN qe e ON e.vec_id <> qs.q_id)
         |SELECT q_id, neighbor, icos, rnk FROM (
         |  SELECT q_id, neighbor, icos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY icos DESC, neighbor) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin
    }) { (s, d) =>
      val qe = Tables.embeddings(s, d)
        .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
      val qs = qe.filter(col("vec_id") < NQ).toDF("q_id", "qq")
      val scored = qe.toDF("neighbor", "qn")
        .crossJoin(broadcast(qs))
        .filter(col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"), V.icos(col("qq"), col("qn")).as("icos"))
      val w = Window.partitionBy("q_id").orderBy(col("icos").desc, col("neighbor"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
    },

    sql("ann_topk_lsh", {
      val sig = V.lshSignatureSql("q", LSH_BITS, DIM)
      s"""WITH qe AS (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings),
         |sg AS (SELECT vec_id, q, $sig AS bucket FROM qe),
         |qs AS (SELECT vec_id AS q_id, q AS qq, bucket FROM sg WHERE vec_id < $NQ),
         |scored AS (
         |  SELECT q_id, e.vec_id AS neighbor, ${V.icosSql("qq", "e.q")} AS icos
         |  FROM qs JOIN sg e ON e.bucket = qs.bucket AND e.vec_id <> qs.q_id)
         |SELECT q_id, neighbor, icos, rnk FROM (
         |  SELECT q_id, neighbor, icos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY icos DESC, neighbor) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin
    }) { (s, d) =>
      val sg = Tables.embeddings(s, d)
        .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
        .withColumn("bucket", V.lshSignature(col("q"), LSH_BITS, DIM))
      val qs = sg.filter(col("vec_id") < NQ).toDF("q_id", "qq", "qbucket")
      val scored = sg.toDF("neighbor", "qn", "bucket")
        .join(broadcast(qs), col("bucket") === col("qbucket") && col("neighbor") =!= col("q_id"))
        .select(col("q_id"), col("neighbor"), V.icos(col("qq"), col("qn")).as("icos"))
      val w = Window.partitionBy("q_id").orderBy(col("icos").desc, col("neighbor"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
    }
  )
}
