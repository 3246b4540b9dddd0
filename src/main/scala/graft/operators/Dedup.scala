package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` (driver north star):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: the only all-pairs comparison ever materialized is
  * *within* a blocking key (shared shingle / LSH band bucket / hash
  * group), so work scales with collision volume, not n². The MinHash
  * path is the 100 TB route: signature = k min-aggregates in one pass
  * over exploded shingles (map-side combinable), candidates = a
  * band-bucket self-join, verification only touches candidate pairs.
  */
object Dedup {

  private val K = 16 // minhash permutations
  private val BANDS = 4 // 4 bands x 4 rows
  private val params = minhashParams(K)
  private val P = MINHASH_P

  // ---------------- shared Spark fragments ----------------

  /** doc_id, s — distinct word-3-gram shingles per doc. */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("s"))

  /** Exact Jaccard for the given candidate pairs (d1 < d2). */
  private def verifyJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sa = sh.toDF("d1", "s")
    val sb = sh.toDF("d2", "s2")
    val shared = cands.join(sa, "d1")
      .join(sb, col("s") === col("s2") && sb("d2") === cands("d2"))
      .groupBy(cands("d1"), cands("d2")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.toDF("d1", "na"), "d1")
      .join(sizes.toDF("d2", "nb"), "d2")
      .select(col("d1"), col("d2"),
        round(col("shared") * lit(1.0) / (col("na") + col("nb") - col("shared")), 6).as("jac"))
  }

  // ---------------- shared oracle fragments ----------------

  private val shSql =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS s
      |       FROM toks, unnest(range(1, greatest(len(t)-1, 1))) u(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  private def verifySql(candsCte: String) =
    s"""shared AS (
       |  SELECT c.d1, c.d2, count(*) AS shared
       |  FROM $candsCte c JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
       |  GROUP BY c.d1, c.d2)
       |SELECT sh2.d1, sh2.d2,
       |  round(sh2.shared*1.0/(sa.n + sb.n - sh2.shared), 6) AS jac
       |FROM shared sh2 JOIN sizes sa ON sa.doc_id = sh2.d1
       |JOIN sizes sb ON sb.doc_id = sh2.d2""".stripMargin

  private val hSql = "CAST(concat('0x', substring(md5(s), 1, 7)) AS BIGINT)"

  def all: Seq[QueryDef] = Seq(

    // ---- exact dedup: hash-group on content ----
    sql("dedup_exact_stats",
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_unique,
        |       count(*) - count(DISTINCT text) AS n_dups
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dups"))
    },

    sql("dedup_exact_groups",
      """SELECT md5(text) AS grp, min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY md5(text) HAVING count(*) > 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("grp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
    },

    // ---- n-gram Jaccard: shared-shingle blocking, exact verify ----
    sql("dedup_ngram_jaccard",
      s"""WITH $shSql,
         |cands AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |${verifySql("cands")}
         |WHERE jac >= 0.8""".stripMargin) { (s, d) =>
      val sh = shingleDf(s, d).persist()
      val cands = sh.toDF("d1", "s").join(sh.toDF("d2", "s2"),
          col("s") === col("s2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      verifyJaccard(sh, cands).filter(col("jac") >= 0.8)
    },

    // ---- MinHash + LSH banding: the scale path ----
    sql("dedup_minhash_lsh", {
      val minExprs = params.zipWithIndex.map { case ((a, b), i) =>
        s"min(($a * $hSql + $b) % $P) AS m$i" }.mkString(",\n    ")
      val bandSigs = (0 until BANDS).map { bnd =>
        val cols = (0 until K / BANDS).map(r => s"m${bnd * (K / BANDS) + r}").mkString(", ")
        s"SELECT doc_id, $bnd AS band, md5(concat_ws(',', $cols)) AS sig FROM sigs"
      }.mkString("\n  UNION ALL ")
      s"""WITH $shSql,
         |sigs AS (
         |  SELECT doc_id,
         |    $minExprs
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  $bandSigs),
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |${verifySql("cands")}
         |WHERE jac >= 0.7""".stripMargin
    }) { (s, d) =>
      val sh = shingleDf(s, d).persist()
      val hashed = sh.withColumn("h", md5Int(col("s")))
      val aggs = params.zipWithIndex.map { case ((a, b), i) =>
        min(permHash(col("h"), a, b)).as(s"m$i") }
      val sigs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      val stackExpr = (0 until BANDS).map { bnd =>
        val cols = (0 until K / BANDS).map(r => s"m${bnd * (K / BANDS) + r}").mkString(", ")
        s"$bnd, md5(concat_ws(',', $cols))"
      }.mkString(s"stack($BANDS, ", ", ", ") AS (band, sig)")
      val bands = sigs.select(col("doc_id"), expr(stackExpr))
      val cands = bands.toDF("d1", "band", "sig")
        .join(bands.toDF("d2", "band2", "sig2"),
          col("band") === col("band2") && col("sig") === col("sig2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      verifyJaccard(sh, cands).filter(col("jac") >= 0.7)
    },

    // ---- SimHash: 32-bit near-dup fingerprint in one agg pass ----
    sql("dedup_simhash", {
      val tok = "SELECT DISTINCT doc_id, u.x AS s FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), unnest(t) u(x)"
      val sums = (0 until 32).map(j =>
        s"sum(CASE WHEN ($hSql >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n    ")
      val fp = (0 until 32).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS ($tok),
         |sums AS (SELECT doc_id, $sums FROM tok s GROUP BY doc_id)
         |SELECT doc_id, $fp AS simhash FROM sums WHERE doc_id < 500""".stripMargin
    }) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("s"))
        .withColumn("h", md5Int(col("s")))
      val sums = (0 until 32).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
      val fp = (0 until 32).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
      tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), fp.as("simhash"))
    },

    // ---- embedding-cosine near-dup pairs ----
    sql("dedup_embed_cosine",
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) >= 0.9""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("v1"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("v2"), col("embedding").as("eb"))
      a.join(b, col("v1") < col("v2"))
        .select(col("v1"), col("v2"),
          graft.functions.VectorFunctions.cosine(col("ea"), col("eb")).as("cos"))
        .filter(col("cos") >= 0.9)
    }
  )

}
