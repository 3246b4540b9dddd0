package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Targeted dedup behavior at regimes the sf0.01 driver gate cannot
  * reach — notably MinHash LSH overflow re-banding, which only
  * engages once a (band, sig) bucket exceeds BUCKET_CAP members.
  * (The same fixture hash-matches the DuckDB oracle via
  * `tools/check.py <fixture-dir> dedup_minhash_lsh` — verified when
  * the cap landed; this spec pins the Spark-side invariants in CI.)
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("minhash overflow re-banding: oversized buckets subdivide without losing true dups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_capfix_").toString
    val clone = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // 70 identical docs (one LSH bucket of 70 > BUCKET_CAP = 64 per
    // band) plus 30 distinct docs that must not pair with anything
    val docs = (0 until 100).map { i =>
      val text =
        if (i < 70) clone
        else s"doc $i unique words ${i * 7} content ${i * 13} filler ${i * 17} " +
          s"tail ${i * 19} pad ${i * 23} end ${i * 29}"
      (i.toLong, text, "en", "src1", 100L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))

    val res = SparkEntry.queries("dedup_minhash_lsh")(spark, dir).collect()
    // identical docs share EVERY band signature, so the rsig
    // subdivision keeps them co-bucketed: all 70*69/2 pairs survive
    // the cap, nothing else qualifies
    assert(res.length == 70 * 69 / 2)
    assert(res.forall(_.getLong(2) == 1000000L)) // exact dups: ijac = 1e6
    val ds = res.map(r => (r.getLong(0), r.getLong(1)))
    assert(ds.forall { case (a, b) => a < 70 && b < 70 && a < b })
    // ...and the stats surface reports the kept residual honestly:
    // the identical-doc bucket cannot subdivide (all rsigs equal), so
    // it stays hot after the two-level budget — measured, not silent
    val (pairs, maxB, hot) = graft.operators.Dedup.lshCandidateStats(spark, dir)
    assert(pairs == 70L * 69 / 2, s"cand pairs $pairs")
    assert(maxB == 70L && hot >= 1L, s"maxB $maxB hot $hot")
  }

  test("recursive re-banding: a bucket hot after one refinement splits at level 2") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    // Construct docs of the form "w1 w2 w3 x_j": each doc has exactly
    // two word-3-shingles — a COMMON one c = "w1 w2 w3" and a unique
    // one u_j = "w2 w3 x_j". A doc's minhash for perm i is
    // min(perm_i(c), perm_i(u_j)), so by SEARCHING for x_j whose u_j
    // loses to c on perms 0..7 (bands 0 and 1) and WINS on perms
    // 8..11 (band 2), we manufacture >CAP docs with IDENTICAL band-0
    // and band-1 signatures but DISTINCT band-2 signatures: band 0's
    // bucket is hot, its level-1 refinement key (band 1's sig) does
    // NOT split it, and only the level-2 key (band 2's sig) does —
    // the single-level r16 re-banding left exactly this shape
    // quadratic. The search runs through the engine's own md5Int/
    // permHash columns, so the construction can never drift from the
    // implementation.
    val params = TextFunctions.minhashParams(16)
    val P = TextFunctions.MINHASH_P.toDouble
    def perms(df: org.apache.spark.sql.DataFrame) =
      df.select((Seq(col("id"), col("s")) ++
        params.zipWithIndex.map { case ((a, b), i) =>
          TextFunctions.permHash(TextFunctions.md5Int(col("s")), a, b).as(s"m$i")
        }): _*)
    // pick the common shingle c = "w1 q<k> w3" maximizing the yield
    // of qualifying suffixes: u must LOSE to c on every perm of bands
    // 0-1 (identical sigs there) and WIN at least once in band 2 AND
    // band 3 (distinct sigs there, so only band 0's bucket needs the
    // level-2 key and no other band leaves a hot residual)
    val cRows = perms(spark.range(1000)
      .select(concat(lit("w1 q"), col("id"), lit(" w3")).as("s"), col("id"))).collect()
    val (bestK, cPerm) = cRows.map { r =>
      val cs = (0 until 16).map(i => r.getLong(r.fieldIndex(s"m$i")))
      val score = (0 to 7).map(i => 1.0 - cs(i) / P).product *
        (1.0 - (8 to 11).map(i => 1.0 - cs(i) / P).product) *
        (1.0 - (12 to 15).map(i => 1.0 - cs(i) / P).product)
      (r.getLong(0), cs, score)
    }.maxBy(_._3) match { case (k, cs, _) => (k, cs) }
    val cand = perms(spark.range(3000000)
      .select(concat(lit(s"q$bestK w3 t"), col("id")).as("s"), col("id")))
    val hits = cand.filter(
      (0 to 7).map(i => col(s"m$i") > lit(cPerm(i))).reduce(_ && _) &&
        (8 to 11).map(i => col(s"m$i") < lit(cPerm(i))).reduce(_ || _) &&
        (12 to 15).map(i => col(s"m$i") < lit(cPerm(i))).reduce(_ || _))
      .select("id").limit(80).collect().map(_.getLong(0))
    assert(hits.length >= 70, s"search found only ${hits.length} suffixes")
    val dir = java.nio.file.Files.createTempDirectory("graft_rebander_").toString
    val docs = hits.take(70).zipWithIndex.map { case (x, j) =>
      (j.toLong, s"w1 q$bestK w3 t$x", "en", "src1", 20L)
    }.toSeq
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val (pairs, maxB, hot) = graft.operators.Dedup.lshCandidateStats(spark, dir)
    // level 2 must have split the band-0 bucket below the cap: no hot
    // residual, and candidate volume far below the whole-bucket
    // quadratic 70*69/2 = 2415 the single-level scheme produced
    assert(hot == 0L, s"bucket still hot after the level-2 refinement (hot=$hot)")
    assert(maxB <= 64L, s"post-refinement bucket of $maxB exceeds the cap")
    assert(pairs < 500L, s"candidate volume $pairs is still bucket-quadratic")
    // the docs are NOT near-dups (pairwise Jaccard 1/3 < 0.7): the
    // graded query must verify-reject every manufactured candidate
    assert(SparkEntry.queries("dedup_minhash_lsh")(spark, dir).collect().isEmpty)
  }
}
