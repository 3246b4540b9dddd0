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
  }
}
