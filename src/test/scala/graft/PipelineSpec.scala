package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-prep operators (graft.operators.Pipeline): dataset splits,
  * stratified sampling, chunking, repetition, contamination,
  * boilerplate, discrete quantiles. Value checks at sf0.001 plus the
  * plan properties that make each op viable at 100 TB.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("hash split partitions every doc exactly once, roughly 80/10/10") {
    val rows = run("sample_hash_split").collect().map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val total = rows.values.sum
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(total == docs, s"split counts $total != $docs docs")
    assert(rows("train") > rows.getOrElse("val", 0L))
    assert(rows("train") > rows.getOrElse("test", 0L))
  }

  test("stratified sample takes at most 10 docs per language, rn dense from 1") {
    val rows = run("sample_stratified").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val rns = rs.map(_.getAs[Long]("rn")).sorted
      assert(rns.length <= 10, s"$lang sampled ${rns.length} > 10")
      assert(rns.toSeq == (1L to rns.length).toSeq, s"$lang ranks not dense: ${rns.toSeq}")
    }
  }

  test("chunking covers every token: stride-15 windows tile each doc") {
    val docs = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 300)
    import org.apache.spark.sql.functions._
    val nToks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = run("text_chunking").collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == nToks.keySet)
    byDoc.foreach { case (id, cs) =>
      val n = nToks(id)
      val expected = 1L + (n - 1) / 15 // starts at 1, 16, … <= n
      assert(cs.length.toLong == expected, s"doc $id: ${cs.length} chunks, expected $expected")
      // last chunk ends exactly at the doc's final token
      val covered = cs.map(c => c.getAs[Long]("chunk_id") * 15 + c.getAs[Long]("n_tokens")).max
      assert(covered == n, s"doc $id: chunks cover $covered of $n tokens")
    }
  }

  test("repetition ppm values are in [0, 1e6] and dup ppm is 0 iff all tokens distinct") {
    val rows = run("text_repetition").collect()
    rows.foreach { r =>
      val dup = r.getAs[Long]("dup_token_ppm")
      val top = r.getAs[Long]("top_bigram_ppm")
      assert(dup >= 0 && dup <= 1000000L)
      assert(top > 0 && top <= 1000000L)
    }
  }

  test("contamination joins the tiny benchmark side as a broadcast, no cartesian") {
    val p = run("text_contamination").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "benchmark side is not broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("boilerplate ppm is consistent with kept + stripped = total") {
    val rows = run("text_boilerplate").collect()
    rows.foreach { r =>
      val total = r.getAs[Long]("n_tokens")
      val kept = r.getAs[Long]("kept_tokens")
      assert(kept >= 0 && kept <= total)
      val ppm = r.getAs[Long]("boilerplate_ppm")
      assert(ppm == (total - kept) * 1000000L / total)
    }
    val p = run("text_boilerplate").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "top-k membership join is not broadcast")
  }

  test("discrete quantiles: p50 <= p90, both are actual data values") {
    import org.apache.spark.sql.functions._
    val rows = run("agg_quantile_disc").collect()
    assert(rows.nonEmpty)
    val cents = graft.core.Tables.orders(spark, sf)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")).collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val p50 = r.getAs[Long]("p50_cents")
      val p90 = r.getAs[Long]("p90_cents")
      assert(p50 <= p90)
      assert(cents.contains(p50) && cents.contains(p90), "quantile not an actual data value")
    }
  }

  test("weighted sampling keeps roughly the configured per-language rate") {
    val rows = run("sample_weighted").collect()
    rows.foreach { r =>
      val (lang, total, kept) =
        (r.getAs[String]("lang"), r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      val rate = lang match {
        case "en" => 0.9; case "de" | "es" => 0.5; case "fr" => 0.25; case _ => 0.1
      }
      assert(kept <= total)
      // hash-uniformity tolerance on small strata: within ±0.25 absolute
      assert(math.abs(kept.toDouble / total - rate) <= 0.25,
        s"$lang kept $kept/$total, configured rate $rate")
    }
  }

  test("gap-filled hourly series is dense: consecutive hours, zero-count rows present") {
    val rows = SparkEntry.queries("events_gap_fill")(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[Long]("hour_id")).sorted
      assert(hours.last - hours.head + 1 == hours.length, "series has holes")
    }
    assert(rows.exists(_.getAs[Long]("n") == 0L), "no zero-filled rows — gap fill vacuous")
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import spark.implicits._
    // k=4, w=4: any shared run of >= 7 tokens must yield a common fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      s"intro words here $shared trailing tail",
      s"$shared completely different suffix tokens now").toDF("text")
    val fps = docs
      .select(tokens(col("text")).as("t"))
      .select(positionalShingleHashes(col("t"), 4).as("hs"))
      .select(winnowedFingerprints(col("hs"), 4).as("fp"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty,
      "winnowing missed a 7-token shared run — selection window broken")
  }

  test("sequence packing: every doc assigned, packs tile the token stream") {
    import org.apache.spark.sql.functions._
    val packs = run("pipeline_pack_sequences").collect()
    val docs = graft.core.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val totalToks = docs.select(sum(size(split(trim(col("text")), "\\s+"))))
      .collect()(0).getLong(0)
    assert(packs.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document must land in exactly one pack")
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum == totalToks,
      "pack token mass must equal corpus token mass (concat-and-cut)")
    // pack ids are the dense prefix 0..ceil(total/2048)-1: the stream
    // has no holes, so every window up to the last token is populated
    val ids = packs.map(_.getAs[Long]("pack_id")).sorted
    assert(ids.toSeq == (0L until (totalToks + 2047) / 2048).toSeq,
      s"pack ids not a dense prefix: ${ids.toSeq}")
    // straddlers exist but are bounded by one per boundary
    val straddle = packs.map(_.getAs[Long]("n_straddle")).sum
    assert(straddle <= ids.length, "at most one straddler per window boundary")
  }

  test("dedup keeper: keeps the longest doc per group, accounts for all dropped") {
    val keep = SparkEntry.queries("dedup_keep_best")(spark, sf).collect()
    assert(keep.nonEmpty, "testdata has prefix-duplicate groups")
    // cross-check one group end-to-end against the raw table
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val t = tokens(col("text"))
    val grouped = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        md5(concat_ws(" ", element_at(t, 1), element_at(t, 2), element_at(t, 3))).as("grp"))
      .collect().groupBy(_.getAs[String]("grp"))
    keep.foreach { r =>
      val members = grouped(r.getAs[String]("grp"))
      val best = members.maxBy(m => (m.getAs[Long]("n_chars"), -m.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("keep_id") == best.getAs[Long]("doc_id"),
        s"group ${r.getAs[String]("grp")}: keeper is not the longest member")
      assert(r.getAs[Long]("n_dropped") == members.length - 1)
      assert(r.getAs[Long]("dropped_chars") ==
        members.map(_.getAs[Long]("n_chars")).sum - r.getAs[Long]("keep_chars"))
    }
  }
}
