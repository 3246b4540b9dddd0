package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table (driver north
  * star: language-ID, quality scoring, token counting, fingerprinting).
  * All single-pass narrow scans — no shuffle except the final
  * aggregation, so they scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  // SQL fragments shared by the oracles (exact mirrors of TextFunctions)
  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private def hitsSql(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksSql, x -> list_contains($lst, x)))"
  }
  private val markers = graft.functions.TextFunctions.langMarkers
  private val allStops = markers.flatMap(_._2)
  // Scores are exact integer ppm (see TextFunctions): numerator*1e6
  // with BIGINT `//` — no round()/doubles at any compared column, per
  // the repo determinism rule (Relational.scala notes). DuckDB `//`
  // truncates on BIGINT like Spark `div`; all numerators are >= 0.
  private val punctSql = s"CAST(length(text) - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) * 1000000 // greatest(CAST(length(text) AS BIGINT), 1)"
  private def stopSql = s"CAST(${hitsSql(allStops)} AS BIGINT) * 1000000 // greatest(CAST(len($toksSql) AS BIGINT), 1)"
  private def qualSql =
    s"($stopSql) * 2 + (CASE WHEN len($toksSql) BETWEEN 20 AND 1000 THEN 500000 ELSE 0 END) - ($punctSql)"
  private def predSql: String = {
    val maxExpr = markers.map { case (_, ws) => hitsSql(ws) }.mkString("greatest(", ", ", ")")
    val chain = markers.map { case (l, ws) =>
      s"WHEN $maxExpr > 0 AND ${hitsSql(ws)} = $maxExpr THEN '$l'" }.mkString(" ")
    s"CASE $chain ELSE 'und' END"
  }

  def all: Seq[QueryDef] = Seq(

    // token counting: per-language totals
    sql("text_tokens",
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
         |  min(len($toksSql)) AS min_tokens,
         |  max(len($toksSql)) AS max_tokens
         |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("total_tokens"),
          min(tokenCount(col("text"))).as("min_tokens"),
          max(tokenCount(col("text"))).as("max_tokens"))
    },

    // language ID vs ground-truth lang column (confusion counts)
    sql("text_langid",
      s"""SELECT lang, $predSql AS pred, count(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), langId(col("text")).as("pred"))
        .agg(count(lit(1)).as("n"))
    },

    // quality scoring: per-doc metrics (subset for stable output size)
    sql("text_quality",
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  $punctSql AS punct_ratio,
         |  CAST(list_sum(list_transform($toksSql, x -> length(x))) AS BIGINT) * 1000000
         |        // greatest(CAST(len($toksSql) AS BIGINT), 1) AS mean_token_len,
         |  $stopSql AS stop_ratio,
         |  CAST($qualSql AS BIGINT) AS quality
         |FROM documents WHERE doc_id < 200""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          punctRatio(col("text")).as("punct_ratio"),
          meanTokenLen(col("text")).as("mean_token_len"),
          stopwordRatio(col("text")).as("stop_ratio"),
          qualityScore(col("text")).as("quality"))
    },

    // ---- composite training-data pipeline: langid gate -> quality
    // gate -> exact-dedup keeper -> per-language corpus stats. The
    // whole pipeline is ONE declarative plan: narrow per-row scoring,
    // one window shuffle for the dedup keeper, one final aggregation —
    // Catalyst fuses the gates into the scan. The thresholds match the
    // testdata's score distribution (quality is negative-shifted here;
    // all-marker-miss docs are 'und').
    sql("text_pipeline",
      s"""WITH k AS (
         |  SELECT doc_id, lang, text, $predSql AS pred, $qualSql AS q,
         |         min(doc_id) OVER (PARTITION BY text) AS keeper
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
         |FROM k WHERE pred <> 'und' AND q >= -400000 AND doc_id = keeper
         |GROUP BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"),
          langId(col("text")).as("pred"), qualityScore(col("text")).as("q"))
        .withColumn("keeper", min("doc_id").over(Window.partitionBy("text")))
      k.filter(col("pred") =!= "und" && col("q") >= -400000L && col("doc_id") === col("keeper"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(tokenCount(col("text"))).as("total_tokens"))
    },

    // top-k vocabulary: corpus token frequencies, deterministic
    // (count DESC, token ASC) ranking. One explode + one map-side-
    // combined hash aggregate + a 50-row top-k — the canonical
    // vocabulary-building shuffle at any corpus size.
    sql("text_vocab",
      s"""SELECT token, n FROM (
         |  SELECT u.x AS token, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT $toksSql AS t FROM documents), unnest(t) u(x)
         |  GROUP BY u.x)
         |ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    },

    // document fingerprinting: md5 of normalized text + min-shingle hash
    sql("text_fingerprint",
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |  list_min(list_transform(sh, s -> md5(s))) AS min_shingle_fp
        |FROM (
        |  SELECT doc_id, text,
        |    (SELECT list(DISTINCT t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] || ' ' || t[u.i+3] || ' ' || t[u.i+4])
        |     FROM unnest(CASE WHEN len(t) >= 5 THEN range(1, len(t)-3) ELSE [] END) u(i)) AS sh
        |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |) WHERE doc_id < 500""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"), tokens(col("text")).as("t"))
        .select(col("doc_id"),
          docFingerprint(col("text")).as("fp"),
          minShingleFingerprint(col("t")).as("min_shingle_fp"))
    }
  )
}
