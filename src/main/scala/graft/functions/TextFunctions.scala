package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-pipeline operators
  * (tokenize / shingle / hash / language-ID / quality), built from
  * Catalyst built-ins + higher-order functions so everything stays
  * inside whole-stage codegen — no Scala UDFs on the hot path.
  *
  * Every function here has an exact DuckDB-SQL equivalent (the
  * definitions are integer/string-deterministic), which is what makes
  * the dedup/text operators oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-grams (shingles) over a PRE-PROJECTED token
    * array column, space-joined. Docs with fewer than n tokens yield
    * an empty array.
    *
    * Callers must materialize the token array in its own projection
    * (`df.select(tokens(col("text")).as("t"))`) and pass `col("t")`:
    * inlining `split()` here would re-evaluate it for every
    * element_at inside the transform lambda (measured 18× slower at
    * sf0.1 — higher-order lambdas get no common-subexpression
    * elimination). Catalyst keeps the separate projection because the
    * multiply-referenced alias is non-cheap. */
  def shinglesOfTokens(t: Column, n: Int): Column = {
    val idx = when(size(t) >= n, sequence(lit(1), size(t) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*)))
  }

  /** 28-bit integer hash of a string: first 7 hex chars of md5.
    * DuckDB: CAST(concat('0x', substring(md5(s),1,7)) AS BIGINT). */
  def md5Int(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** MinHash permutation parameters: k (a, b) pairs mod P, fixed
    * constants shared with the SQL oracles. */
  val MINHASH_P: Long = 2147483647L
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (1 to k).map { i =>
      val a = (1103515245L * i + 12345L) % MINHASH_P
      val b = (69069L * i + 1L) % MINHASH_P
      (if (a == 0) 1L else a, b)
    }

  /** One minhash value: min over hashed shingles of (a*h+b) mod P.
    * `h` must be < 2^28 (md5Int) so a*h fits in a long. */
  def permHash(h: Column, a: Long, b: Long): Column =
    (h * lit(a) + lit(b)) % lit(MINHASH_P)

  // ---- language ID (n-gram/stopword heuristic, SURVEY north star) ----

  /** Stopword markers per language; order is the deterministic
    * tie-break priority. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "y", "que", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Predicted language: the first language (in `langMarkers` order)
    * whose marker-hit count equals the max; 'und' when no marker hits. */
  def langId(text: Column): Column = {
    val hits = langMarkers.map { case (l, ws) => l -> stopwordHits(text, ws) }
    val maxHits = greatest(hits.map(_._2): _*)
    val chain = hits.reverse.foldLeft(lit("und")) { case (acc, (l, h)) =>
      when(h === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    }
    chain
  }

  // ---- quality scoring ----
  // All scores are emitted as exact integer PARTS-PER-MILLION (ppm)
  // BIGINTs, never doubles: `round(x, 6)` at a comparison boundary is
  // the known Spark-vs-DuckDB half-way-rounding trap (Spark rounds the
  // shortest-decimal repr via BigDecimal HALF_UP; DuckDB rounds the
  // binary double). Integer numerator*1e6 div denominator is exact and
  // engine-independent.

  /** Exact integral division for non-negative `a`, `b >= 1`: the
    * pmod subtraction makes the double division an exact multiple
    * (both operands < 2^53), so the quotient is bit-exact — identical
    * to DuckDB's BIGINT `//` and Spark's `div`. */
  def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  private val PPM = 1000000L

  /** Punctuation chars per million total chars. */
  def punctRatio(text: Column): Column = {
    val punct = (length(text) - length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))).cast("long")
    intDiv(punct * PPM, greatest(length(text), lit(1)).cast("long"))
  }

  /** Mean token length in millionths of a char. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    intDiv(aggregate(t, lit(0L), (acc, x) => acc + length(x)) * PPM,
      greatest(size(t), lit(1)).cast("long"))
  }

  /** Stopword hits per million tokens. */
  def stopwordRatio(text: Column): Column = {
    val all = langMarkers.flatMap(_._2)
    intDiv(stopwordHits(text, all).cast("long") * PPM,
      greatest(tokenCount(text), lit(1)).cast("long"))
  }

  /** Composite quality score in ppm: favors stopword-bearing,
    * low-punctuation, mid-length docs. Pure integer math. */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) * 2L +
      when(tokenCount(text).between(20, 1000), lit(500000L)).otherwise(lit(0L)) -
      punctRatio(text)

  // ---- fingerprinting ----

  /** Whole-document fingerprint: md5 of whitespace-normalized lowercase. */
  def docFingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** POSITIONAL word n-gram hashes over a pre-projected token array
    * (order preserved, duplicates kept — winnowing needs the rolling
    * sequence, unlike the distinct [[shinglesOfTokens]] sets). */
  def positionalShingleHashes(t: Column, n: Int): Column = {
    val idx = when(size(t) >= n, sequence(lit(1), size(t) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    transform(idx, i =>
      md5Int(concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*)))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS local document fingerprint): slide a window
    * of `w` consecutive k-gram hashes over `hs` and keep each window's
    * minimum, deduplicated. Guarantees every match of length
    * >= w+k-1 tokens shares a fingerprint, with density 2/(w+1).
    * Pure integer/array math — exact across engines. */
  def winnowedFingerprints(hs: Column, w: Int): Column = {
    val idx = when(size(hs) >= w, sequence(lit(1), size(hs) - (w - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, j => array_min(slice(hs, j, lit(w)))))
  }

  /** Rolling min-hash style fingerprint: min md5 over word 5-grams of
    * a pre-projected token array (see [[shinglesOfTokens]]). */
  def minShingleFingerprint(t: Column): Column =
    array_min(transform(shinglesOfTokens(t, 5), s => md5(s)))

  /** Unicode NFC normalization (Neo4j 5.17 `normalize()`): a
    * codegen'd StaticInvoke of [[TextNormJava.nfc]] — Catalyst
    * evaluates the static call directly, no Scala UDF wrapping. */
  def normalizeNFC(c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.types.StringType
    org.apache.spark.sql.GraftSqlBridge.column(StaticInvoke(
      classOf[TextNormJava], StringType, "nfc",
      Seq(org.apache.spark.sql.GraftSqlBridge.expression(c)),
      inputTypes = Seq(StringType),
      propagateNull = true, returnNullable = true))
  }
}
