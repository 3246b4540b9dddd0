package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns using Catalyst
  * higher-order functions — stays in codegen, no UDF, distributes as a
  * narrow per-row map (SURVEY.md §2.5 genai pack).
  *
  * Determinism strategy: similarity operators first QUANTIZE each
  * embedding to integers (`floor(x * 1e6)`). Testdata values are in
  * [-1, 1], so quantized values are ≤ 1e6, pairwise products ≤ 1e12
  * and dim-64 dot products ≤ 6.4e13 — all exactly representable in
  * IEEE-754 doubles. Integer sums are exact, hence associative: the
  * result is bit-identical across engines and summation orders, so
  * cosine scores and LSH bucket signs hash-match a DuckDB oracle with
  * no float-rounding caveats.
  */
object VectorFunctions {

  /** Quantization scale: 1e6 keeps dim<=1000, |x|<=2 embeddings inside
    * the double-exact integer range (2^53). */
  val QUANT = 1000000.0

  /** floor(x * 1e6) per element — integer-valued LongType array. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(QUANT)).cast("long"))

  /** DuckDB mirror of [[quantize]]; kept as integer-valued DOUBLE[] so
    * list_dot_product applies directly (exact — see object doc). */
  def quantizeSql(vecExpr: String): String =
    s"list_transform(CAST($vecExpr AS DOUBLE[]), x -> floor(x * 1000000))"

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd Catalyst expression ([[graft.plans.IntDotProduct]]):
    * the interpreted `aggregate(zip_with(...))` form evaluates lambda
    * calls per element, this compiles to a tight long loop inside the
    * stage. Identical integer semantics. */
  def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.IntDotProduct(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Interpreted higher-order form of [[intDot]] (kept as the
    * cross-check reference for the native expression). */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Per-vector norm, computed once before a join so each candidate
    * pair folds the arrays once instead of three times (higher-order
    * lambdas are interpreted per element — at k candidate pairs this
    * is the dominant cost). */
  def qNorm(q: Column): Column = sqrt(intDot(q, q).cast("double"))

  def qNormSql(q: String): String = s"sqrt(list_dot_product($q, $q))"

  /** Integer cosine score in [-1e6, 1e6] with precomputed norms:
    * floor(cos * 1e6 + 0.5). All dot inputs are exact integers, sqrt
    * is IEEE-correctly-rounded, and *, /, +, floor are deterministic
    * on identical doubles — the BIGINT is engine-independent. */
  def icosN(qa: Column, qb: Column, na: Column, nb: Column): Column =
    floor(intDot(qa, qb).cast("double") / (na * nb) * lit(QUANT) + lit(0.5)).cast("long")

  def icosNSql(qa: String, qb: String, na: String, nb: String): String =
    s"CAST(floor(list_dot_product($qa, $qb) / ($na * $nb) * 1000000 + 0.5) AS BIGINT)"

  // ---- raw double variants (internal use; not oracle-checked) ----

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v))

  // ---- sign-LSH bucketing (the 100 TB similarity path) ----

  /** Deterministic ±1 hyperplane coefficients for sign-LSH: coef(i, j)
    * derives from md5 so Scala, generated SQL, and any other engine
    * agree. */
  def hyperplane(bit: Int, dim: Int): Seq[Int] =
    (0 until dim).map { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-lsh-$bit-$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1 else -1
    }

  /** Sign-LSH bucket signature over a QUANTIZED vector: `bits` sign
    * bits of dot(q, r_i), concatenated as a string like "1011". The
    * ±1-weighted integer sums are exact, so bucket assignment is
    * identical across engines. Each bit's dot runs through the native
    * codegen'd [[intDot]] against a literal coefficient array. At
    * scale, `bits` grows with log(n) to keep per-bucket candidate
    * counts bounded. */
  def lshSignature(q: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { i =>
      val coefs = array(hyperplane(i, dim).map(c => lit(c.toLong)): _*)
      when(intDot(q, coefs) > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** DuckDB mirror of [[lshSignature]] over a quantized DOUBLE[]. */
  def lshSignatureSql(qExpr: String, bits: Int, dim: Int): String =
    (0 until bits).map { i =>
      val coefs = hyperplane(i, dim).map(_.toDouble).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($qExpr, $coefs) > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
}
