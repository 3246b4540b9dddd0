package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns using Catalyst
  * higher-order functions — stays in codegen, no UDF, distributes as a
  * narrow per-row map (SURVEY.md §2.5 genai pack).
  *
  * All math is double-precision with left-to-right folds, matching
  * DuckDB's `list_dot_product` on `DOUBLE[]` so similarity operators
  * are oracle-checkable (results rounded to 6 decimals at the edge).
  */
object VectorFunctions {

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

  /** Deterministic ±1 hyperplane coefficients for sign-LSH: coef(i, j)
    * derives from md5 so Scala, generated SQL, and any other engine
    * agree. */
  def hyperplane(bit: Int, dim: Int): Seq[Int] =
    (0 until dim).map { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-lsh-$bit-$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1 else -1
    }

  /** Sign-LSH bucket signature: `bits` sign bits of dot(v, r_i),
    * concatenated as a string like "10110010". */
  def lshSignature(v: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { i =>
      val coefs = hyperplane(i, dim)
      val signed = zip_with(v, array(coefs.map(c => lit(c.toDouble)): _*),
        (x, c) => x.cast("double") * c)
      when(aggregate(signed, lit(0.0), (acc, x) => acc + x) > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** SQL mirror of [[lshSignature]] for the DuckDB oracles. */
  def lshSignatureSql(vecExpr: String, bits: Int, dim: Int): String =
    (0 until bits).map { i =>
      val coefs = hyperplane(i, dim).map(_.toDouble).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(CAST($vecExpr AS DOUBLE[]), $coefs) > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
}
