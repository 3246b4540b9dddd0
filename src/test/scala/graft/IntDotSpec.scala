package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorFunctions => V}

/** Native codegen'd IntDotProduct expression: exact agreement with the
  * interpreted higher-order form, null handling, SQL registration via
  * SparkSessionExtensions, and presence in whole-stage codegen.
  */
class IntDotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("native expression agrees with the interpreted fold on real embeddings") {
    val qe = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
    val both = qe.toDF("v1", "qa").crossJoin(qe.toDF("v2", "qb")).limit(2000)
      .select(V.intDot(col("qa"), col("qb")).as("native"),
        V.intDotHof(col("qa"), col("qb")).as("interpreted"))
    assert(both.filter(col("native") =!= col("interpreted")).count() == 0)
    assert(both.count() == 2000)
  }

  test("null input yields null; mismatched lengths use the shorter prefix") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))),
      (None, Some(Seq(1L, 2L))),
      (Some(Seq(2L, 3L)), Some(Seq(10L, 10L, 99L)))).toDF("a", "b")
    val out = df.select(V.intDot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(Some(32L), None, Some(50L)))
  }

  test("registered as a SQL function via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_intdot(array(1L, 2L), array(3L, 4L)) AS d").collect().head
    assert(r.getLong(0) == 11L)
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // parquet-backed input: literals would constant-fold into a
    // LocalTableScan and bypass codegen entirely
    val qe = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(V.quantize(col("embedding")).as("q"))
    val df = qe.select(V.intDot(col("q"), col("q")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen stages; the native
    // expression's Project is starred, while the higher-order
    // quantize transform stays in an uncodegen'd Project below it
    assert(plan.linesIterator.exists(l => l.contains("graft_intdot") && l.trim.startsWith("*(")),
      plan)
    assert(df.filter(col("d") <= 0).count() == 0) // self-dot is positive
  }
}
