package graft.procs

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Procedure + scalar-function registry (SURVEY.md §2.1 C8–C11).
  *
  * A procedure is a table function `Seq[Any] => DataFrame` (the
  * `CALL … YIELD` surface — ref DatabaseIO.java:92); a scalar fn is a
  * `Seq[Column] => Column` usable inside RETURN (C10 — ref
  * TestConfSettings.java:411 `RETURN apoc.version()`). Packs
  * (apoc/gds/genai, §2.5) register into this at session boot.
  */
final class ProcedureRegistry(spark: SparkSession) {

  /** Declared parameter: name + optional default (C11 — the stub
    * plugin's `@Name(value = "string", defaultValue = "a string")`
    * shape, ref ExampleNeo4jPlugin.java:52-59). */
  final case class Param(name: String, default: Option[Any] = None)

  final case class ProcDef(name: String, signature: String,
      description: String, params: Seq[Param], fn: Seq[Any] => DataFrame)

  private val procs = mutable.LinkedHashMap.empty[String, ProcDef]
  private val scalars = mutable.LinkedHashMap.empty[String, (String, Seq[Column] => Column)]

  def register(name: String, signature: String, description: String = "")(
      fn: Seq[Any] => DataFrame): Unit =
    procs(name) = ProcDef(name, signature, description, Nil, fn)

  /** Register with declared parameters: positional call args fill the
    * declared params in order; missing trailing args take their
    * defaults; a missing arg without a default is an error. */
  def registerWithParams(name: String, params: Seq[Param], signature: String,
      description: String = "")(fn: Seq[Any] => DataFrame): Unit =
    procs(name) = ProcDef(name, signature, description, params, { args =>
      if (args.size > params.size)
        throw new IllegalArgumentException(
          s"Procedure $name expects at most ${params.size} arguments, got ${args.size}")
      val resolved = params.zipWithIndex.map { case (p, i) =>
        args.lift(i).orElse(p.default).getOrElse(
          throw new IllegalArgumentException(
            s"Procedure $name: missing required argument `${p.name}`"))
      }
      fn(resolved)
    })

  def registerScalar(name: String, signature: String)(fn: Seq[Column] => Column): Unit =
    scalars(name) = (signature, fn)

  def procedure(name: String): Option[Seq[Any] => DataFrame] = procs.get(name).map(_.fn)
  def scalar(name: String): Option[Seq[Column] => Column] = scalars.get(name).map(_._2)
  def names: Seq[String] = procs.keys.toSeq

  /** `SHOW FUNCTIONS YIELD name, signature` — the scalar registry. */
  def functionsDataFrame: DataFrame = {
    val rows = scalars.toSeq.sortBy(_._1).map { case (n, (sig, _)) =>
      Row(n, s"$n$sig", "BUILT-IN")
    }
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("signature", StringType),
      StructField("category", StringType)))
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)
  }

  /** `SHOW PROCEDURES YIELD name, signature` (C9 —
    * ref StubPluginHelper.java:113). */
  def asDataFrame: DataFrame = {
    val rows = procs.values.toSeq.sortBy(_.name).map(p =>
      Row(p.name, s"${p.name}${p.signature}", p.description))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("signature", StringType),
      StructField("description", StringType)))
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)
  }

  private implicit class SeqOps[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add); l
    }
  }

  /** Multi-row helper: fixed columns, per-column type inferred from
    * the first non-null value (Long-widened like property literals). */
  def rows(cols: Seq[String], data: Seq[Seq[Any]]): DataFrame = {
    def typ(i: Int): org.apache.spark.sql.types.DataType =
      data.iterator.map(_(i)).find(_ != null) match {
        case Some(_: String)              => StringType
        case Some(_: Long) | Some(_: Int) => LongType
        case Some(_: Double)              => DoubleType
        case Some(_: Boolean)             => BooleanType
        case _                            => StringType
      }
    val schema = StructType(cols.zipWithIndex.map { case (n, i) =>
      StructField(n, typ(i)) })
    val rs = data.map(vals => Row(vals.map {
      case i: Int => i.toLong
      case v      => v
    }: _*))
    spark.createDataFrame(new java.util.ArrayList[Row](rs.asJava), schema)
  }

  /** One-row helper for procedures returning a fixed record. */
  def oneRow(values: (String, Any)*): DataFrame = {
    val schema = StructType(values.map { case (n, v) =>
      StructField(n, v match {
        case _: String  => StringType
        case _: Long    => LongType
        case _: Int     => IntegerType
        case _: Double  => DoubleType
        case _: Boolean => BooleanType
        case _          => StringType
      })
    })
    val row = Row(values.map(_._2): _*)
    spark.createDataFrame(new java.util.ArrayList[Row](Seq(row).asJava), schema)
  }
}
