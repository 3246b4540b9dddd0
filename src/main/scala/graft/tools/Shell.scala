package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.core.GraphViews

/** `graft shell` — the engine's cypher-shell analog (SURVEY.md §3.3;
  * ref TestBasic.java:146-156 asserts cypher-shell on PATH).
  *
  * Usage: graft.tools.Shell [--graph tpch:<sfDir>] ["<cypher>"...]
  * With queries as args runs them one-shot; otherwise reads stdin
  * lines (semicolon-terminated statements) as a REPL.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-shell")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val session = new GraftSession(spark)
    var rest = args.toList
    rest match {
      case "--graph" :: spec :: tail if spec.startsWith("tpch:") =>
        session.setGraph(GraphViews.tpch(spark, spec.stripPrefix("tpch:")))
        rest = tail
      case _ =>
    }

    def run(q: String): Unit =
      try session.cypher(q).show(50, truncate = false)
      catch {
        case e: Exception =>
          System.err.println(s"error: ${e.getMessage}")
          if (sys.env.contains("GRAFT_DEBUG")) e.printStackTrace()
      }

    if (rest.nonEmpty) rest.foreach(run)
    else {
      print("graft> "); Console.flush()
      val buf = new StringBuilder
      for (line <- scala.io.Source.stdin.getLines()) {
        buf.append(line).append('\n')
        if (line.trim.endsWith(";")) {
          run(buf.toString.trim.stripSuffix(";")); buf.clear()
          print("graft> "); Console.flush()
        }
      }
      if (buf.toString.trim.nonEmpty) run(buf.toString)
    }
    spark.stop()
  }
}
