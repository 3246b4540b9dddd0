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

    // cypher-shell `:commands` (ref cypher-shell script surface):
    // transaction commands map onto the session's validated no-op
    // transaction statements; they need no `;` terminator.
    def runShellCommand(cmd: String): Boolean = cmd.toLowerCase match {
      case ":begin"            => run("BEGIN"); true
      case ":commit"           => run("COMMIT"); true
      case ":rollback"         => run("ROLLBACK"); true
      case ":exit" | ":quit"   => false
      case other =>
        System.err.println(s"error: unknown command $other"); true
    }

    if (rest.nonEmpty) rest.foreach { stmt =>
      if (stmt.trim.startsWith(":")) runShellCommand(stmt.trim) else run(stmt)
    }
    else {
      print("graft> "); Console.flush()
      val buf = new StringBuilder
      var live = true
      val lines = scala.io.Source.stdin.getLines()
      while (live && lines.hasNext) {
        val line = lines.next()
        if (buf.isEmpty && line.trim.startsWith(":")) {
          live = runShellCommand(line.trim)
          if (live) { print("graft> "); Console.flush() }
        } else {
          buf.append(line).append('\n')
          if (line.trim.endsWith(";")) {
            run(buf.toString.trim.stripSuffix(";")); buf.clear()
            print("graft> "); Console.flush()
          }
        }
      }
      if (live && buf.toString.trim.nonEmpty) run(buf.toString)
    }
    spark.stop()
  }
}
