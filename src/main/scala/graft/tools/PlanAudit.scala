package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: prints join/exchange lines of the physical plan for
  * the named catalog queries and flags CartesianProduct /
  * BroadcastNestedLoopJoin — the two shapes that do not survive a
  * 100× scale-up. Run: `sbt "runMain graft.tools.PlanAudit q1 q2"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      println(if (bad.isEmpty) "OK: no cartesian/BNL" else s"FLAG: ${bad.mkString(",")}")
      println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
        .take(12).mkString("\n"))
    }
    spark.stop()
  }
}
