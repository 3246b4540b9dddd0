package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: prints PushedFilters/ReadSchema lines for named
  * catalog queries — verifies predicates and pruned columns reach the
  * parquet scan. */
object PushdownCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim.take(2000)).foreach(println)
    }
    spark.stop()
  }
}
