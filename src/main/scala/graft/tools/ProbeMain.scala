package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run the bench's join-order probe standalone (plans
  * printed) without paying for the whole catalog. Args: [nBig]. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val nBig = if (args.nonEmpty) args(0).toLong else 4000000L
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    try println(graft.Bench.joinOrderProbeJson(spark, s"$tmp/_joinorder",
      nBig, debug = true))
    finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(Path.of(tmp)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
