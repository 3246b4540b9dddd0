package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev utility (r19 optimization round): dump `explain("formatted")`
  * for named catalog queries to files — the before/after plan evidence
  * the optimization deliverables require (`plans/r19/<q>_before.txt`).
  * Args: <outDir> <suffix> <sfdir> <name>[,<name>...]
  * Runs each query once (so AQE-final plans and any session fixtures
  * exist), then writes the FORMATTED plan of a fresh build. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, sf, namesCsv) = args.take(4)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        // special fixture: the IVF probe's INNER statement plan (the
        // ann_ivf_recall row itself returns a local toDF of collected
        // results, so its row plan can't show the probe shape)
        val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
          if (name == "ivf_probe") { (s, d) =>
            import org.apache.spark.sql.functions._
            val gs = new graft.GraftSession(s)
            val nodes = graft.core.Tables.embeddings(s, d).select(
              (col("vec_id") * 10 + 5).cast("long").as("id"),
              array(lit("emb")).as("labels"), col("embedding"), col("vec_id"))
            gs.setGraph(graft.core.PropertyGraph(nodes,
              graft.core.PropertyGraph.empty(s).edges))
            gs.cypher("CREATE VECTOR INDEX emb_ivf FOR (n:emb) ON n.embedding " +
              "OPTIONS {indexConfig: {`vector.similarity_function`: 'cosine'}}")
            gs.saveDatabase(
              java.nio.file.Files.createTempDirectory("graft_plandump_ivf_").toString)
            val v = graft.core.Tables.embeddings(s, d).filter(col("vec_id") === 0)
              .collect().head.getSeq[Float](1).map(_.toDouble)
            gs.cypher("CALL db.index.vector.queryNodes('emb_ivf', 10, $v, " +
              "{probes: 8}) YIELD nodeId RETURN nodeId", Map("v" -> v))
          }
          else graft.SparkEntry.queries(name)
        // run once: warms session fixtures and gives AQE a final plan
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        val df = fn(spark, sf)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        // executed (AQE-final) plan of the materialized run, appended —
        // join strategies/exchange shapes after reoptimization
        df.write.format("noop").mode("overwrite").save()
        val executed = df.queryExecution.executedPlan.toString
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
          formatted + "\n\n== Executed (AQE-final) ==\n" + executed)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
