package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: times one catalog query N times after an optional
  * warmup subset; prints the final (AQE) join strategy lines.
  * Args: <name> [sfdir] [n] [warmPrefixes|none|catalog]. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val warm = if (args.length > 3) args(3) else "none"
    // honors the bench's core-count contract so c8-vs-c32 per-query
    // probes don't need a full Bench run
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      df.write.format("noop").mode("overwrite").save(); df
    }
    if (warm != "none") {
      val sel = graft.SparkEntry.catalog.filter(q =>
        warm == "catalog" || warm.split(",").exists(p => q.name.startsWith(p)))
      val t0 = System.nanoTime()
      sel.foreach { q =>
        try mat(q.fn(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => () }
      }
      println(f"warmup ${sel.size} queries: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // SPARK_GRAFT_JOBS=1: per-run Spark job count + per-job wall time
    // (where does a multi-statement row spend its actions?)
    val jobsMode = sys.env.getOrElse("SPARK_GRAFT_JOBS", "0")
    val countJobs = jobsMode != "0"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMillis = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    if (countJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); jobMillis.put(s.jobId, -s.time)
          // SPARK_GRAFT_JOBS=2 additionally attributes each job to its
          // action call site (where does a fixed per-row job prelude
          // come from?)
          if (jobsMode == "2") jobSite.put(s.jobId,
            s.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim)
              .getOrElse("?"))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobMillis.computeIfPresent(e.jobId, (_, t0) => t0 + e.time)
      })
    // SPARK_GRAFT_SHUFFLE=1: total shuffle records/bytes written per run
    // (the scale-faithful metric — wall seconds at sf0.1 can hide a
    // per-round edge-table re-shuffle that IS the cost at 10^10 edges)
    val countShuffle = sys.env.get("SPARK_GRAFT_SHUFFLE").contains("1")
    val shRecs = new java.util.concurrent.atomic.AtomicLong(0)
    val shBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    if (countShuffle) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) {
            tasks.incrementAndGet()
            shRecs.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
            shBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          }
      })
    (1 to n).foreach { i =>
      jobs.set(0); jobMillis.clear()
      shRecs.set(0); shBytes.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val df = mat(graft.SparkEntry.queries(name)(spark, sf))
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (countShuffle) {
        Thread.sleep(300) // listener bus drains asynchronously
        println(s"shuffle: records=${shRecs.get} bytes=${shBytes.get} tasks=${tasks.get}")
      }
      if (countJobs) {
        Thread.sleep(300) // let the listener bus drain
        import scala.jdk.CollectionConverters._
        val times = jobMillis.asScala.toSeq.sortBy(_._1)
        println(s"jobs ${jobs.get()}: " +
          times.map { case (id, ms) => s"$id=${ms}ms" }.mkString(" "))
        if (jobsMode == "2") println("sites: " + times.map { case (id, ms) =>
          s"$id=${jobSite.getOrDefault(id, "?")}(${ms}ms)" }.mkString(" "))
      }
      if (i == n) println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.replaceAll("\\[plan_id=\\d+\\]", "").take(120)).mkString("\n"))
    }
    spark.stop()
  }
}
