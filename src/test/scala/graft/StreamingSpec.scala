package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev

/** Structured Streaming behaviors ([NS]): the streaming windowed agg
  * must agree with its batch equivalent once the stream drains, and
  * the stateful session operator must count gap-separated sessions.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def writeSource(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    val events = Seq(
      // user 1: two sessions (gap 45 min between minute 10 and 55)
      Ev(0, ts(0), 1, "click", 1.0), Ev(1, ts(10), 1, "view", 2.0),
      Ev(2, ts(55), 1, "click", 3.0),
      // user 2: one session
      Ev(3, ts(5), 2, "view", 4.0), Ev(4, ts(20), 2, "error", 5.0),
      // a second hour for the window agg
      Ev(5, ts(70), 1, "click", 6.0))
    events.toDF().write.mode("overwrite").parquet(dir)
    dir
  }

  private def drain(q: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val query = q.writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)
  }

  test("streaming windowed agg matches the batch equivalent after drain") {
    val dir = writeSource()
    drain(StreamingOps.windowedCounts(spark, dir), "win_counts")
    val streamed = spark.sql(
      "SELECT hour, event_type, n, sum_value FROM win_counts")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    import org.apache.spark.sql.functions._
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-dup").toString
    val events = Seq(
      Ev(0, ts(0), 1, "click", 1.0), Ev(0, ts(1), 1, "click", 1.0), // dup id
      Ev(1, ts(2), 1, "view", 2.0), Ev(2, ts(3), 2, "view", 3.0),
      Ev(2, ts(4), 2, "view", 3.0)) // dup id
    events.toDF().write.mode("overwrite").parquet(dir)
    val q = StreamingOps.dedupEvents(spark, dir).writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.sql("SELECT event_id FROM dedup_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L))
  }

  test("stream-static join enriches each micro-batch against a broadcast dimension") {
    import spark.implicits._
    val dir = writeSource()
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = StreamingOps.enrichAgainstStatic(spark, dir, dim).writeStream
      .format("memory").queryName("enrich_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT user_id, tier, event_id FROM enrich_out").collect()
    assert(rows.length == 6) // every event matched its user's tier
    assert(rows.filter(_.getLong(0) == 1L).forall(_.getString(1) == "gold"))
    assert(rows.filter(_.getLong(0) == 2L).forall(_.getString(1) == "silver"))
  }

  test("append mode with watermark across micro-batches: closed windows emit, state stays bounded") {
    import spark.implicits._
    // two source files, processed as SEPARATE micro-batches via
    // maxFilesPerTrigger=1 — the continuous-operation shape: the
    // watermark advances between batches and closes earlier windows
    val dir = Files.createTempDirectory("graft-stream-append").toString
    def writeOne(name: String, evs: Seq[Ev], modMinute: Long): Unit = {
      val stage = Files.createTempDirectory("graft-stream-stage").toString
      evs.toDF().coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$dir/$name")
      Files.move(part.toPath, dst)
      // the file source processes oldest-modified first: pin the order
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(modMinute * 60000L))
    }
    // batch 1: hour-0 events; batch 2: an hour-3 event that advances
    // the 2h watermark to 1:10, past the hour-0 window's 1:00 end
    writeOne("a.parquet", Seq(
      Ev(0, ts(0), 1, "click", 1.0), Ev(1, ts(10), 1, "view", 2.0),
      Ev(2, ts(20), 2, "click", 3.0)), modMinute = 1)
    writeOne("b.parquet", Seq(Ev(3, ts(190), 1, "click", 4.0)), modMinute = 2)

    val src = spark.readStream.schema(StreamingOps.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingOps.windowedCountsOf(src).writeStream
      .format("memory").queryName("append_win").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2, s"expected >=2 data micro-batches, saw $dataBatches")

    // only the CLOSED hour-0 windows may appear; hour 3 is still open
    val emitted = spark.sql("SELECT hour, event_type, n FROM append_win")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    assert(emitted == Set((0L, "click", 2L), (0L, "view", 1L)),
      s"append emitted $emitted")

    // state holds only the open window's group(s), not everything seen
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators.head.numRowsTotal
    assert(stateRows <= 2, s"state not bounded: $stateRows rows")
  }

  test("flatMapGroupsWithState sessionizes with a 30-minute gap") {
    val dir = writeSource()
    drain(StreamingOps.sessionCounts(spark, dir).toDF(), "sess_counts")
    val rows = spark.sql("SELECT user_id, n_sessions, n_events FROM sess_counts")
      .collect()
      // Update mode may emit a row per micro-batch per key: keep the
      // final (max-events) row per user
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.maxBy(_.getLong(2)) }
    // user 1: events at 0,10 | 55 | 70 minutes -> gaps 45 and 15 min -> 2 sessions, 4 events
    assert(rows(1L).getLong(1) == 2L && rows(1L).getLong(2) == 4L)
    // user 2: one session, 2 events
    assert(rows(2L).getLong(1) == 1L && rows(2L).getLong(2) == 2L)
  }

  test("bounded replays actually unload their state-store providers") {
    // pins the reflection into Spark's private StateStore registry
    // (r15 verdict "what's wrong" #1): a Spark upgrade that moves the
    // API turns the eager unload into a silent no-op and re-opens the
    // ~5 s provider buildup across a catalog run — this fails loudly
    // instead. Run a STATEFUL graded replay end to end, then assert
    // the registry is readable AND empty.
    operators.Streaming.all.find(_.name == "stream_sessions").get
      .fn(spark, "/root/testdata/sf0.001").collect()
    val n = operators.Streaming.loadedStateStoreProviders
    assert(n.nonEmpty,
      "StateStore provider registry not readable via reflection — the " +
        "bounded-replay unload has gone dark (Spark private API moved?)")
    assert(n.get == 0, s"bounded replay left ${n.get} state-store providers loaded")
  }
}
