package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface ([NS] — the reference image itself has
  * no streaming, SURVEY §2.10; these are the stream-shaped variants of
  * the batch event operators): `readStream` -> transform ->
  * `writeStream`, watermarked tumbling-window aggregation, and
  * custom per-key session state via `flatMapGroupsWithState`.
  *
  * At scale the same code runs against a file/Kafka source with many
  * partitions: the window agg is a streaming partial/final hash
  * aggregate with watermark-driven state eviction, and the session
  * operator keeps one state object per user key in the state store.
  */
object StreamingOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Streaming tumbling-window counts: 1-hour windows, 2-hour
    * watermark for late data. */
  def windowedCounts(spark: SparkSession, sourceDir: String): DataFrame =
    windowedCountsOf(spark.readStream.schema(eventSchema).parquet(sourceDir))

  /** Same aggregation over any streaming source frame — lets a
    * deployment (or spec) pick its own source pacing options
    * (`maxFilesPerTrigger`, Kafka, …) while keeping one definition of
    * the aggregation. In Append mode the watermark is what closes
    * windows: a window emits once the watermark passes its end, and
    * its state row is evicted — state is bounded by the horizon, not
    * the stream's lifetime. */
  def windowedCountsOf(src: DataFrame): DataFrame =
    src.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id: the watermark bounds the
    * dedup state the same way it bounds window state — ids older than
    * the watermark are evicted, so state is proportional to the
    * watermark horizon, not the stream's lifetime. */
  def dedupEvents(spark: SparkSession, sourceDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(sourceDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each micro-batch hash-joins
    * against the static dimension (broadcast when small — no stream
    * state at all, the canonical dimension-enrichment shape). */
  def enrichAgainstStatic(spark: SparkSession, sourceDir: String,
      dim: DataFrame): DataFrame =
    spark.readStream.schema(eventSchema).parquet(sourceDir)
      .join(broadcast(dim), Seq("user_id"), "inner")

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessState(lastTsMicros: Long, sessions: Long, events: Long)

  /** Custom state: per-user session counting with a 30-minute gap,
    * emitted in Update mode after each micro-batch. */
  def sessionCounts(spark: SparkSession, sourceDir: String): Dataset[UserSessions] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    spark.readStream.schema(eventSchema).parquet(sourceDir)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, events: Iterator[Ev], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val us = e.ts.getTime * 1000
            val newSession = st.lastTsMicros == Long.MinValue || us - st.lastTsMicros > gapUs
            st = SessState(us,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator.single(UserSessions(user, st.sessions, st.events))
      }
  }
}
