package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables

/** Event-stream batch analytics over `events` ([NS] rows of SURVEY
  * §2.2: sessionization + micro-batch time windowing). Session gaps
  * compare integer epoch-micros on both engines — interval arithmetic
  * on timestamps is exact integer math, so the grouping is
  * hash-stable.
  *
  * Scale: both queries are one shuffle on `user_id` (window) or the
  * group keys; sessionization's running sum shares the same sort as
  * the lag, so Catalyst plans a single window exchange.
  */
object Events {

  private val D2 = DecimalType(18, 2)
  private val GAP_US = 30L * 60 * 1000000 // 30-minute session gap

  def all: Seq[QueryDef] = Seq(

    // ---- sessionization: 30-min-gap sessions per user ----
    sql("events_sessionize",
      s"""WITH lagged AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > $GAP_US
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |sess AS (
         |  SELECT user_id, event_id, value,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM lagged)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) > GAP_US, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_value"))
    },

    // ---- salted two-stage aggregation (skew pattern) ----
    // The skew recipe for a hot grouping key: salt the key with a
    // deterministic shard (event_id % 16), aggregate partially per
    // (key, salt) — spreading one hot key over 16 reducers — then
    // combine partials. Result is identical to a direct groupBy
    // (counts/sums are associative), which is what the oracle checks.
    sql("events_salted_agg",
      """SELECT event_type, CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(SUM(sv) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT event_type, event_id % 16 AS salt, count(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events GROUP BY event_type, event_id % 16)
        |GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), (col("event_id") % 16).as("salt"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(D2)).as("sv"))
        .groupBy("event_type")
        .agg(sum(col("n")).cast(LongType).as("n"),
          sum(col("sv")).cast(DoubleType).as("sum_value"))
    },

    // ---- tumbling time window (micro-batch shape; Spark window()) ----
    sql("events_window",
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    }
  )
}
