package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables

/** Event-stream batch analytics over `events` ([NS] rows of SURVEY
  * §2.2: sessionization + micro-batch time windowing). The raw
  * parquet column is TIMESTAMP(NANOS); engines disagree on ns→µs
  * conversion at the sub-microsecond level (truncate vs round, and
  * DuckDB versions differ on whether the scan preserves ns). So every
  * ordering/gap/bucket key here is a BIGINT derived from the raw
  * integer nanos the same way on both sides: Spark reads the column
  * as a long and `div 1000`s it (Tables.events), the oracle uses
  * `epoch_ns(ts) // 1000` — identical integer division on both sides.
  * (DuckDB's `//` on INTEGER/BIGINT operands truncates toward zero,
  * exactly like Spark's `div` — verified empirically: -7 // 2 = -3 —
  * so the derivation agrees even for pre-epoch (negative-nanos)
  * timestamps. Note `//` on DOUBLE/DECIMAL is plain division; every
  * `//` in these oracles runs on BIGINT.)
  *
  * Scale: both queries are one shuffle on `user_id` (window) or the
  * group keys; sessionization's running sum shares the same sort as
  * the lag, so Catalyst plans a single window exchange.
  */
object Events {

  private val D2 = DecimalType(18, 2)
  private val GAP_US = 30L * 60 * 1000000 // 30-minute session gap
  private val FUNNEL_W = 24L * 3600 * 1000000 // 24-hour funnel conversion window

  def all: Seq[QueryDef] = Seq(

    // ---- sessionization: 30-min-gap sessions per user ----
    sql("events_sessionize",
      s"""WITH base AS (
         |  SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tsus
         |  FROM events),
         |lagged AS (
         |  SELECT user_id, event_id, value, tsus,
         |    CASE WHEN tsus - lag(tsus)
         |           OVER (PARTITION BY user_id ORDER BY tsus, event_id) > $GAP_US
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM base),
         |sess AS (
         |  SELECT user_id, event_id, value,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsus, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM lagged)
         |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tsus", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("tsus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("tsus", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("tsus") - lag(col("tsus"), 1).over(w) > GAP_US, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_value"))
    },

    // ---- native session_window operator over the same 30-min gap ----
    // Exercises Spark's built-in session window (merge-on-overlap
    // semantics: an event exactly GAP after the previous one starts a
    // NEW session, so the oracle's island break is `diff >= GAP`,
    // unlike the lag-based sessionize above which uses `> GAP`).
    // Tie timestamps need no id tiebreak: whichever tie row the window
    // order visits first carries the break flag, and every row of the
    // tie lands in the same island either way.
    sql("events_session_window",
      s"""WITH base AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tsus, value FROM events),
         |lagged AS (
         |  SELECT user_id, tsus, value,
         |    CASE WHEN lag(tsus) OVER w IS NULL
         |           OR tsus - lag(tsus) OVER w >= $GAP_US
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY tsus)),
         |sess AS (
         |  SELECT user_id, tsus, value,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsus
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
         |  FROM lagged)
         |SELECT user_id, CAST(min(tsus) AS BIGINT) AS sess_start,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start"),
          col("n_events"), col("sum_value"))
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

    // ---- as-of join: latest event at-or-before each checkpoint ----
    // The distributed as-of shape (Spark has no ASOF JOIN operator;
    // DuckDB does, which makes the oracle genuinely independent):
    // tag quotes 0 / probes 1, union, one window pass per user_id
    // carries the latest quote forward onto each probe row. ONE
    // shuffle on user_id, no per-row lookups, no range cross join —
    // at 100 TB this is a sort-merge within each user partition.
    // Tie-breaking ((user_id, tsus) duplicates) folds into the window
    // order (t, tag, event_id): among equal timestamps the largest
    // event_id is carried, which is exactly the oracle's max() dedup —
    // the event table itself moves through ONE exchange only. Probes
    // (hour-end checkpoints derived from the data) are a tiny
    // map-side-combined distinct (≤ users × hours rows) and always
    // have at least one quote before them, so the join is total.
    sql("events_asof_join",
      """WITH q AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tsus, max(event_id) AS event_id
        |  FROM events GROUP BY user_id, epoch_ns(ts) // 1000),
        |p AS (
        |  SELECT DISTINCT user_id, (tsus // 3600000000) * 3600000000 + 3600000000 AS pts
        |  FROM q)
        |SELECT p.user_id AS user_id, p.pts AS pts, q.event_id AS last_event_id
        |FROM p ASOF JOIN q ON p.user_id = q.user_id AND p.pts >= q.tsus
        |ORDER BY p.user_id, p.pts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).withColumn("tsus", unix_micros(col("ts")))
      val quotes = ev.select(
        col("user_id"), col("tsus").as("t"), lit(0).as("tag"), col("event_id"))
      val probes = ev.select(col("user_id"),
          (expr("tsus div 3600000000") * 3600000000L + 3600000000L).as("t"))
        .distinct()
        .select(col("user_id"), col("t"), lit(1).as("tag"),
          lit(null).cast(LongType).as("event_id"))
      val w = Window.partitionBy("user_id").orderBy("t", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      quotes.unionByName(probes)
        .withColumn("last_event_id", last(col("event_id"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("t").as("pts"), col("last_event_id"))
    },

    // ---- range join: events near another user's purchase ----
    // Spark has no native band/interval join (a raw |t1-t2| <= B theta
    // join plans as a cartesian product); the scalable shape is bucket
    // replication: purchases replicate to 3 adjacent B-wide buckets,
    // events keep their own bucket, the join is an EQUI join on bucket
    // with the band residual applied after — work is proportional to
    // true collision volume, and each qualifying pair meets in exactly
    // one bucket (no dedup pass). DuckDB executes the same band
    // predicate with its native IEJoin, making the oracle an
    // independent range-join implementation.
    sql("events_range_join",
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsus FROM events),
        |p AS (SELECT user_id AS pu, epoch_ns(ts) // 1000 AS pt
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id AS event_id, CAST(count(p.pt) AS BIGINT) AS n_nearby
        |FROM e LEFT JOIN p
        |  ON p.pt BETWEEN e.tsus - 300000000 AND e.tsus + 300000000
        | AND e.user_id <> p.pu
        |GROUP BY e.event_id ORDER BY event_id""".stripMargin) { (s, d) =>
      val B = 300000000L // 5-minute band in µs
      val ev = Tables.events(s, d).withColumn("tsus", unix_micros(col("ts")))
      val events = ev.select(col("event_id"), col("user_id"), col("tsus"),
        expr(s"tsus div $B").as("bucket"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("tsus").as("pt"),
          expr(s"tsus div $B").as("pb"))
        .withColumn("bucket", explode(array(col("pb") - 1, col("pb"), col("pb") + 1)))
        .drop("pb")
      events.join(purchases, Seq("bucket"), "left_outer")
        .groupBy("event_id")
        .agg(sum(when(col("pt").isNotNull &&
            abs(col("tsus") - col("pt")) <= B && col("user_id") =!= col("pu"), 1L)
          .otherwise(0L)).cast(LongType).as("n_nearby"))
    },

    // ---- funnel: view -> click -> purchase, strictly ordered, each
    // step within a 24-hour conversion window ----
    // Classic event-sequence analysis as staged aggregates: stage N's
    // first-completion time bounds stage N+1's search interval. Three
    // aggregations + two joins, ALL keyed on user_id — one logical
    // shuffle key end-to-end, so AQE coalesces the exchanges; no
    // per-user sorting or UDF sequence matching.
    sql("events_funnel",
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t FROM events),
         |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN t END) AS t1
         |       FROM e GROUP BY user_id),
         |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
         |       WHERE event_type = 'click' AND t > t1 AND t <= t1 + $FUNNEL_W
         |       GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
         |       WHERE event_type = 'purchase' AND t > t2 AND t <= t2 + $FUNNEL_W
         |       GROUP BY e.user_id)
         |SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
         |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
         |       count(*) AS n_users
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      val s1 = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("t"))).as("t1"))
      val s2 = e.join(s1, "user_id")
        .filter(col("event_type") === "click" && col("t") > col("t1") &&
          col("t") <= col("t1") + FUNNEL_W)
        .groupBy("user_id").agg(min("t").as("t2"))
      val s3 = e.join(s2, "user_id")
        .filter(col("event_type") === "purchase" && col("t") > col("t2") &&
          col("t") <= col("t2") + FUNNEL_W)
        .groupBy("user_id").agg(min("t").as("t3"))
      s1.join(s2, Seq("user_id"), "left_outer").join(s3, Seq("user_id"), "left_outer")
        .select(when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1).otherwise(0).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
    },

    // ---- cohort retention: day-k activity per first-seen cohort ----
    // cohort = each user's first active day; a user counts toward
    // (cohort, k) once if active k days after first seen. Two
    // aggregates + one join, all keyed on user_id; day ids are integer
    // epoch-days so the hash gate holds.
    sql("events_retention",
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort, e.day - f.cohort AS k
        |      FROM e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort, k, count(*) AS n_users
        |FROM a WHERE k <= 7 GROUP BY cohort, k ORDER BY cohort, k""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      val f = e.groupBy("user_id").agg(min("day").as("cohort"))
      e.join(f, "user_id")
        .select(col("user_id"), col("cohort"), (col("day") - col("cohort")).as("k"))
        .distinct()
        .filter(col("k") <= 7)
        .groupBy("cohort", "k").agg(count(lit(1)).as("n_users"))
    },

    // ---- tumbling time window (micro-batch shape; Spark window()) ----
    // The bucket is emitted as BIGINT hours-since-epoch (not a
    // timestamp) so the comparison never touches engine timestamp
    // formatting; Spark still derives it via window() to exercise the
    // tumbling-window operator.
    sql("events_window",
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_id, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_value"))
        .select((unix_micros(col("window.start")) / 3600000000L).cast(LongType).as("hour_id"),
          col("event_type"), col("n"), col("sum_value"))
    },

    // ---- value profiling: equi-width histogram of event values per
    // type (integer cents, bin = value-offset div width) — the
    // column-profiling pass a pipeline runs before schema decisions.
    // One narrow map + one hash agg. (`value` is non-negative in the
    // testdata, where intDiv's floor and DuckDB's truncating `//`
    // agree; a signed column would need the offset-shift recipe.)
    sql("events_histogram",
      """SELECT event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500 AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.intDiv
      Tables.events(s, d)
        .groupBy(col("event_type"),
          intDiv(floor(col("value") * 100 + 0.5).cast(LongType), lit(2500L)).as("bin"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- time-series gap filling: the dense hourly series per event
    // type with zero rows where nothing happened — downstream models
    // need the explicit zeros (a missing hour is not a missing
    // observation). The dense axis is generated per type from its own
    // [min, max] hour span via sequence+explode (narrow; no driver
    // loop), then the sparse counts left-join in. Bounded output at
    // sf0.01; at scale the span clamps to the analysis window.
    sql("events_gap_fill",
      """WITH h AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_id, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(hour_id) AS lo, max(hour_id) AS hi
        |         FROM h GROUP BY 1),
        |axis AS (SELECT event_type, u.h AS hour_id
        |         FROM span, unnest(range(lo, hi + 1)) u(h))
        |SELECT axis.event_type, axis.hour_id, coalesce(h.n, 0) AS n
        |FROM axis LEFT JOIN h USING (event_type, hour_id)""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d)
        .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hour_id"))
        .agg(count(lit(1)).as("n"))
      val axis = h.groupBy("event_type")
        .agg(min("hour_id").as("lo"), max("hour_id").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hour_id"))
      axis.join(h, Seq("event_type", "hour_id"), "left_outer")
        .select(col("event_type"), col("hour_id"), coalesce(col("n"), lit(0L)).as("n"))
    },

    // ---- robust anomaly detection: hourly volume spikes per event
    // type flagged by median + 3×MAD (median absolute deviation) —
    // the outlier-resistant alternative to mean/stddev z-scores, in
    // EXACT integer math (discrete medians via the same row_number
    // rank selection as agg_quantile_disc, so no float quantile
    // semantics cross the oracle boundary). Two window passes over
    // the (tiny) per-type hourly aggregate, one shuffle each.
    sql("events_anomaly",
      """WITH h AS (
        |  SELECT epoch_ns(ts) // 3600000000000 AS hour_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n, hour_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS cnt FROM h),
        |m AS (SELECT event_type, max(CASE WHEN rn = (cnt-1)//2 + 1 THEN n END) AS med
        |      FROM r GROUP BY 1),
        |d AS (SELECT h.event_type, h.hour_id, h.n, m.med, abs(h.n - m.med) AS dev
        |      FROM h JOIN m USING (event_type)),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev, hour_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS cnt FROM d),
        |md AS (SELECT event_type, max(CASE WHEN rn = (cnt-1)//2 + 1 THEN dev END) AS mad
        |       FROM r2 GROUP BY 1)
        |SELECT d.event_type, d.hour_id, d.n, d.med, md.mad
        |FROM d JOIN md USING (event_type) WHERE d.n > d.med + 3 * md.mad""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions.intDiv
      val hourly = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("hour_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type")
      def discreteMedian(df: org.apache.spark.sql.DataFrame, valueCol: String, out: String) =
        df.withColumn("rn", row_number().over(w.orderBy(valueCol, "hour_id")))
          .withColumn("cnt", count(lit(1)).over(w))
          .groupBy("event_type")
          .agg(max(when(col("rn") === intDiv(col("cnt") - 1, lit(2L)) + 1,
            col(valueCol))).as(out))
      val med = discreteMedian(hourly, "n", "med")
      val dev = hourly.join(med, "event_type")
        .withColumn("dev", abs(col("n") - col("med")))
      val mad = discreteMedian(dev, "dev", "mad")
      dev.join(mad, "event_type")
        .filter(col("n") > col("med") + lit(3L) * col("mad"))
        .select("event_type", "hour_id", "n", "med", "mad")
    },

    // ---- clickstream path analysis: top-20 full session paths —
    // sessionize, concatenate each session's event types in time
    // order, count path frequencies. The order-preserving concat is
    // collect-structs → array_sort → project (collect_list alone has
    // no order guarantee); one window + one agg + a 20-row top-k.
    sql("events_top_paths",
      s"""WITH base AS (
         |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS tsus
         |  FROM events),
         |lagged AS (
         |  SELECT *, CASE WHEN tsus - lag(tsus)
         |      OVER (PARTITION BY user_id ORDER BY tsus, event_id) > $GAP_US
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM base),
         |sess AS (
         |  SELECT user_id, event_id, event_type, tsus,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsus, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM lagged),
         |paths AS (
         |  SELECT string_agg(event_type, '>' ORDER BY tsus, event_id) AS path
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT path, count(*) AS n FROM paths
         |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tsus", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("tsus", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("tsus") - lag(col("tsus"), 1).over(w) > GAP_US, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("tsus"), col("event_id"), col("event_type")))),
            x => x.getField("event_type"))).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    },

    // ---- RFM segmentation: recency/frequency/monetary scores per
    // user at fixed business thresholds (the scale-honest variant —
    // rank-based quintiles need a GLOBAL ordered window, one task at
    // any size; fixed bins are a narrow map). Metrics are exact
    // integers (days, counts, cents); the corpus max-day anchor is a
    // one-row broadcast join.
    sql("events_rfm",
      """WITH anchor AS (SELECT max(epoch_ns(ts) // 86400000000000) AS maxd FROM events),
        |pu AS (
        |  SELECT user_id,
        |    (SELECT maxd FROM anchor) - max(epoch_ns(ts) // 86400000000000) AS rec,
        |    count(*) AS freq,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CASE WHEN rec <= 0 THEN 3 WHEN rec <= 1 THEN 2 ELSE 1 END AS r,
        |  CASE WHEN freq >= 75 THEN 4 WHEN freq >= 65 THEN 3
        |       WHEN freq >= 55 THEN 2 ELSE 1 END AS f,
        |  CASE WHEN cents >= 450000 THEN 4 WHEN cents >= 350000 THEN 3
        |       WHEN cents >= 250000 THEN 2 ELSE 1 END AS m,
        |  count(*) AS n_users
        |FROM pu GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
      val anchor = e.agg(max("day").as("maxd"))
      val perUser = e.groupBy("user_id")
        .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
          sum("cents").as("cents"))
        .crossJoin(broadcast(anchor))
        .withColumn("rec", col("maxd") - col("last_day"))
      perUser.select(
          when(col("rec") <= 0, 3).when(col("rec") <= 1, 2).otherwise(1).as("r"),
          when(col("freq") >= 75, 4).when(col("freq") >= 65, 3)
            .when(col("freq") >= 55, 2).otherwise(1).as("f"),
          when(col("cents") >= 450000L, 4).when(col("cents") >= 350000L, 3)
            .when(col("cents") >= 250000L, 2).otherwise(1).as("m"))
        .groupBy("r", "f", "m").agg(count(lit(1)).as("n_users"))
    },

    // ---- SLIDING time window (2h length, 1h slide): every event
    // lands in two overlapping buckets — Spark's window() emits the
    // assignment natively; the oracle derives the same two start
    // hours per event arithmetically. Overlap factor multiplies rows
    // by length/slide (2 here), a constant — still one hash agg.
    sql("events_sliding_window",
      """SELECT t.start_hour, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |    unnest([epoch_ns(ts) // 3600000000000 - 1,
        |            epoch_ns(ts) // 3600000000000]) AS start_hour
        |  FROM events) t
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select((unix_micros(col("window.start")) / 3600000000L).cast(LongType).as("start_hour"),
          col("event_type"), col("n"))
    },

    // ---- Markov transition counts: (previous event → event) pairs per
    // user in time order — the first-order behavioral model behind
    // next-event prediction and anomaly scoring. One lag window on the
    // same (user_id; time) sort sessionization uses, then a tiny hash
    // agg over (prev, next) — a single exchange at any scale.
    sql("events_transitions",
      """WITH x AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_et
        |  FROM events)
        |SELECT prev_et, event_type AS et, count(*) AS n
        |FROM x WHERE prev_et IS NOT NULL GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(expr("unix_micros(ts)"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_et", lag("event_type", 1).over(w))
        .filter(col("prev_et").isNotNull)
        .groupBy(col("prev_et"), col("event_type").as("et"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- CDC changelog apply: collapse an ordered change stream to
    // current state — the merge every lakehouse ingest pipeline runs.
    // The stream is reinterpreted as upserts ('error' rows = deletes);
    // per key only the LATEST op survives (event_id = the commit LSN,
    // a total deterministic order), and a surviving delete means
    // the key is absent from the state table. ONE window shuffle keyed
    // by the entity key — latest-wins never joins the snapshot; the
    // streaming analog of this exact fold is mapGroupsWithState.
    sql("events_cdc_apply",
      """WITH log AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM log)
        |SELECT user_id, cents AS last_cents, event_id AS last_event,
        |  CAST(n AS BIGINT) AS n_changes
        |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
      val log = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
        .withColumn("rn", row_number().over(w.orderBy(col("event_id").desc)))
        .withColumn("n", count(lit(1)).over(w))
      log.filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("user_id"), col("cents").as("last_cents"),
          col("event_id").as("last_event"), col("n").cast(LongType).as("n_changes"))
    },

    // ---- last-touch attribution: each purchase credits the most
    // recent prior view/click of the same user within a 7-day
    // lookback, else 'direct'. The "which touch, and when" pair rides
    // ONE integer window max — the touch time and channel pack into
    // tsus*10+code (code 2=click beats 1=view on an exact-tie
    // timestamp, deterministically on both engines), so the whole
    // attribution is a single user-keyed window shuffle: no
    // self-join, no per-purchase subquery. The 100 TB shape is the
    // same one exchange keyed by user.
    sql("events_attribution",
      s"""WITH base AS (
         |  SELECT user_id, event_id, event_type, value,
         |         epoch_ns(ts) // 1000 AS tsus
         |  FROM events),
         |marked AS (
         |  SELECT *,
         |    max(CASE WHEN event_type = 'view'  THEN tsus * 10 + 1
         |             WHEN event_type = 'click' THEN tsus * 10 + 2 END)
         |      OVER (PARTITION BY user_id ORDER BY tsus, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_code
         |  FROM base)
         |SELECT CASE WHEN touch_code IS NULL
         |              OR tsus - touch_code // 10 > ${7L * 86400 * 1000000}
         |            THEN 'direct'
         |            WHEN touch_code % 10 = 2 THEN 'click' ELSE 'view' END AS channel,
         |  CAST(count(*) AS BIGINT) AS n_purchases,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM marked WHERE event_type = 'purchase'
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val lookbackUs = 7L * 86400 * 1000000
      val w = Window.partitionBy("user_id").orderBy("tsus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("tsus"))
        .withColumn("touch_code",
          max(when(col("event_type") === "view", col("tsus") * 10 + 1)
            .when(col("event_type") === "click", col("tsus") * 10 + 2)).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(
          when(col("touch_code").isNull ||
              col("tsus") - expr("touch_code div 10") > lookbackUs, "direct")
            .when(col("touch_code") % 10 === 2, "click")
            .otherwise("view").as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_value"))
    },

    // ---- dwell time: per-user inter-event gap statistics — the
    // engagement metric behind session-quality scoring. One window
    // shuffle on user_id computes the lag; the per-user aggregate
    // reuses the same partitioning (no second exchange). All outputs
    // are integer microseconds, so the hash gate is exact — the
    // consumer divides total/n for the mean, not the engine.
    sql("events_dwell_time",
      """WITH base AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tsus FROM events),
        |g AS (
        |  SELECT user_id,
        |    tsus - lag(tsus) OVER (PARTITION BY user_id
        |                           ORDER BY tsus, event_id) AS gap
        |  FROM base)
        |SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS total_gap_us,
        |  CAST(max(gap) AS BIGINT) AS max_gap_us,
        |  CAST(min(gap) AS BIGINT) AS min_gap_us
        |FROM g WHERE gap IS NOT NULL GROUP BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("tsus", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsus"))
        .withColumn("gap", col("tsus") - lag(col("tsus"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(col("gap")).as("n_gaps"),
          sum(col("gap")).as("total_gap_us"),
          max(col("gap")).as("max_gap_us"),
          min(col("gap")).as("min_gap_us"))
    }
  )
}
