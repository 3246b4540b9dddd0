package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (repo:TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst predicate
  * pushdown / column pruning reach the scan. At 100 TB the same call
  * reads a partitioned directory tree; nothing here assumes single-file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to map to TimestampType. Read it as a long (nanos since
    * epoch) and truncate to micros — the same ns→us truncation DuckDB's
    * `CAST(ts AS TIMESTAMP)` performs, so oracle comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // set once and leave on: toggling back was racy under concurrent
    // catalog queries, and the conf only affects TIMESTAMP(NANOS)
    // parquet columns — `events` is the sole such table
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    apply(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
