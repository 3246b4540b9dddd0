package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The grading-surface guard: every entry in `SparkEntry.catalog` must
  * at least ANALYZE against the smallest testdata (a `df.schema`
  * probe). Round 9 lost 18 graded rows because a testdata schema
  * change made `Tables.events` throw at plan time — the failure was
  * only visible in 2 of 18 affected queries' specs. This spec turns
  * any plan-time break into one red test PER catalog row, so a data
  * contract drift can never silently shrink the graded set again.
  *
  * Note: a handful of entries (stream_*, iterative gds_*) execute
  * bounded jobs inside `fn` before returning the frame; at sf0.001
  * that stays cheap, and exercising them here is the point — the
  * probe must reach the same code the driver's Verify runs.
  */
class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("catalog names are unique and queries map covers the full catalog") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate catalog names: ${names.diff(names.distinct).distinct}")
    assert(SparkEntry.queries.size == SparkEntry.catalog.size,
      "SparkEntry.queries dropped catalog entries (name collision?)")
  }

  test("every oracle belongs to a catalog entry") {
    val names = SparkEntry.catalog.map(_.name).toSet
    val orphans = SparkEntry.oracleSql.keySet.diff(names)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  SparkEntry.catalog.foreach { q =>
    test(s"${q.name} analyzes against sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"${q.name} produced an empty schema")
    }
  }
}
