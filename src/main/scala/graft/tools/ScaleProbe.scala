package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: empirical scale-up probe. Self-multiplies the heavy
  * tables N× (ids re-keyed per replica so cardinality grows too, not
  * just row count) and times the shuffle-heaviest operator shapes.
  * A plan that is accidentally quadratic / single-task shows up as a
  * superlinear wall-clock jump long before 100 TB does.
  *
  * Run: `graft.tools.ScaleProbe [sfdir] [factor]` (default sf0.1 ×10).
  *
  * Measured (local[32], 16g): sf0.1 ×1 → ×10 (events 100k→1M rows):
  * sessionize-window 1.7→3.0 s, minhash-lsh-bands 3.0→3.6 s,
  * knn-graph-bucket-join 0.9→2.5 s — ≤1.8× wall for 10× rows on the
  * window/agg shapes; the kNN join absorbs the in-bucket pair
  * blow-up (identical replicas collide into the same buckets, a
  * worse-than-real skew) and still scales.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables

    // replicate with re-keyed ids: replica i shifts every id by i*10^9
    def rep(df: DataFrame, idCols: Seq[String]): DataFrame =
      (0 until n).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))
      }.reduce(_ unionByName _)

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    val events = rep(Tables.events(spark, sf), Seq("event_id", "user_id"))
    val docs = rep(Tables.documents(spark, sf), Seq("doc_id"))
    val emb = rep(Tables.embeddings(spark, sf), Seq("vec_id"))
    println(s"probe at $sf ×$n: events=${events.count()}, docs=${docs.count()}, emb=${emb.count()}")

    // sessionize: the (user_id; time) window shuffle
    time("sessionize-window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events.withColumn("prev", lag("ts", 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1L)
            .otherwise(0L))
        .groupBy("user_id").agg(sum("new_sess").as("n_sessions"))
    }

    // minhash-LSH dedup: shingle → signature → band bucket self-join
    time("minhash-lsh-bands") {
      import graft.functions.TextFunctions._
      val t = docs.select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(shinglesOfTokens(col("t"), 3)).as("sh"))
        .select(col("doc_id"), md5Int(col("sh")).as("h"))
      val sigs = minhashParams(8).zipWithIndex.map { case ((a, b), i) =>
        min(permHash(col("h"), a, b)).as(s"m$i") }
      val sig = t.groupBy("doc_id").agg(sigs.head, sigs.tail: _*)
      val bands = sig.select(col("doc_id"),
        concat_ws(":", col("m0"), col("m1"), col("m2"), col("m3")).as("band"))
      val other = bands.toDF("doc_id2", "band")
      bands.join(other, Seq("band")).filter(col("doc_id") < col("doc_id2"))
        .groupBy("band").agg(count(lit(1)).as("pairs"))
    }

    // kNN-graph: LSH bucket self-join over all vectors
    time("knn-graph-bucket-join") {
      import graft.functions.{VectorFunctions => V}
      val qe = emb.select(col("vec_id"), V.quantize(col("embedding")).as("q"))
        .select(col("vec_id"), col("q"), V.qNorm(col("q")).as("nrm"))
        .withColumn("bucket", V.lshSignature(col("q"), 4, 64))
      val a = qe.toDF("q_id", "qa", "na", "bucket")
      val b = qe.toDF("neighbor", "qb", "nb", "bucket2")
      a.join(b, col("bucket") === col("bucket2") && col("q_id") =!= col("neighbor"))
        .groupBy("q_id").agg(count(lit(1)).as("cands"))
    }

    spark.stop()
  }
}
