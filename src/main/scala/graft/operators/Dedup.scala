package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` (driver north star):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: the only all-pairs comparison ever materialized is
  * *within* a blocking key (shared shingle / LSH band bucket / hash
  * group), so work scales with collision volume, not n². The MinHash
  * path is the 100 TB route: signature = k min-aggregates in one pass
  * over exploded shingles (map-side combinable), candidates = a
  * band-bucket self-join, verification only touches candidate pairs.
  */
object Dedup {

  private val K = 16 // minhash permutations
  private val BANDS = 4 // 4 bands x 4 rows
  private val params = minhashParams(K)
  private val P = MINHASH_P
  private val DF_CAP = 50 // max document frequency for blocking shingles
  private val BUCKET_CAP = 64 // LSH bucket size before overflow re-banding kicks in
  private val LSH_BITS = 4 // sign-LSH signature bits (grows with log n)
  private val DIM = 64 // testdata embedding dimension
  private val V = graft.functions.VectorFunctions

  // ---------------- shared Spark fragments ----------------

  /** doc_id, s — distinct word-3-gram shingles per doc. Tokens are
    * materialized in their own projection first (see
    * [[graft.functions.TextFunctions.shinglesOfTokens]]). */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    shingleDfOf(Tables.documents(s, d))

  private def shingleDfOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("t"), 3)).as("s"))

  /** The minhash rows' shingle input: documents REPARTITIONED by
    * doc_id before the CPU-heavy tokenize+shingle pass, then
    * checkpointed once. A corpus delivered as a few unsplittable
    * parquet files otherwise runs the tokenizer on one core per file
    * regardless of cluster width — the bench's one-file ×10 organic
    * probe measured 17-36 s (high-variance, single-core) for what is
    * ~1 s of 32-way work; the shuffled bytes are the raw texts, cheap
    * next to the per-token work they unlock. Only the signature rows
    * pay the exchange — the other dedup rows keep the bare scan. */
  private def shingleDfRepart(s: SparkSession, d: String): DataFrame =
    shingleDfOf(Tables.documents(s, d).repartition(col("doc_id")))

  /** Capped-shingle blocking rows (doc_id, s, n) shared by
    * dedup_ngram_jaccard and dedup_clusters. Window-free (r19, guide
    * §2.3 "aggregate before you shuffle"): each count-over-partition
    * window shuffled AND sorted the whole exploded shingle table. The
    * same rows come from (a) an aggregate of hot shingles (map-side
    * combined, df > cap keeps it tiny by construction) anti-joined
    * back — the shingle table itself is never shuffled by s — and (b)
    * a per-doc size aggregate joined back (AQE broadcasts it locally;
    * at cluster scale it is the window's shuffle without the sort).
    * The tokenize+3-gram explode is localCheckpointed ONCE (r20; the
    * proven dedup_substring pattern, guide §1.2): it otherwise re-runs
    * under the hot-shingle aggregate, the size aggregate, and the
    * self-join's shared exchange — the r19 window-free rewrite left it
    * un-checkpointed and the recomputation showed up as a 2× wall
    * regression in the driver bench (dedup_clusters 3.25→5.33 s,
    * dedup_ngram_jaccard 1.64→3.27 s) even though the shuffle plan
    * improved. Materialize-once is also the 100 TB shape: the window
    * plan shuffled the whole exploded table anyway, so holding it once
    * costs no more than the plan it replaced moved. */
  private def cappedShingleBlocking(s: SparkSession, d: String): DataFrame = {
    // Pinned-width repartition, not shingleDf: the corpus ships as one
    // parquet file, so the un-repartitioned tokenize+explode runs on
    // ONE core — checkpointing a single-task explode just serializes
    // the same serial work (measured flat). Repartitioning by doc_id
    // first spreads the CPU-heavy pass across the cluster and the
    // checkpoint holds distributed blocks (the minhash rows' proven
    // shape). The width is PINNED to defaultParallelism because AQE's
    // byte-based coalescing sees ~5 MB of text and merges the exchange
    // back to 1-2 partitions — bytes are the wrong proxy for a
    // CPU-bound stage (tokenize cost rides row count, not input size);
    // cluster width is the scale-correct divisor for per-row CPU work.
    val sh0 = shingleDfOf(Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id")))
      .localCheckpoint()
    val hotSh = sh0.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > DF_CAP).select("s")
    val shr = sh0.join(hotSh, Seq("s"), "left_anti")
    val sizes = shr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    shr.join(sizes, Seq("doc_id")).select("doc_id", "s", "n")
  }

  /** LSH bucket keys per (doc, band): MinHash signatures → banding →
    * the two-level overflow re-banding (see the dedup_minhash_lsh
    * entry for the semantics). Bucket sizing rides map-side-combinable
    * aggregates + a join back of ONLY the oversized buckets (≤ n/CAP
    * rows — AQE broadcasts it), not a window: the window's per-bucket
    * sort is pure overhead when all we need is hot-set membership. */
  private def lshKeyed(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("h", md5Int(col("s")))
    val aggs = params.zipWithIndex.map { case ((a, b), i) =>
      min(permHash(col("h"), a, b)).as(s"m$i") }
    val sigs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    def bandCols(bnd: Int) =
      (0 until K / BANDS).map(r => s"m${bnd * (K / BANDS) + r}").mkString(", ")
    val stackExpr = (0 until BANDS).map { bnd =>
      s"$bnd, md5(concat_ws(',', ${bandCols(bnd)})), " +
        s"md5(concat_ws(',', ${bandCols((bnd + 1) % BANDS)})), " +
        s"md5(concat_ws(',', ${bandCols((bnd + 2) % BANDS)}))"
    }.mkString(s"stack($BANDS, ", ", ", ") AS (band, sig, rsig, rsig2)")
    val bands = sigs.select(col("doc_id"), expr(stackExpr))
    val big1 = bands.groupBy("band", "sig").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > BUCKET_CAP)
      .select(col("band"), col("sig"), lit(1).as("_hot"))
    val k1 = bands.join(big1, Seq("band", "sig"), "left_outer")
      .select(col("doc_id"), col("band"), col("sig"), col("rsig2"),
        when(col("_hot").isNotNull, col("rsig")).otherwise(lit("")).as("sub"))
    // level 2: a sub-bucket still over the cap refines once more by
    // the band after next ('' buckets can never match big2 — its rows
    // all carry a non-empty sub — so the join needs no extra guard)
    val big2 = k1.filter(col("sub") =!= "")
      .groupBy("band", "sig", "sub").agg(count(lit(1)).as("bn2"))
      .filter(col("bn2") > BUCKET_CAP)
      .select(col("band"), col("sig"), col("sub"), lit(1).as("_hot2"))
    k1.join(big2, Seq("band", "sig", "sub"), "left_outer")
      .select(col("doc_id"), col("band"), col("sig"),
        when(col("_hot2").isNotNull, concat(col("sub"), col("rsig2")))
          .otherwise(col("sub")).as("sub"))
  }

  /** LSH candidate pairs (d1 < d2) for the given shingle table. */
  private def lshCandidates(sh: DataFrame): DataFrame = {
    val keyed = lshKeyed(sh)
    keyed.toDF("d1", "band", "sig", "sub")
      .join(keyed.toDF("d2", "band2", "sig2", "sub2"),
        col("band") === col("band2") && col("sig") === col("sig2") &&
          col("sub") === col("sub2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** Measured evidence for the LSH linearity claim (r16 verdict #2,
    * the "no silent caps" discipline): (candidate pairs, max
    * post-refinement bucket size, buckets still over the cap after the
    * two-level budget). The bench's organic scaling probe reports
    * these next to the slope, so "candidate volume stays
    * output-proportional" is a measured number, not a design claim. */
  def lshCandidateStats(s: SparkSession, d: String): (Long, Long, Long) = {
    val sh = shingleDfRepart(s, d).localCheckpoint()
    val sizes = lshKeyed(sh).groupBy("band", "sig", "sub")
      .agg(count(lit(1)).as("bn"))
      .agg(max("bn").as("mx"),
        sum(when(col("bn") > BUCKET_CAP, 1L).otherwise(0L)).as("hot"))
      .collect().head
    val cands = lshCandidates(sh).count()
    (cands, if (sizes.isNullAt(0)) 0L else sizes.getLong(0),
      if (sizes.isNullAt(1)) 0L else sizes.getLong(1))
  }

  /** Exact Jaccard for the given candidate pairs (d1 < d2), as an
    * integer score ijac = floor(jac * 1e6 + 0.5): the inputs are exact
    * integers and /, *, +, floor are deterministic on identical
    * doubles, so the BIGINT is engine-independent (round(x, 6)
    * half-way behavior is not). */
  private def verifyJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val sa = sh.toDF("d1", "s")
    val sb = sh.toDF("d2", "s2")
    val shared = cands.join(sa, "d1")
      .join(sb, col("s") === col("s2") && sb("d2") === cands("d2"))
      .groupBy(cands("d1"), cands("d2")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.toDF("d1", "na"), "d1")
      .join(sizes.toDF("d2", "nb"), "d2")
      .select(col("d1"), col("d2"),
        floor(col("shared") * lit(1000000.0) / (col("na") + col("nb") - col("shared")) + lit(0.5))
          .cast("long").as("ijac"))
  }

  // ---------------- shared oracle fragments ----------------

  private val shSql =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS s
      |       FROM toks, unnest(range(1, greatest(len(t)-1, 1))) u(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  private def verifySql(candsCte: String) =
    s"""shared AS (
       |  SELECT c.d1, c.d2, count(*) AS shared
       |  FROM $candsCte c JOIN sh a ON a.doc_id = c.d1
       |  JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
       |  GROUP BY c.d1, c.d2)
       |SELECT sh2.d1, sh2.d2,
       |  CAST(floor(sh2.shared*1000000.0/(sa.n + sb.n - sh2.shared) + 0.5) AS BIGINT) AS ijac
       |FROM shared sh2 JOIN sizes sa ON sa.doc_id = sh2.d1
       |JOIN sizes sb ON sb.doc_id = sh2.d2""".stripMargin

  private val hSql = "CAST(concat('0x', substring(md5(s), 1, 7)) AS BIGINT)"

  /** Shared 32-bit SimHash: per-token md5 bits summed ±1 per position,
    * sign of each sum becomes the fingerprint bit. Identical integer
    * recurrence on both engines. */
  private def simhashOracleCte: String = {
    val tok = "SELECT DISTINCT doc_id, u.x AS s FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), unnest(t) u(x)"
    val sums = (0 until 32).map(j =>
      s"sum(CASE WHEN ($hSql >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n    ")
    val fp = (0 until 32).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""tok AS ($tok),
       |sums AS (SELECT doc_id, $sums FROM tok s GROUP BY doc_id),
       |sims AS (SELECT doc_id, $fp AS simhash FROM sums WHERE doc_id < 500)""".stripMargin
  }

  private def simhashDf(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("s"))
      .withColumn("h", md5Int(col("s")))
    val sums = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    val fp = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), fp.as("simhash"))
  }

  def all: Seq[QueryDef] = Seq(

    // ---- exact dedup: hash-group on content ----
    sql("dedup_exact_stats",
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_unique,
        |       count(*) - count(DISTINCT text) AS n_dups
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_dups"))
    },

    // Incremental ingest dedup — the continuous-pipeline shape: a NEW
    // batch (doc_id % 5 = 0 plays the fresh crawl) anti-joins the
    // EXISTING corpus on a prefix fingerprint (first-3-token md5, the
    // same derived key the exact-group dedup uses, since the corpus
    // has no full-text dups), so only first-seen content flows
    // downstream. ONE keyed anti join at any scale; the corpus side
    // is the pre-computed fingerprint table a real deployment keeps
    // as its dedup index (the batch analog of stream_dedup's state).
    sql("dedup_incremental",
      """WITH fp AS (
        |  SELECT doc_id, md5(concat_ws(' ', t[1], t[2], t[3])) AS grp FROM
        |    (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)),
        |batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
        |corpus AS (SELECT DISTINCT grp FROM fp WHERE doc_id % 5 <> 0)
        |SELECT CAST(count(*) AS BIGINT) AS batch_docs,
        |  CAST(count(*) FILTER (WHERE grp NOT IN (SELECT grp FROM corpus))
        |    AS BIGINT) AS fresh_docs
        |FROM batch""".stripMargin) { (s, d) =>
      val fp = Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat_ws(" ", element_at(tokens(col("text")), 1),
            element_at(tokens(col("text")), 2),
            element_at(tokens(col("text")), 3))).as("grp"))
      val batch = fp.filter(col("doc_id") % 5 === 0)
      val corpus = fp.filter(col("doc_id") % 5 =!= 0).select("grp").distinct()
      val fresh = batch.join(corpus, Seq("grp"), "left_anti")
        .agg(count(lit(1)).as("fresh_docs"))
      batch.agg(count(lit(1)).as("batch_docs")).crossJoin(fresh)
    },

    // Exact dedup on a derived key: the testdata has zero full-text
    // duplicates (an md5(text) grouping returns 0 rows = vacuous), so
    // the group key is the md5 of the first 3 tokens — boilerplate-
    // prefix clustering, the same hash-groupBy plan, non-empty result.
    sql("dedup_exact_groups",
      """SELECT grp, min(doc_id) AS keep_id, count(*) AS n FROM (
        |  SELECT doc_id, md5(concat_ws(' ', t[1], t[2], t[3])) AS grp
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents))
        |GROUP BY grp HAVING count(*) > 1""".stripMargin) { (s, d) =>
      val t = tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat_ws(" ", element_at(t, 1), element_at(t, 2), element_at(t, 3))).as("grp"))
        .groupBy("grp")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
    },

    // Representative selection — the step that turns dup GROUPS into a
    // kept CORPUS. Policy: within each group keep the longest document
    // (most-complete-version, the common crawl-dedup choice), tiebreak
    // lowest doc_id for determinism. One window shuffle keyed by the
    // group fingerprint — the keeper decision never joins back to the
    // corpus, so at 100 TB this is a single hash-partitioned pass.
    sql("dedup_keep_best",
      """WITH g AS (
        |  SELECT doc_id, n_chars, md5(concat_ws(' ', t[1], t[2], t[3])) AS grp
        |  FROM (SELECT doc_id, n_chars,
        |        string_split_regex(trim(text), '\s+') AS t FROM documents)),
        |r AS (
        |  SELECT grp, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY grp ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS n,
        |    sum(n_chars) OVER (PARTITION BY grp) AS grp_chars
        |  FROM g)
        |SELECT grp, doc_id AS keep_id, CAST(n_chars AS BIGINT) AS keep_chars,
        |  CAST(n - 1 AS BIGINT) AS n_dropped,
        |  CAST(grp_chars - n_chars AS BIGINT) AS dropped_chars
        |FROM r WHERE rn = 1 AND n > 1""".stripMargin) { (s, d) =>
      val t = tokens(col("text"))
      val w = Window.partitionBy("grp")
      val g = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          md5(concat_ws(" ", element_at(t, 1), element_at(t, 2), element_at(t, 3))).as("grp"))
        .withColumn("rn", row_number().over(w.orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("grp_chars", sum("n_chars").over(w))
      g.filter(col("rn") === 1 && col("n") > 1)
        .select(col("grp"), col("doc_id").as("keep_id"),
          col("n_chars").cast("long").as("keep_chars"),
          (col("n") - 1).cast("long").as("n_dropped"),
          (col("grp_chars") - col("n_chars")).cast("long").as("dropped_chars"))
    },

    // ---- n-gram Jaccard over discriminative shingles ----
    // Jaccard is computed over shingles with document frequency <=
    // DF_CAP (stop-shingle removal): a shingle shared by thousands of
    // docs both skews the self-join (its bucket is quadratic) and
    // carries no dedup signal. This is one equi self-join + one
    // aggregate — no candidate-set re-join blow-up (a verify pass over
    // all shingles would multiply 1.3M candidate pairs by ~52 shingles
    // each at sf0.1). The cap and score are mirrored in the oracle.
    // Plan shape: the doc-frequency cap and per-doc sizes are window
    // functions riding on the shingle rows (not separate aggregates
    // joined back), so the exploded-shingle subtree is evaluated once
    // per join side instead of 8× — no caching needed, and the
    // per-doc size arrives at the final aggregate for free via the
    // grouping key (na/nb are functionally dependent on d1/d2).
    sql("dedup_ngram_jaccard",
      s"""WITH $shSql,
         |shr AS (SELECT doc_id, s FROM (
         |  SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh) WHERE df <= $DF_CAP),
         |shrn AS (SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n FROM shr),
         |shared AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n AS na, b.n AS nb, count(*) AS shared
         |  FROM shrn a JOIN shrn b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT d1, d2, ijac FROM (
         |  SELECT d1, d2,
         |    CAST(floor(shared*1000000.0/(na + nb - shared) + 0.5) AS BIGINT) AS ijac
         |  FROM shared)
         |WHERE ijac >= 800000""".stripMargin) { (s, d) =>
      // Window-free blocking + checkpoint-once explode: see
      // [[cappedShingleBlocking]].
      val shrn = cappedShingleBlocking(s, d)
      // shuffle_hash hint on BOTH sides: without it AQE sees the
      // post-shuffle compressed size under the broadcast threshold and
      // builds a driver-side HashedRelation of the ENTIRE exploded
      // shingle relation (~500k string rows at sf0.1) — measured
      // 4.6–115 s/run from driver GC thrash, and the r6 bench-wide
      // slowdown. A shuffle-hash self-join on the shingle key is the
      // plan that survives 100 TB (skew already capped by DF_CAP).
      val a = shrn.toDF("d1", "s", "na").hint("shuffle_hash")
      val b = shrn.toDF("d2", "s2", "nb").hint("shuffle_hash")
      a.join(b, col("s") === col("s2") && col("d1") < col("d2"))
        .groupBy("d1", "d2", "na", "nb").agg(count(lit(1)).as("shared"))
        .select(col("d1"), col("d2"),
          floor(col("shared") * lit(1000000.0) / (col("na") + col("nb") - col("shared")) + lit(0.5))
            .cast("long").as("ijac"))
        .filter(col("ijac") >= 800000)
    },

    // ---- near-dup CLUSTERS: pairs -> components -> cluster stats ----
    // The full dedup endgame: the Jaccard pair list becomes an
    // undirected graph and 6 synchronous min-label iterations collapse
    // each connected component onto its smallest doc_id (6 covers the
    // testdata's cluster diameters; both engines run the identical
    // recurrence, so the gate holds converged or not). Keeper policy
    // drops out for free: cluster_rep IS the kept document. Per
    // iteration one keyed join + one min-aggregate — the same shuffle
    // shape WCC has at 100 TB, never all-pairs.
    sql("dedup_clusters", {
      val base =
        s"""WITH $shSql,
           |shr AS (SELECT doc_id, s FROM (
           |  SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh) WHERE df <= $DF_CAP),
           |shrn AS (SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n FROM shr),
           |shared AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n AS na, b.n AS nb, count(*) AS shared
           |  FROM shrn a JOIN shrn b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2, 3, 4),
           |pairs AS (
           |  SELECT d1, d2 FROM (
           |    SELECT d1, d2,
           |      CAST(floor(shared*1000000.0/(na + nb - shared) + 0.5) AS BIGINT) AS ijac
           |    FROM shared)
           |  WHERE ijac >= 800000),
           |und AS (SELECT d1 AS src, d2 AS dst FROM pairs
           |        UNION ALL SELECT d2, d1 FROM pairs),
           |c0 AS (SELECT DISTINCT CAST(src AS BIGINT) AS id, CAST(src AS BIGINT) AS label FROM und)""".stripMargin
      val steps = (1 to 6).map { i =>
        s"""c$i AS (
           |  SELECT n.id, LEAST(n.label, COALESCE(m.nmin, n.label)) AS label
           |  FROM c${i - 1} n LEFT JOIN (
           |    SELECT u.src AS id, min(l.label) AS nmin
           |    FROM und u JOIN c${i - 1} l ON l.id = u.dst
           |    GROUP BY u.src) m ON m.id = n.id)""".stripMargin
      }
      (Seq(base) ++ steps).mkString(",\n") +
        "\nSELECT label AS cluster_rep, CAST(count(*) AS BIGINT) AS n_docs FROM c6 GROUP BY label"
    }) { (s, d) =>
      // Window-free blocking + checkpoint-once explode: see
      // [[cappedShingleBlocking]].
      val shrn = cappedShingleBlocking(s, d)
      // Same shuffle_hash pinning as dedup_ngram_jaccard (see comment
      // there): never let AQE broadcast the exploded-shingle side.
      val a = shrn.toDF("d1", "s", "na").hint("shuffle_hash")
      val b = shrn.toDF("d2", "s2", "nb").hint("shuffle_hash")
      val pairs = a.join(b, col("s") === col("s2") && col("d1") < col("d2"))
        .groupBy("d1", "d2", "na", "nb").agg(count(lit(1)).as("shared"))
        .select(col("d1"), col("d2"),
          floor(col("shared") * lit(1000000.0) / (col("na") + col("nb") - col("shared")) + lit(0.5))
            .cast("long").as("ijac"))
        .filter(col("ijac") >= 800000)
        .select("d1", "d2")
      // Iterative plan hygiene: WITHOUT truncation each of the 6
      // iterations re-embeds the shingle self-join subtree (the most
      // expensive stage) into the growing plan — at sf0.1 that was a
      // 724 s query (BENCH_r06). The edge list is computed ONCE and
      // checkpointed; every labels step is checkpointed too, so each
      // iteration is exactly one keyed join + one min-aggregate over
      // materialized inputs and plan depth stays constant in the
      // iteration count. localCheckpoint (executor-local, eager) is
      // the local-mode form; a 1000-executor deployment would point
      // sc.setCheckpointDir at durable storage and use checkpoint()
      // for lineage truncation that survives executor loss.
      val und = pairs.union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
        .toDF("src", "dst")
        .localCheckpoint()
      // Loop partitions sized to the edge list, not the core count
      // (guide §2.2): each of the 6 min-label rounds launches a join +
      // aggregate + checkpoint over the (tiny at this SF) pair graph,
      // and at 32 shuffle partitions the per-round task scheduling
      // dominated — ~100-130 ms per sub-job measured, and the r19
      // driver artifact showed the row INVERSELY core-scaled
      // (c8/c32 = 0.87). The count is one job over the checkpointed
      // blocks; at real scale the clamp returns the configured width.
      graft.core.AdaptiveParts.withLoopPartitions(s, und.count()) {
        var labels = und.select(col("src").as("id")).distinct()
          .withColumn("label", col("id"))
          .localCheckpoint()
        for (_ <- 1 to 6) {
          val nbrMin = und.join(labels.select(col("id").as("nid"), col("label")),
              col("dst") === col("nid"))
            .groupBy("src").agg(min("label").as("nmin"))
          labels = labels.join(nbrMin.select(col("src").as("id2"), col("nmin")),
              col("id") === col("id2"), "left_outer")
            .select(col("id"),
              least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
            .localCheckpoint()
        }
        labels.groupBy("label").agg(count(lit(1)).cast("long").as("n_docs"))
          .select(col("label").as("cluster_rep"), col("n_docs"))
          .localCheckpoint()
      }
    },

    // ---- MinHash + LSH banding: the scale path ----
    // Bucket-growth bound (r10 organic slope was 1.16): with FIXED
    // band width, LSH buckets densify as the corpus grows and the
    // bucket self-join trends quadratic. Overflow re-banding caps it,
    // RECURSIVELY with a fixed two-level budget (r16 verdict #2): a
    // (band, sig) bucket larger than BUCKET_CAP subdivides by the NEXT
    // band's signature; a sub-bucket STILL over the cap subdivides
    // again by the band after that (a deterministic refinement both
    // engines replay — sizing aggregates + CASEs, no new shuffle key).
    // True near-dups agree on other bands with high probability, so
    // recall loss concentrates on the hash-collision mass that caused
    // the densification. A bucket hot after BOTH levels is docs with
    // three consecutive identical band signatures — near-certain true
    // duplicates, whose pairs are output-proportional by definition —
    // so the residual is kept, not capped (no silent drops;
    // [[lshCandidateStats]] measures the volumes the claim rests on).
    // At correctness scale every bucket is under the cap and the
    // refinement is the identity.
    sql("dedup_minhash_lsh", {
      val minExprs = params.zipWithIndex.map { case ((a, b), i) =>
        s"min(($a * $hSql + $b) % $P) AS m$i" }.mkString(",\n    ")
      def bandCols(bnd: Int) =
        (0 until K / BANDS).map(r => s"m${bnd * (K / BANDS) + r}").mkString(", ")
      val bandSigs = (0 until BANDS).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(concat_ws(',', ${bandCols(bnd)})) AS sig, " +
          s"md5(concat_ws(',', ${bandCols((bnd + 1) % BANDS)})) AS rsig, " +
          s"md5(concat_ws(',', ${bandCols((bnd + 2) % BANDS)})) AS rsig2 FROM sigs"
      }.mkString("\n  UNION ALL ")
      s"""WITH $shSql,
         |sigs AS (
         |  SELECT doc_id,
         |    $minExprs
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  $bandSigs),
         |sized AS (
         |  SELECT doc_id, band, sig, rsig, rsig2,
         |         count(*) OVER (PARTITION BY band, sig) AS bn FROM bands),
         |keyed1 AS (
         |  SELECT doc_id, band, sig, rsig2,
         |         CASE WHEN bn > $BUCKET_CAP THEN rsig ELSE '' END AS sub FROM sized),
         |sized2 AS (
         |  SELECT doc_id, band, sig, rsig2, sub,
         |         count(*) OVER (PARTITION BY band, sig, sub) AS bn2 FROM keyed1),
         |keyed AS (
         |  SELECT doc_id, band, sig,
         |         CASE WHEN sub <> '' AND bn2 > $BUCKET_CAP
         |              THEN sub || rsig2 ELSE sub END AS sub FROM sized2),
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM keyed a JOIN keyed b
         |    ON a.band = b.band AND a.sig = b.sig AND a.sub = b.sub
         |   AND a.doc_id < b.doc_id),
         |${verifySql("cands")}
         |WHERE ijac >= 700000""".stripMargin
    }) { (s, d) =>
      // the shingle table feeds the signature aggregate AND three
      // verify-join subtrees — repartitioned for pre-shuffle
      // parallelism and checkpointed ONCE instead of re-running the
      // tokenizer per subtree (the r16 organic probe spent ~5
      // single-file single-core tokenization passes per run on this)
      val sh = shingleDfRepart(s, d).localCheckpoint()
      verifyJaccard(sh, lshCandidates(sh)).filter(col("ijac") >= 700000)
    },

    // ---- SimHash: 32-bit near-dup fingerprint in one agg pass ----
    sql("dedup_simhash",
      s"""WITH $simhashOracleCte
         |SELECT doc_id, simhash FROM sims""".stripMargin) { (s, d) =>
      simhashDf(s, d)
    },

    // ---- SimHash near-dup PAIRS: banded LSH join + hamming verify ----
    // 4 bands of 8 bits: hamming <= 1 can flip bits in at most one
    // band, so a colliding band is guaranteed (pigeonhole) — the equi
    // join on (band index, band value) finds every qualifying pair
    // with work proportional to band-bucket collisions, never n².
    // The oracle side can therefore be plain all-pairs: same result
    // set, independently derived. Band width grows with log(n) at
    // scale to bound bucket sizes.
    sql("dedup_simhash_pairs",
      s"""WITH $simhashOracleCte
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hd
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
         |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val sims = simhashDf(s, d)
      val banded = sims.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("bi"),
            shiftright(col("simhash"), j * 8).bitwiseAND(255).as("bv"))): _*)).as("b"))
        .select(col("doc_id"), col("simhash"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val a = banded.toDF("d1", "sh1", "bi", "bv")
      val b = banded.toDF("d2", "sh2", "bi2", "bv2")
      a.join(b, col("bi") === col("bi2") && col("bv") === col("bv2") && col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long").as("hd"))
        .filter(col("hd") <= 1)
        .distinct()
    },

    // ---- embedding-cosine near-dup pairs: sign-LSH bucketed ----
    // Both sides bucket on a 4-bit sign-LSH signature and equi-join on
    // the bucket — a hash join whose work scales with per-bucket
    // collision volume, not n² (the previous all-pairs `v1 < v2` join
    // was a broadcast-nested-loop cross product). Exact integer cosine
    // only within buckets; the oracle mirrors the same bucketing. The
    // testdata's max pairwise cosine is ~0.51, so the threshold is
    // 0.35 (icos >= 350000) to keep the result non-empty. At 100 TB,
    // LSH_BITS grows with log(n) to bound bucket sizes.
    sql("dedup_embed_cosine", {
      val sig = V.lshSignatureSql("q", LSH_BITS, DIM)
      s"""WITH qe AS (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings),
         |sg AS (SELECT vec_id, q, ${V.qNormSql("q")} AS nrm, $sig AS bucket FROM qe)
         |SELECT v1, v2, icos FROM (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    ${V.icosNSql("a.q", "b.q", "a.nrm", "b.nrm")} AS icos
         |  FROM sg a JOIN sg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE icos >= 350000""".stripMargin
    }) { (s, d) =>
      val qe = Tables.embeddings(s, d)
        .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
        // norm + bucket computed once per vector, NOT per candidate
        // pair: per-pair scoring then folds the arrays once (icosN)
        .select(col("vec_id"), col("q"), V.qNorm(col("q")).as("nrm"),
          V.lshSignature(col("q"), LSH_BITS, DIM).as("bucket"))
      val a = qe.toDF("v1", "qa", "na", "bucket")
      val b = qe.toDF("v2", "qb", "nb", "bucket2")
      a.join(b, col("bucket") === col("bucket2") && col("v1") < col("v2"))
        .select(col("v1"), col("v2"),
          V.icosN(col("qa"), col("qb"), col("na"), col("nb")).as("icos"))
        .filter(col("icos") >= 350000)
    },

    // SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    // embedding space first (deterministic coarse centroids — the
    // first 16 vectors, as in the IVF path), then mark near-duplicate
    // PAIRS only within a cluster, keeping the lowest id. Clustering
    // bounds the pair search exactly like LSH buckets do, but with
    // semantically-coherent cells — the published recipe for pruning
    // web-scale corpora. Output: per-cell totals + how many vectors a
    // dedup pass would drop.
    sql("dedup_semantic", {
      s"""WITH qe AS (SELECT vec_id, ${V.quantizeSql("embedding")} AS q FROM embeddings),
         |sg AS (SELECT vec_id, q, ${V.qNormSql("q")} AS nrm FROM qe),
         |cent AS (SELECT vec_id AS c_id, q AS cq, nrm AS cn FROM sg WHERE vec_id < 16),
         |assign AS (
         |  SELECT vec_id, q, nrm, c_id AS cell FROM (
         |    SELECT sg.vec_id, sg.q, sg.nrm, cent.c_id,
         |      row_number() OVER (PARTITION BY sg.vec_id
         |        ORDER BY ${V.icosNSql("sg.q", "cq", "sg.nrm", "cn")} DESC, cent.c_id) AS rc
         |    FROM sg, cent)
         |  WHERE rc = 1),
         |dups AS (
         |  SELECT DISTINCT b.vec_id AS dup
         |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${V.icosNSql("a.q", "b.q", "a.nrm", "b.nrm")} >= 350000)
         |SELECT cell, count(*) AS n_vectors,
         |  CAST(sum(CASE WHEN dup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM assign LEFT JOIN dups ON assign.vec_id = dups.dup
         |GROUP BY cell""".stripMargin
    }) { (s, d) =>
      val sg = Tables.embeddings(s, d)
        .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
        .select(col("vec_id"), col("q"), V.qNorm(col("q")).as("nrm"))
      val cent = sg.filter(col("vec_id") < 16).toDF("c_id", "cq", "cn")
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
        .orderBy(V.icosN(col("q"), col("cq"), col("nrm"), col("cn")).desc, col("c_id"))
      val assign = sg.crossJoin(broadcast(cent))
        .withColumn("rc", row_number().over(wc))
        .filter(col("rc") === 1)
        .select(col("vec_id"), col("q"), col("nrm"), col("c_id").as("cell"))
      val a = assign.toDF("v1", "qa", "na", "cell")
      val b = assign.toDF("v2", "qb", "nb", "cell2")
      val dups = a.join(b, col("cell") === col("cell2") && col("v1") < col("v2"))
        .filter(V.icosN(col("qa"), col("qb"), col("na"), col("nb")) >= 350000)
        .select(col("v2").as("dup")).distinct()
      assign.join(dups, col("vec_id") === col("dup"), "left_outer")
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
    },

    // Fuzzy near-dup by edit distance: blocked (12-char prefix +
    // length bucket) so levenshtein — O(l²) per pair — runs only on
    // candidate pairs, never all-pairs. Both engines ship the same
    // character-level levenshtein built-in, so distances (and the
    // hash) agree exactly. At 100 TB the block key join is an equi
    // shuffle; block granularity tunes candidate volume.
    sql("dedup_editdist",
      """WITH d AS (SELECT doc_id, substr(text, 1, 60) AS head,
        |                  substr(text, 1, 12) AS blk, n_chars // 50 AS lb
        |           FROM documents)
        |SELECT a.doc_id AS d1, c.doc_id AS d2,
        |       CAST(levenshtein(a.head, c.head) AS BIGINT) AS dist
        |FROM d a JOIN d c ON a.blk = c.blk AND a.lb = c.lb AND a.doc_id < c.doc_id
        |WHERE levenshtein(a.head, c.head) <= 5
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        substring(col("text"), 1, 60).as("head"),
        substring(col("text"), 1, 12).as("blk"),
        expr("n_chars div 50").as("lb"))
      val a = docs.toDF("d1", "h1", "blk", "lb")
      val b = docs.toDF("d2", "h2", "blk2", "lb2")
      a.join(b, col("blk") === col("blk2") && col("lb") === col("lb2") &&
          col("d1") < col("d2"))
        .withColumn("dist", levenshtein(col("h1"), col("h2")).cast("long"))
        .filter(col("dist") <= 5)
        .select(col("d1"), col("d2"), col("dist"))
    },

    // ---- exact SUBSTRING dedup (Lee et al. 2021, arXiv:2107.06499) ----
    // "Deduplicating Training Data Makes Language Models Better" finds
    // verbatim token runs shared across documents with a suffix array.
    // The suffix array is a single-machine structure; the
    // Spark-scalable re-expression is fixed-K gram matching: any
    // duplicated run of >= K tokens shares ALL of its K-grams, so
    // positional K-gram hashes that occur in >= 2 distinct docs mark
    // exactly the duplicated regions (runs shorter than K are below
    // the dedup threshold by construction). Adjacent duplicated
    // positions then merge into maximal spans with the
    // gaps-and-islands trick (p - row_number is constant within a
    // consecutive run). Per doc we report span count, duplicated gram
    // count, and the summed token extent of the spans (overlapping
    // extents of nearby spans are counted per-span — identical
    // arithmetic in both engines).
    // Scale shape: one hash-aggregate over grams (map-side
    // combinable), one semi equi-join back on the gram key, one
    // per-doc window — never all-pairs, and the gram relation is
    // ~tokens-per-corpus rows, the same cardinality every shingle
    // pass here already handles.
    // C4-style SPAN-LEVEL dedup as a REWRITE (Raffel et al. 2020 §2.2
    // "three-sentence span" dedup; RefinedWeb line dedup): the corpus
    // keeps every document but each globally-duplicated span survives
    // only at its FIRST occurrence — unlike the doc-level rows above,
    // the output is the cleaned text itself. Tokens group into
    // DISJOINT 5-token blocks (disjoint granularity makes the rewrite
    // exact and order-preserving: kept blocks re-join by position);
    // first occurrence = min (doc_id, block_idx), a deterministic
    // total order. Scale shape: one block-keyed hash agg (map-side
    // combined), one block-keyed join back, one per-doc agg — work is
    // linear in tokens, never all-pairs, the same cardinality every
    // shingle pass here already handles.
    sql("dedup_span_rewrite",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |bl AS MATERIALIZED (
        |  SELECT doc_id, u.i - 1 AS idx,
        |    array_to_string(list_slice(t, (u.i-1)*5 + 1, (u.i-1)*5 + 5), ' ') AS blk
        |  FROM toks, unnest(range(1, (len(t) + 4) // 5 + 1)) u(i)
        |  WHERE len(t) > 0),
        |fo AS MATERIALIZED (SELECT blk, min(doc_id) AS fd FROM bl GROUP BY blk),
        |fo2 AS MATERIALIZED (
        |  SELECT b.blk, f.fd, min(b.idx) AS fi
        |  FROM bl b JOIN fo f ON b.blk = f.blk AND b.doc_id = f.fd
        |  GROUP BY 1, 2)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(CASE WHEN b.doc_id = f.fd AND b.idx = f.fi THEN 1 ELSE 0 END)
        |    AS BIGINT) AS kept_blocks,
        |  coalesce(array_to_string(list_transform(
        |    list_sort(list(struct_pack(i := b.idx, b := b.blk))
        |      FILTER (WHERE b.doc_id = f.fd AND b.idx = f.fi)),
        |    x -> x.b), ' '), '') AS text_clean
        |FROM bl b JOIN fo2 f ON b.blk = f.blk
        |GROUP BY b.doc_id""".stripMargin) { (s, d) =>
      val k = 5
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val nb = floor((size(col("t")) + lit(k - 1)) / lit(k)).cast("int")
      val blocksCol = when(size(col("t")) > 0,
        transform(sequence(lit(1), nb),
          b => concat_ws(" ", slice(col("t"), (b - lit(1)) * k + 1, lit(k)))))
        .otherwise(array().cast("array<string>"))
      val bl = toks.select(col("doc_id"), posexplode(blocksCol).as(Seq("idx", "blk")))
      val fo = bl.groupBy("blk")
        .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
      val keep = struct(col("doc_id"), col("idx")) === col("first")
      bl.join(fo, Seq("blk"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(keep, 1L).otherwise(0L)).as("kept_blocks"),
          array_join(transform(
            array_sort(collect_list(when(keep,
              struct(col("idx").as("i"), col("blk").as("b"))))),
            x => x.getField("b")), " ").as("text_clean"))
    },

    sql("dedup_substring",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, u.i AS p,
        |    CAST(concat('0x', substring(md5(t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] || ' ' || t[u.i+3] || ' ' || t[u.i+4]), 1, 7)) AS BIGINT) AS g
        |  FROM toks, unnest(range(1, greatest(len(t)-3, 1))) u(i)),
        |dupg AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g) WHERE nd >= 2),
        |dp AS (SELECT doc_id, p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
        |       FROM grams WHERE g IN (SELECT g FROM dupg)),
        |spans AS (SELECT doc_id, isl, count(*) AS len FROM dp GROUP BY doc_id, isl)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(len) AS BIGINT) AS dup_grams,
        |  CAST(sum(len + 4) AS BIGINT) AS span_tokens
        |FROM spans GROUP BY doc_id""".stripMargin) { (s, d) =>
      val SK = 5 // gram width = minimum duplicated-run length detected
      // materialized once (r19, guide §1.2 "don't compute things
      // twice"): `grams` feeds BOTH the duplicated-gram aggregate and
      // the semi join's probe side — without the checkpoint each side
      // re-runs the tokenize+hash+explode pass over the raw text (the
      // two ~1.1 s twin jobs in the profile). The checkpointed rows
      // are three narrow integer columns — smaller than the text they
      // derive from, so materialize-once is also the 100 TB shape.
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), posexplode(positionalShingleHashes(col("t"), SK)))
        .toDF("doc_id", "p", "g")
        .localCheckpoint()
      val dupg = grams.groupBy("g")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select("g")
      val dp = grams.join(dupg, Seq("g"), "left_semi")
        .withColumn("isl",
          col("p") - row_number().over(Window.partitionBy("doc_id").orderBy("p")))
      dp.groupBy("doc_id", "isl").agg(count(lit(1)).as("len"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_spans"),
          sum("len").cast("long").as("dup_grams"),
          sum(col("len") + lit(SK - 1)).cast("long").as("span_tokens"))
    }
  )

}
