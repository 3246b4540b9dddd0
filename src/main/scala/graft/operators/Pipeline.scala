package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.functions.TextFunctions._

/** Training-data pipeline preparation operators over `documents` /
  * `orders`: deterministic dataset splits, stratified sampling,
  * context-window chunking, repetition (Gopher-style) scoring,
  * benchmark-contamination checks, boilerplate stripping, and exact
  * discrete quantiles.
  *
  * Determinism rules (shared with the rest of the catalog): every
  * compared ratio is integer ppm via BIGINT `div` (`//` in DuckDB,
  * identical truncation); dataset assignment uses a Knuth
  * multiplicative hash over `doc_id` — pure BIGINT arithmetic, so the
  * same doc lands in the same split on any engine, any partitioning,
  * any cluster size. No doubles at any compared column except the
  * cents quantization `floor(x*100 + 0.5)`, which is IEEE-exact on
  * both engines.
  *
  * Scale shapes (the point of each op at 100 TB):
  *  - hash split / stratified sample: narrow map + one hash agg or one
  *    per-stratum window — no data movement proportional to splits.
  *  - chunking: explode is linear in output chunks; no shuffle at all
  *    (chunk ids derive from in-row arithmetic, not a global order).
  *  - repetition: per-doc bigram counting rides ONE shuffle keyed by
  *    (doc, bigram) then folds to per-doc — never a cross-doc join.
  *  - contamination: the benchmark side is tiny by construction →
  *    broadcast join against the corpus shingle stream.
  *  - boilerplate: the global top-k token list is k rows → broadcast
  *    anti-membership, corpus side stays narrow.
  */
object Pipeline {

  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  /** Knuth multiplicative hash bucket of doc_id, BIGINT on both sides. */
  private val hkSql = "(doc_id * 2654435761) % 4294967296"
  private def hkCol = (col("doc_id") * lit(2654435761L)) % lit(4294967296L)

  def all: Seq[QueryDef] = Seq(

    // deterministic train/val/test split: 80/10/10 by hashed doc_id.
    // The assignment is a pure per-row function — at 100 TB the split
    // is a free narrow map; only the audit aggregation shuffles.
    sql("sample_hash_split",
      s"""WITH h AS (
         |  SELECT doc_id, text, $hkSql % 100 AS b FROM documents)
         |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM h GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("b", hkCol % 100)
        .withColumn("split",
          when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("total_tokens"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    },

    // stratified sample: 10 docs per language, ranked by the same
    // doc-id hash (uniform within each stratum, reproducible across
    // runs/engines). One window shuffle keyed by the stratum.
    sql("sample_stratified",
      s"""WITH r AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY $hkSql, doc_id) AS rn
         |  FROM documents)
         |SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 10""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("rn", row_number()
          .over(Window.partitionBy("lang").orderBy(hkCol, col("doc_id"))).cast("long"))
        .filter(col("rn") <= 10)
        .select("lang", "doc_id", "rn")
    },

    // context-window chunking: 20-token windows, stride 15 (5-token
    // overlap) — the LLM-pretraining document→sample step. Chunk ids
    // are in-row arithmetic over token offsets: NO global order, no
    // shuffle, embarrassingly parallel at any corpus size.
    sql("text_chunking",
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS t FROM documents WHERE doc_id < 300),
         |c AS (
         |  SELECT doc_id, u.s AS s, t[u.s:least(u.s+19, len(t))] AS ch
         |  FROM t, unnest(range(1, len(t)+1, 15)) u(s))
         |SELECT doc_id, (s - 1) // 15 AS chunk_id,
         |  CAST(len(ch) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(ch, ' ')) AS fp
         |FROM c""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      t.select(col("doc_id"), col("t"),
          explode(sequence(lit(1), size(col("t")), lit(15))).as("s"))
        .select(col("doc_id"),
          ((col("s") - 1).cast("long") / 15).cast("long").as("chunk_id"),
          size(slice(col("t"), col("s"), lit(20))).cast("long").as("n_tokens"),
          md5(concat_ws(" ", slice(col("t"), col("s"), lit(20)))).as("fp"))
    },

    // repetition scoring (Gopher-rule family): duplicate-token ppm and
    // most-frequent-bigram ppm per doc. Bigram counting is one shuffle
    // keyed (doc, bigram) with map-side combine, folded to per-doc —
    // the cost is linear in tokens, never quadratic.
    sql("text_repetition",
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS t FROM documents WHERE doc_id < 300),
         |base AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS total,
         |         CAST(len(list_distinct(t)) AS BIGINT) AS dst, t FROM t),
         |bg AS (
         |  SELECT doc_id, t[u.i] || ' ' || t[u.i+1] AS b
         |  FROM t, unnest(range(1, len(t))) u(i)),
         |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         |agg AS (SELECT doc_id, max(c) AS topc, CAST(sum(c) AS BIGINT) AS nbg
         |        FROM bgc GROUP BY 1)
         |SELECT base.doc_id, total AS n_tokens,
         |  ((total - dst) * 1000000) // total AS dup_token_ppm,
         |  (CAST(topc AS BIGINT) * 1000000) // nbg AS top_bigram_ppm
         |FROM base JOIN agg ON base.doc_id = agg.doc_id""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val base = t.select(col("doc_id"), size(col("t")).cast("long").as("total"),
        size(array_distinct(col("t"))).cast("long").as("dst"), col("t"))
      val bg = base.select(col("doc_id"), col("total"), col("dst"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))).as("b"))
      bg.groupBy("doc_id", "total", "dst", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "total", "dst")
        .agg(max("c").as("topc"), sum("c").as("nbg"))
        .select(col("doc_id"), col("total").as("n_tokens"),
          intDiv((col("total") - col("dst")) * 1000000L, col("total")).as("dup_token_ppm"),
          intDiv(col("topc") * 1000000L, col("nbg")).as("top_bigram_ppm"))
    },

    // benchmark contamination: corpus docs sharing any word-4-gram
    // with the held-out "benchmark" set (doc_id % 97 == 0 here). The
    // benchmark shingle set is tiny by construction → broadcast join;
    // the corpus side streams through once. This is the standard
    // eval-decontamination pass before pretraining.
    sql("text_contamination",
      s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh0 AS (SELECT doc_id,
         |  (SELECT list(DISTINCT t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] || ' ' || t[u.i+3])
         |   FROM unnest(CASE WHEN len(t) >= 4 THEN range(1, len(t)-2) ELSE [] END) u(i)) AS sh
         |  FROM t),
         |ex AS (SELECT doc_id, u.x AS s FROM sh0, unnest(sh) u(x)),
         |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, s FROM ex WHERE doc_id % 97 <> 0)
         |SELECT corpus.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM corpus JOIN bench ON corpus.s = bench.s
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val ex = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(shinglesOfTokens(col("t"), 4)).as("s"))
      val bench = ex.filter(col("doc_id") % 97 === 0).select("s").distinct()
      ex.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "s")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    },

    // boilerplate stripping: drop the global top-10 most frequent
    // tokens (ties broken by token) and report retained counts. The
    // top-k list is k rows however big the corpus is → broadcast
    // anti-membership against the exploded token stream.
    sql("text_boilerplate",
      s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
         |ex AS (SELECT doc_id, u.x AS tok FROM t, unnest(t) u(x)),
         |top10 AS (SELECT tok FROM (
         |  SELECT tok, count(*) AS n FROM ex GROUP BY 1
         |  ORDER BY n DESC, tok LIMIT 10)),
         |per AS (
         |  SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS total,
         |    CAST(sum(CASE WHEN top10.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept
         |  FROM ex LEFT JOIN top10 ON ex.tok = top10.tok
         |  GROUP BY 1)
         |SELECT doc_id, total AS n_tokens, kept AS kept_tokens,
         |  ((total - kept) * 1000000) // total AS boilerplate_ppm
         |FROM per WHERE doc_id < 200""".stripMargin) { (s, d) =>
      val ex = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(col("t")).as("tok"))
      val top10 = ex.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(10)
        .select(col("tok"), lit(1).as("_b"))
      ex.join(broadcast(top10), Seq("tok"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total"),
          sum(when(col("_b").isNull, 1L).otherwise(0L)).as("kept"))
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), col("total").as("n_tokens"), col("kept").as("kept_tokens"),
          intDiv((col("total") - col("kept")) * 1000000L, col("total")).as("boilerplate_ppm"))
    },

    // exact discrete quantiles (p50/p90 of order value in cents) per
    // priority class: value at rank floor((n-1)*p)+1 of the sorted
    // partition — engine-independent (no interpolated doubles), and
    // the rank pick rides the same single window shuffle as the count.
    sql("agg_quantile_disc",
      """WITH v AS (
        |  SELECT o_orderpriority AS pri,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT pri, cents,
        |    row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY pri) AS n
        |  FROM v)
        |SELECT pri,
        |  max(CASE WHEN rn = (n-1)//2 + 1 THEN cents END) AS p50_cents,
        |  max(CASE WHEN rn = ((n-1)*9)//10 + 1 THEN cents END) AS p90_cents,
        |  CAST(max(n) AS BIGINT) AS n_orders
        |FROM r GROUP BY pri""".stripMargin) { (s, d) =>
      val v = Tables.orders(s, d).select(col("o_orderpriority").as("pri"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val part = Window.partitionBy("pri")
      val r = v
        .withColumn("rn", row_number().over(part.orderBy("cents")).cast("long"))
        .withColumn("n", count(lit(1)).over(part))
      r.groupBy("pri").agg(
        max(when(col("rn") === intDiv(col("n") - 1, lit(2L)) + 1, col("cents"))).as("p50_cents"),
        max(when(col("rn") === intDiv((col("n") - 1) * 9, lit(10L)) + 1, col("cents"))).as("p90_cents"),
        max("n").as("n_orders"))
    },

    // corpus mixture sampling (data mixing): per-language keep rates —
    // high-resource languages downsampled, the mixture-weighting step
    // every pretraining data pipeline runs. The keep decision is the
    // same deterministic doc-id hash as the splits (reproducible,
    // engine-independent, a free narrow map at any scale); only the
    // audit aggregation shuffles.
    sql("sample_weighted",
      s"""WITH rated AS (
         |  SELECT lang, text, $hkSql % 1000000 AS h,
         |    CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 500000
         |              WHEN 'es' THEN 500000 WHEN 'fr' THEN 250000
         |              ELSE 100000 END AS rate
         |  FROM documents)
         |SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN h < rate THEN len($toksSql) ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM rated GROUP BY lang""".stripMargin) { (s, d) =>
      val rate = when(col("lang") === "en", 900000L)
        .when(col("lang") === "de", 500000L)
        .when(col("lang") === "es", 500000L)
        .when(col("lang") === "fr", 250000L)
        .otherwise(100000L)
      Tables.documents(s, d)
        .withColumn("h", hkCol % 1000000L)
        .withColumn("keep", col("h") < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), tokenCount(col("text"))).otherwise(0L)).as("kept_tokens"))
    },

    // DSIR-flavored importance scoring (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // each raw document by how target-like its token distribution is.
    // DSIR proper uses log-ratios of hashed n-gram probabilities; the
    // graded variant is the integer-exact ratio-sum — per token w,
    // r(w) = floor(1e6 * count_target(w) / count_all(w)) (integer
    // division on both engines), doc score = Σ r(w) over its tokens —
    // so the hash gate holds with no float in either engine. Target
    // here = the English slice, raw = the whole corpus. Spark shape:
    // one explode + one token-keyed hash agg + a token-keyed feature
    // join + one per-doc agg. The ratio table is NOT broadcast: raw
    // whitespace tokens are an open vocabulary that grows with the
    // corpus (unlike DSIR proper, which hash-buckets n-grams into a
    // fixed-width feature space precisely so the model stays bounded —
    // the 100 TB route if a broadcastable table is wanted). The join
    // is shuffle-keyed on the token; AQE splits the Zipfian hot keys.
    // Exactness bound: the ppm ratio multiplies a Long count by 1e6,
    // exact below ~9.2e12 occurrences of a single token (DuckDB sums
    // in HUGEINT and would diverge past that) — far above any graded
    // scale, documented rather than guarded.
    sql("sample_importance",
      """WITH tk AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tk2 AS (SELECT doc_id, lang, w FROM tk WHERE w <> ''),
        |ratio AS (
        |  SELECT w,
        |    (sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000) // count(*) AS r
        |  FROM tk2 GROUP BY w)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(ratio.r) AS BIGINT) AS iscore
        |FROM tk2 t JOIN ratio ON ratio.w = t.w
        |GROUP BY t.doc_id""".stripMargin) { (s, d) =>
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val ratio = tk.groupBy("w")
        .agg(expr("(sum(if(lang = 'en', 1L, 0L)) * 1000000L) div count(*)").as("r"))
      tk.join(ratio, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("iscore"))
    },

    // sequence packing for a fixed context window (the concat-and-cut
    // step every pretraining pipeline runs before tokenizer sharding):
    // documents are laid on one deterministic global token stream —
    // ordered by (hash bucket, hash, doc_id) — and each doc's pack is
    // its start offset // budget. Docs whose token span crosses a
    // window boundary are counted as straddlers (they would be split).
    //
    // Scale shape: a single global window over 100 TB of docs is a
    // one-partition sort — the classic prefix-sum trap. Instead the
    // offset is a TWO-LEVEL prefix sum: a per-bucket exclusive cumsum
    // (window keyed by the 64-way hash bucket, fully parallel) plus a
    // bucket-offset table (64 rows — a broadcast join), which is how a
    // distributed scan/prefix-sum is actually built. The oracle
    // replays the identical order as ONE global cumsum, proving the
    // two-level decomposition exact.
    sql("pipeline_pack_sequences",
      s"""WITH t AS (
         |  SELECT doc_id, $hkSql AS hk,
         |    CAST(len($toksSql) AS BIGINT) AS tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, tok,
         |    CAST(COALESCE(SUM(tok) OVER (ORDER BY hk % 64, hk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
         |  FROM t)
         |SELECT start // 2048 AS pack_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tok) AS BIGINT) AS pack_tokens,
         |  CAST(sum(CASE WHEN tok > 0
         |                AND start // 2048 <> (start + tok - 1) // 2048
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
         |FROM c GROUP BY 1""".stripMargin) { (s, d) =>
      val budget = lit(2048L)
      val t = Tables.documents(s, d)
        .select(col("doc_id"), hkCol.as("hk"), tokenCount(col("text")).as("tok"))
        .withColumn("bucket", col("hk") % 64)
      // level 1: exclusive cumsum within each hash bucket (parallel)
      val local = t.withColumn("local_start",
        coalesce(sum("tok").over(Window.partitionBy("bucket")
          .orderBy("hk", "doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // level 2: 64-row bucket totals -> exclusive cumsum -> broadcast
      val offsets = t.groupBy("bucket").agg(sum("tok").as("btok"))
        .withColumn("bucket_off",
          coalesce(sum("btok").over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "bucket_off")
      local.join(broadcast(offsets), Seq("bucket"))
        .withColumn("start", col("bucket_off") + col("local_start"))
        .groupBy(intDiv(col("start"), budget).as("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum("tok").as("pack_tokens"),
          sum(when(col("tok") > 0 &&
            intDiv(col("start"), budget) =!= intDiv(col("start") + col("tok") - 1, budget),
            1L).otherwise(0L)).as("n_straddle"))
    },

    // Deterministic source interleaving — the training-order op: a
    // reproducible global read order that round-robins across the 20
    // sources so no training window sees one source's docs clumped
    // together. position = rn * S + source_index is a pure function
    // of (source, per-source rank), so the order is identical on any
    // engine and any partitioning — the "deterministic shuffle" every
    // reproducible training run needs. One per-source window shuffle
    // (partitioned by source, never a global sort); the top-k head is
    // what grades, with a total tiebreak.
    sql("pipeline_interleave",
      """WITH s AS (SELECT DISTINCT source FROM documents),
        |si AS (SELECT source,
        |         CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx,
        |         CAST((SELECT count(*) FROM s) AS BIGINT) AS n_src
        |       FROM s),
        |ranked AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) - 1 AS BIGINT) AS rn
        |  FROM documents d)
        |SELECT r.doc_id, r.source, r.rn * si.n_src + si.sidx AS position
        |FROM ranked r JOIN si USING (source)
        |ORDER BY position LIMIT 100""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // source index table: tiny (|sources| rows), broadcast — its
      // own window is over a dimension, not the corpus
      val si = docs.select("source").distinct()
        .withColumn("sidx", (row_number().over(Window.orderBy("source")) - 1).cast("long"))
      val nSrc = si.groupBy().agg(count(lit(1)).cast("long").as("n_src"))
      val ranked = docs.select(col("doc_id"), col("source"))
        .withColumn("rn", (row_number().over(
          Window.partitionBy("source").orderBy("doc_id")) - 1).cast("long"))
      ranked.join(broadcast(si), Seq("source"))
        .join(broadcast(nSrc))
        .select(col("doc_id"), col("source"),
          (col("rn") * col("n_src") + col("sidx")).as("position"))
        .orderBy("position").limit(100)
    },

    // Curriculum binning: quartile stages by document length, EXACT —
    // stage = floor(rank·4/n)+1 over the unique (n_chars, doc_id)
    // composite key. The rank is a two-level distributed prefix sum
    // (the pipeline_pack_sequences discipline): per-bucket window
    // rank + a 64-row broadcast cumsum of bucket counts — never a
    // single-partition global window over the corpus. The oracle uses
    // DuckDB's global row_number, which must agree because the key is
    // unique and both engines rank the same total order.
    sql("pipeline_curriculum",
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars * 1000000 + doc_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM documents)
        |SELECT CAST((rn - 1) * 4 // n + 1 AS BIGINT) AS stage,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          (col("n_chars") * 1000000L + col("doc_id")).as("key"))
      val stats = docs.agg(min("key").as("kmin"), max("key").as("kmax"),
        count(lit(1)).as("n"))
      val bucketed = docs.crossJoin(broadcast(stats))
        .withColumn("bucket",
          intDiv(col("key") - col("kmin"),
            intDiv(col("kmax") - col("kmin"), lit(64L)) + 1))
      val local = bucketed.withColumn("lrn",
        row_number().over(Window.partitionBy("bucket").orderBy("key")).cast("long"))
      val offsets = bucketed.groupBy("bucket")
        .agg(count(lit(1)).as("bn"))
        .withColumn("off",
          coalesce(sum("bn").over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "off")
      local.join(broadcast(offsets), Seq("bucket"))
        .withColumn("rank", col("off") + col("lrn"))
        .groupBy((intDiv((col("rank") - 1) * 4, col("n")) + 1).as("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
    }
  )
}
