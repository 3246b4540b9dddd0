package graft.core

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Multi-database graph catalog (SURVEY.md §1.1 "multiple logical
  * databases per DBMS incl. `system`" — ref DatabaseIO.java:134-143,
  * TestBackupRestore.java:146,163 STOP/START DATABASE).
  *
  * Databases hold an immutable `PropertyGraph` snapshot swapped
  * atomically on mutation (append-log semantics, SURVEY §7.4.1); id
  * allocation is a deterministic per-db counter so t2 hashes are
  * stable across runs.
  */
/** See [[GraphDatabase.nodeDeltaState]]. `buf` is present when the
  * delta lives as a DRIVER-LOCAL write buffer (batched upserts whose
  * SET values are driver-evaluable): immutable, insertion-ordered —
  * transaction shadows share it safely by reference and extend it
  * copy-on-write. `delta` is then a LocalRelation over `buf`, so a
  * commit runs ZERO distributed jobs beyond the one matched-row
  * lookup. Distributed deltas (huge batches, cluster-computed SET
  * values) carry buf = None. */
/** `settled` caches merge keys whose BASE lookup is already answered
  * for this burst (base rows folded into `rows`, or proven absent) —
  * the base is immutable while the overlay is valid, so a settled key
  * never needs another base scan; a rerun whose keys are all settled
  * commits with ZERO Spark actions. The cache is only valid for the
  * (labels, keyNames) `shape` that built it. */
final case class NodeDeltaBuffer(
    colTypes: scala.collection.immutable.VectorMap[String, org.apache.spark.sql.types.DataType],
    rows: scala.collection.immutable.VectorMap[Long, Map[String, Any]],
    settled: Set[Seq[Any]] = Set.empty,
    shape: (Seq[String], Seq[String]) = (Nil, Nil))

/** See [[GraphDatabase.nodeDeltaState]]. `materialized` is false only
  * while the delta is a LAZY plan — the FIRST general-SET fold over a
  * base defers its checkpoint so a statement inside a rolled-back
  * transaction costs nothing; any extension, and compaction,
  * checkpoint the folded chain (plan depth stays bounded — the
  * doubling argument). Batched-upsert deltas are born materialized. */
final case class NodeDeltaState(
    base: org.apache.spark.sql.DataFrame,
    delta: org.apache.spark.sql.DataFrame,
    resolved: org.apache.spark.sql.DataFrame,
    buf: Option[NodeDeltaBuffer] = None,
    materialized: Boolean = true)

/** Driver-local write buffer for the edge delta — the relationship
  * mirror of [[NodeDeltaBuffer]], present when the delta lives as a
  * LocalRelation over `rows` (batched single-hop rel upserts whose
  * SET values are driver-evaluable). Immutable, insertion-ordered,
  * keyed by eid; transaction shadows share it by reference and
  * extend it copy-on-write.
  *
  * `settled` caches (relType, srcId, dstId) pairs whose BASE lookup
  * is already answered this burst (base rows folded into `rows` by an
  * ON MATCH, or proven absent) — the base is immutable while the
  * overlay is valid, so a settled pair never re-scans; a rerun whose
  * pairs are all settled commits with ZERO Spark actions.
  *
  * `nodeBind` caches endpoint-key → node-id bindings, valid only
  * while `graph.nodes eq nodeBindRef` (an interleaved node mutation
  * silently drops it — reference identity again, never a manual
  * invalidation). `None` records a key proven absent. */
final case class EdgeDeltaBuffer(
    colTypes: scala.collection.immutable.VectorMap[String, org.apache.spark.sql.types.DataType],
    rows: scala.collection.immutable.VectorMap[Long, Map[String, Any]],
    settled: Set[(String, Long, Long)] = Set.empty,
    nodeBind: Map[(Seq[String], Seq[String], Seq[Any]), Option[Long]] = Map.empty,
    nodeBindRef: Option[AnyRef] = None)

/** See [[GraphDatabase.edgeDeltaState]]. `materialized` as on
  * [[NodeDeltaState]]. */
final case class EdgeDeltaState(
    base: org.apache.spark.sql.DataFrame,
    delta: org.apache.spark.sql.DataFrame,
    resolved: org.apache.spark.sql.DataFrame,
    buf: Option[EdgeDeltaBuffer] = None,
    materialized: Boolean = true)

/** See [[GraphDatabase.indexAuxState]]. `nodeDiskDelta`/
  * `edgeDiskDelta` are the snapshot's on-disk delta-log frames that
  * were FOLDED into `nodesRef`/`edgesRef` at save/load time: a routed
  * lookup composes `projection ⟵overlay⟶ diskDelta` to reconstruct
  * exactly the folded frame's slice, since the projections themselves
  * are built from the pure base only. */
final case class IndexAuxState(
    nodesRef: AnyRef,
    edgesRef: AnyRef,
    dir: String,
    sealedIndexes: Map[String, (String, String, String)],
    nodeDiskDelta: Option[org.apache.spark.sql.DataFrame] = None,
    edgeDiskDelta: Option[org.apache.spark.sql.DataFrame] = None) {
  /** Memoized routed reads, keyed per projection/label — a
    * `spark.read.parquet` re-lists the file index on every call, and
    * at 100 TB a projection is tens of thousands of files: the listing
    * must be paid once per SAVE GENERATION (this state object), not
    * once per statement. The state is rebuilt by every save/load, so
    * staleness is impossible by construction. */
  private val reads =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  def cachedRead(key: String)(mk: => Option[org.apache.spark.sql.DataFrame])
      : Option[org.apache.spark.sql.DataFrame] =
    Option(reads.get(key)).orElse {
      val v = mk; v.foreach(reads.put(key, _)); v
    }

  /** Driver-side memo of COLLECTED metadata-scale tables (the IVF
    * centroid table: one row per coarse cell, ≤ a few hundred rows by
    * construction). The r19 probe cached the DataFrame but still ran a
    * collect() JOB per probe statement — 24 scheduler round-trips in
    * the recall row for rows that cannot change within a save
    * generation (this state object is rebuilt by every save/load, so
    * staleness is impossible by construction — same lifecycle argument
    * as [[reads]]). Index METADATA only; never query results. */
  private val collected =
    new java.util.concurrent.ConcurrentHashMap[String, Array[org.apache.spark.sql.Row]]()
  def cachedCollect(key: String)(mk: => Option[org.apache.spark.sql.DataFrame])
      : Option[Array[org.apache.spark.sql.Row]] =
    Option(collected.get(key)).orElse {
      cachedRead(key)(mk).map { df =>
        val rows = df.collect(); collected.put(key, rows); rows
      }
    }

  /** The IVF assignment count the snapshot's cells were WRITTEN with
    * (ADVICE r19): read from `<indexAuxDir>/ivf_meta.json`, memoized
    * per dir. Legacy snapshots without the file report Int.MaxValue so
    * the probe's dedup-as-filter gate (exact only for ≤ 2 assignments)
    * fails safe into the bounded top-(k·assign)+dedup tail. */
  private val ivfAssigns =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
  def ivfAssignOf(indexAuxDir: String): Int =
    ivfAssigns.computeIfAbsent(indexAuxDir, d => {
      try {
        val p = java.nio.file.Paths.get(s"$d/ivf_meta.json")
        if (java.nio.file.Files.exists(p))
          "\"assign\"\\s*:\\s*(\\d+)".r
            .findFirstMatchIn(java.nio.file.Files.readString(p))
            .map(m => Integer.valueOf(m.group(1).toInt))
            .getOrElse(Integer.valueOf(Int.MaxValue))
        else Integer.valueOf(Int.MaxValue)
      } catch { case _: Throwable => Integer.valueOf(Int.MaxValue) }
    }).intValue
}

final class GraphDatabase(val name: String) {
  @volatile var graph: PropertyGraph = _
  @volatile var stopped: Boolean = false
  val nextId = new AtomicLong(0L)
  val nextRelId = new AtomicLong(0L)
  /** Mutating statements applied since the graph lineage last
    * materialized — reads compact the plan-on-plan chain once it
    * grows (GraftSession.compactIfNeeded). The mat* references mark
    * the component DataFrames considered already-materialized (the
    * externally-set base, a loaded snapshot, or the last checkpoint):
    * compaction checkpoints only a component whose reference moved,
    * so edge-only write bursts never re-materialize the node side. */
  @volatile var pendingMutations: Int = 0
  @volatile var matNodes: org.apache.spark.sql.DataFrame = _
  @volatile var matEdges: org.apache.spark.sql.DataFrame = _

  /** Node DELTA overlay (mutation log): when set, and `graph.nodes eq
    * resolved` still holds, the node side is exactly
    * `base ⟵anti-join⟶ delta ∪ delta` — `delta` carries one full
    * REPLACEMENT row per touched/created node id, so a batched-upsert
    * commit costs O(batch), never O(table): compaction checkpoints
    * only the delta and snapshot writes fold it into the base. The
    * reference analog is its transaction log under /data/transactions
    * (docker-entrypoint.sh:521-532) replayed against the store.
    *
    * SELF-VALIDATING by reference identity: any code path that
    * assigns `graph` without maintaining the overlay silently breaks
    * the `graph.nodes eq resolved` check and the state is ignored —
    * correctness never depends on remembering to invalidate. */
  @volatile var nodeDeltaState: Option[NodeDeltaState] = None
  def validNodeDelta: Option[NodeDeltaState] =
    nodeDeltaState.filter(s => graph != null && (graph.nodes eq s.resolved))

  /** Edge DELTA overlay — the eid-keyed mirror of [[nodeDeltaState]]:
    * when set, and `graph.edges eq resolved` still holds, the edge
    * side is exactly `base ⟵anti-join(eid)⟶ delta ∪ delta`, one full
    * REPLACEMENT row per touched/created relationship eid. A
    * relationship MERGE ON MATCH or batched edge append then commits
    * O(batch + delta), never O(edge table). Same self-validation by
    * reference identity as the node side: any path that assigns
    * `graph` without maintaining this overlay silently invalidates it. */
  @volatile var edgeDeltaState: Option[EdgeDeltaState] = None
  def validEdgeDelta: Option[EdgeDeltaState] =
    edgeDeltaState.filter(s => graph != null && (graph.edges eq s.resolved))

  /** Where the materialized base came from on disk: (snapshot dir, the
    * manifest as loaded/written). An incremental save may skip
    * rewriting the base ONLY while the target dir's manifest still
    * equals this one — anyone else touching the snapshot invalidates
    * the shortcut, never correctness. */
  @volatile var snapshotProvenance: Option[(String, SnapshotStore.Manifest)] = None

  /** Index auxiliary projections on disk: the node AND edge frames
    * the `index_aux/<name>/` dirs under `dir` are EXACT for (reference
    * identity per side — the house self-validation pattern; a node
    * mutation re-points only `graph.nodes`, so edge-side projections
    * stay valid through it and vice versa), that snapshot dir, and the
    * index schema SEALED at save time (name → (label, prop, kind)).
    * Set on full save / load. A lookup must check the LIVE index entry
    * still equals the sealed one: DROP + re-CREATE under the same name
    * with a different (label, prop) re-points no frame, and without
    * the seal it would route through the old projection and silently
    * return wrong rows. */
  @volatile var indexAuxState: Option[IndexAuxState] = None

  /** Graph-cardinality statistics (join-ordering cost model): the
    * stats sealed by the snapshot the session last saved/loaded, valid
    * for exactly the (nodes, edges) frames recorded here — reference
    * identity, the house self-validation pattern. A live delta overlay
    * whose base IS one of these frames composes on top
    * (GraftSession.statsFor); any other re-point silently disables
    * ordering rather than mis-estimating against foreign frames. */
  @volatile var graphStats: Option[(AnyRef, AnyRef, GraphStats)] = None

  /** One-slot memo for the delta-overlaid stats: keyed by the RESOLVED
    * frames (immutable per mutation state), so the small delta-count
    * jobs run once per state, not once per statement. */
  @volatile var statsMemo: Option[(AnyRef, AnyRef, GraphStats)] = None

  /** Frame re-points served from a stale statsMemo since the last live
    * computation (never-saved graphs only — sealed-stats overlays are
    * O(delta) and recompute per state). Bounded by
    * GraftSession.MaxStatsDrift. */
  @volatile var statsDrift: Int = 0

  /** Hard off-switch for FULLY TEXTUAL compilation (bench/test control
    * runs) — broader than just the cost model since r19: it disables
    * stats computation AND the stats-free plan transforms (rank-gap
    * path orientation, comma reordering of MATCH patterns, and
    * broadcast-probe hints — CypherCompiler.textualOrder), so the
    * session plans patterns exactly as written. With r19's lazy live
    * stats, clearing graphStats alone no longer yields a textual-plan
    * session — statsFor would just compute fresh counts.
    * `-Dgraft.statsOff=true` flips the default for whole-JVM control
    * experiments (TimeOne A/B). */
  @volatile var statsOff: Boolean = java.lang.Boolean.getBoolean("graft.statsOff")

  /** CDC change epoch: a MONOTONIC counter identifying the base-frame
    * generation the delta-log is relative to. `cdcBaseRefs` tracks the
    * base frames (by reference identity — the house self-validation
    * pattern) the current epoch was minted against: any re-point of a
    * base the epoch didn't account for bumps the counter lazily at the
    * next CDC touch (GraftSession.cdcEpoch). Collision-free where the
    * old 32-bit identity hashes were not (ADVICE r13), and explicitly
    * carried across an incremental save (whose on-disk delta still
    * holds everything an outstanding cursor hasn't consumed) while
    * full writes / compactions / loads bump it. Persisted in the
    * snapshot manifest so monotonicity survives restarts. */
  @volatile var changeEpoch: Long = 0L
  @volatile var cdcBaseRefs: Option[(AnyRef, AnyRef)] = None

  /** Id-allocator watermarks (nextId, nextRelId) captured when the
    * current change epoch began — db.cdc.earliest mints its cursor at
    * these so a full epoch replay classifies entities created DURING
    * the epoch as `c`, not `u`. None (pre-tracking epochs) reads as
    * the current watermarks: conservative `u` classification, never a
    * dropped event. */
  @volatile var epochStartIds: Option[(Long, Long)] = None

  /** Schema metadata, name → (label, property). Uniqueness
    * constraints are ENFORCED on write (GraftSession); plain indexes
    * are metadata-only — Spark's analog of a secondary index is
    * storage layout (partition/bucket/sort keys), not a runtime
    * structure, so CREATE INDEX records intent and SHOW INDEXES
    * reports it. VECTOR/FULLTEXT indexes additionally back the
    * `db.index.{vector,fulltext}.queryNodes` procedures (the scan +
    * score IS the runtime structure). Indexes carry a third element:
    * the kind (RANGE | TEXT | POINT | VECTOR | FULLTEXT).
    * Transaction shadows never carry entries: enforcement always
    * reads the REAL database's map. */
  val constraints = TrieMap.empty[String, (String, String, String)]
  val indexes = TrieMap.empty[String, (String, String, String)]

  /** DataFrames persisted by mutations whose cached RDDs the current
    * graph lineage still references (e.g. the numbered binding table
    * of MATCH…CREATE). They stay pinned only until the lineage next
    * collapses to a durable snapshot — releasePinned() then frees the
    * executor storage, so mutation-heavy sessions don't grow cache
    * without bound. */
  private val pinned = collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]

  def pin(df: org.apache.spark.sql.DataFrame): Unit =
    pinned.synchronized { pinned += df }

  def releasePinned(): Unit = pinned.synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }

  /** CDC before-image anchors: cursor commit-sequence → (change epoch,
    * the RESOLVED graph at mint). A `db.cdc.query(cursor,
    * withBefore=true)` reads each touched key's before-image straight
    * off the anchored immutable frame — the TRUE at-cursor state, even
    * for keys the latest-wins delta-log has since overwritten. Safe
    * across releasePinned: pinned frames are `.persist()` caches with
    * their (deterministic, checkpoint-rooted) lineage intact, so an
    * anchored frame recomputes rather than dangles. Bounded (≤ 64,
    * oldest evicted); an un-anchored or evicted cursor degrades to
    * the delta-log reconstruction, never an error. */
  val cdcAnchors = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, (Long, PropertyGraph)]()

  def anchorCdc(seq: Long, epoch: Long, g: PropertyGraph): Unit = {
    cdcAnchors.put(seq, (epoch, g))
    while (cdcAnchors.size > 64) {
      val it = cdcAnchors.keySet().iterator()
      var lowest = Long.MaxValue
      while (it.hasNext) lowest = math.min(lowest, it.next())
      cdcAnchors.remove(lowest)
    }
  }

  /** Transfer `other`'s pinned caches to this database WITHOUT
    * unpersisting them — a committing transaction's shadow hands the
    * published lineage's cached frames to the real database, which
    * frees them at its own next lineage collapse. */
  def adoptPinnedFrom(other: GraphDatabase): Unit = {
    val moved = other.pinned.synchronized {
      val s = other.pinned.toList; other.pinned.clear(); s
    }
    pinned.synchronized { pinned ++= moved }
  }

  /** Reserve `n` consecutive ids; returns the first. Long-typed
    * end-to-end — a MATCH over 2³¹+ rows must not truncate the
    * reservation (id collisions would silently corrupt the graph). */
  def allocate(n: Long): Long = nextId.getAndAdd(n)

  /** Relationship ids live in their OWN id space (the reference keeps
    * separate node/relationship id stores): minting an edge never
    * perturbs node numbering, so node ids stay deterministic
    * regardless of how many relationships a statement creates. */
  def allocateRel(n: Long): Long = nextRelId.getAndAdd(n)
  def requireStarted(): Unit =
    if (stopped) throw new IllegalStateException(
      s"database $name is stopped; START DATABASE $name first")
}

final class GraphCatalog(spark: SparkSession) {
  private val dbs = TrieMap.empty[String, GraphDatabase]
  createDatabase("neo4j")
  createDatabase("system")

  def createDatabase(name: String): GraphDatabase = {
    val db = new GraphDatabase(name)
    db.graph = PropertyGraph.empty(spark)
    dbs.putIfAbsent(name, db).getOrElse(db)
  }

  def database(name: String): GraphDatabase =
    dbs.getOrElse(name, throw new NoSuchElementException(s"no such database: $name"))

  def listDatabases: Seq[String] = dbs.keys.toSeq.sorted

  def stop(name: String): Unit  = database(name).stopped = true
  def start(name: String): Unit = database(name).stopped = false
  def drop(name: String): Unit  = dbs.remove(name)
}
