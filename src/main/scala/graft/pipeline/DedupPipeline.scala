package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.functions.TextFunctions
import graft.operators._

/** The flagship near-duplicate pipeline (SURVEY.md §3.1 Spark lifecycle):
  *
  *   pages → extracted → signatures → candidates → decisions → labels →
  *   canonicals
  *
  * Each stage optionally checkpoints (parquet + per-partition lineage) so a
  * killed run resumes from the last complete stage — the north_rule's
  * resumability requirement. Stage boundaries are exactly the shuffles:
  * band/block self-joins, CC rounds, the final group-by.
  */
final class DedupPipeline(
    spark: SparkSession,
    cfg: GraftConfig = GraftConfig.default,
    workDir: Option[String] = None,
    // Extra checkpoint-identity component beyond the config hash — callers
    // that reuse one checkpoint dir across INPUT batches (RunDedup) fold an
    // input fingerprint in here, so a changed input invalidates the stages
    // instead of silently replaying the previous batch's checkpoints.
    ckptKeyExtra: String = ""
) {
  import spark.implicits._

  /** Full checkpoint identity: config hash, plus the caller's input key. */
  val checkpointKey: String =
    if (ckptKeyExtra.isEmpty) cfg.configHash else s"${cfg.configHash}-$ckptKeyExtra"

  private val ckpt = workDir.map(new Checkpoints(spark, _, checkpointKey))

  /** Without a checkpoint dir, every stage is persisted: each one feeds
    * multiple downstream branches (extracted ×3, signatures ×3, decisions
    * via settled/ambiguous unions, overlaps via the tier-2 join) and the
    * recompute blow-up is multiplicative. With a checkpoint dir the parquet
    * read-back plays this role. Stage DataFrames are also memoized per
    * pipeline instance so repeated calls share one persisted plan.
    */
  private val stageCache = scala.collection.mutable.HashMap.empty[String, DataFrame]

  // Memoization is keyed by stage NAME: one pipeline instance serves ONE
  // corpus. Remember each stage's input plans and fail fast if the stage is
  // re-invoked with a different input — the silent alternative returns
  // corpus A's cached stage for corpus B.
  private val stageInputs = scala.collection.mutable.HashMap
    .empty[String, Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]

  // synchronized (reentrant, so stages computing other stages in one
  // thread still work): two threads sharing one pipeline instance must not
  // race the mutable memo maps or compute one stage twice. The ONE coarse
  // monitor deliberately serializes even different-stage computes:
  // single-flight correctness over a parallelism no pipeline use case
  // needs (stages form one dependency chain; per-name single-flight
  // futures would buy nothing but complexity here)
  private def stage(name: String, inputs: DataFrame*)(compute: => DataFrame): DataFrame = stageCache.synchronized {
    val plans = inputs.map(_.queryExecution.analyzed)
    stageInputs.get(name) match {
      case Some(prev) =>
        require(prev.length == plans.length &&
          prev.lazyZip(plans).forall((a, b) => a.sameResult(b)),
          s"DedupPipeline stage '$name' was already computed for a different " +
            "input — stage results are memoized per instance; build a new " +
            "DedupPipeline for a new corpus")
      case None => stageInputs(name) = plans
    }
    stageCache.getOrElseUpdate(name, ckpt match {
      case Some(c) => c.stage(name)(compute)
      case None =>
        compute.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** Release persisted stage data (no-checkpoint mode). */
  def unpersistAll(): Unit = stageCache.synchronized {
    stageCache.values.foreach(_.unpersist(false))
    stageCache.clear()
  }

  /** Extraction: html bytes → normalized text (byte-identical per url). */
  def extracted(pages: DataFrame): DataFrame = stage("extracted", pages) {
    pages.select(
      col("url"),
      col("warc_ts"),
      col("lang"),
      TextFunctions.extractText(col("html")).as("extracted_text")
    )
  }

  /** Signature stage, projected to what downstream consumers read.
    * `extracted_text`/`warc_ts`/`lang` already live in the `extracted`
    * stage; persisting them again here would double the cached bytes and
    * the scan bandwidth of every consumer (candidate join, verify ×2,
    * vertex universe) — on one box memory bandwidth is the scaling ceiling.
    *
    * The 128-long minhash itself is NOT persisted: its only pipeline
    * consumers are the 16 LSH band keys (computed here, 128 B vs 1 KB per
    * doc). The shingle array IS persisted: it is a free byproduct of the
    * fused sketch (DocSignature computes it on the way to the minhash), and
    * measured at 1M docs re-deriving it at verify time costs more CPU than
    * the cache write saves in bandwidth — instead the verify JOIN prunes
    * its shuffle to candidate-pair nodes only ([[decisions]]), which is
    * where the corpus-wide shingle bytes actually moved. The full signature
    * remains available from [[MinHashLsh.signatures]] for the
    * carried-signature verification path at 10^12-doc scale.
    */
  def signatures(extractedDf: DataFrame): DataFrame = stage("signatures", extractedDf) {
    MinHashLsh.signatures(extractedDf, cfg)
      .select(col("url"), col("node"), col("shingles"),
        graft.functions.Hashing.bandKeys(col("minhash"), cfg.lsh.bands, cfg.lsh.rowsPerBand)
          .as("band_keys"),
        col("simhash"))
  }

  /** Candidate pairs from the fused MinHash-band + SimHash-block join,
    * deduped with tier priority lsh > simhash (a pair found by both keeps
    * 'lsh'). One self-join instead of two — the band join is THE dominant
    * shuffle at scale.
    */
  def candidates(sigs: DataFrame): DataFrame = stage("candidates", sigs) {
    // The exploded key frame feeds three subplans (hot-key agg, both
    // self-join sides). Round 1 cached it; round 2 re-derives it per
    // consumer instead: the explode's inputs (node, simhash, band_keys) are
    // a column-pruned ~150 B/doc slice of the already-persisted signatures
    // stage, while caching the exploded form costs ~800 B/doc to write plus
    // 3 × 800 B/doc to read — and on one box memory bandwidth, not CPU, is
    // the scaling ceiling (BENCH.md). The explode itself is cheap codegen.
    MinHashLsh.fusedCandidates(sigs, cfg)
  }

  /** Long-exact-overlap tier pairs (node_a, node_b, overlap_len). */
  def overlaps(extractedDf: DataFrame): DataFrame = stage("overlaps", extractedDf) {
    val texts = extractedDf
      .select(xxhash64(col("url")).as("node"), col("extracted_text"))
      .as[(Long, String)]
    val cands = SuffixOverlap.candidates(texts, cfg)
    SuffixOverlap.verify(cands, texts, cfg)
  }

  /** Decisions in two tiers. Tier-1 (Jaccard thresholds) is persisted as its
    * own stage: three branches read it (ambiguous pairs, the settled/ambiguous
    * split inside resolveAmbiguous) and each re-run would repeat the
    * shingle-array verify join — the most expensive per-pair work.
    *
    * Tier-2 runs the exact suffix-automaton LCS **only on the ambiguous
    * band**: `resolveAmbiguous` consults overlaps for ambiguous pairs alone,
    * so verifying anything else is wasted work — and at 10^12 docs a
    * corpus-wide fingerprint shuffle would dwarf the band join. Direct LCS on
    * the ambiguous pairs is also strictly more exact than the sampled
    * fingerprint candidate pass (no content-sampling misses); the standalone
    * [[overlaps]] stage keeps the distributed fingerprint path for corpus-wide
    * syndication scans (q21).
    */
  def decisions(cands: DataFrame, sigs: DataFrame, extractedDf: DataFrame): DataFrame = {
    val tier1 = stage("tier1_decisions", cands, sigs) {
      // Semi-join reduction on the verify join: the two node-equi-joins
      // would otherwise shuffle EVERY doc's shingle array (the widest
      // per-doc payload) even though only candidate-pair nodes can match —
      // the explicit form of the runtime semi-join reduction Spark doesn't
      // inject here ([[MinHashLsh.pruneToPairNodes]]).
      val shingleSide = MinHashLsh.pruneToPairNodes(
        sigs.select(col("node"), col("url"), col("shingles")), cands)
      Decisions.decide(MinHashLsh.verify(cands, shingleSide, cfg), cfg)
    }
    stage("decisions", cands, sigs, extractedDf) {
      val byNode = extractedDf.select(xxhash64(col("url")).as("node"), col("extracted_text"))
      val ambPairs = tier1.where(col("decision") === "ambiguous").select("node_a", "node_b")
      // NO tier-1-style semi-join reduction here, deliberately (measured:
      // adding one costs ~2x on q53). The ambiguous band is a small,
      // decision-filtered subset — broadcastable by construction — so the
      // planner broadcasts the PAIR side of both the LCS joins and the
      // text-hash joins, and the corpus text/hashes stream from the
      // extracted cache without ever shuffling. Tier-1 differs: its
      // candidate-pair frame outgrows the broadcast budget while its node
      // SET still fits, which is exactly when the reduction pays. If an
      // ambiguous band ever outgrew broadcast, the node-set broadcast
      // would not fit either — the right move at that scale is a
      // shuffled/bloom semi-join, not this one.
      val ambOverlaps = SuffixOverlap.verify(ambPairs, byNode.as[(Long, String)], cfg)
      Decisions.resolveAmbiguous(tier1, byNode, ambOverlaps, cfg)
    }
  }

  /** Cluster labels over the full vertex universe (singletons preserved,
    * graph_cluster.py:65-66).
    */
  def labels(sigs: DataFrame, decisionsDf: DataFrame): DataFrame = stage("labels", sigs, decisionsDf) {
    val vertices = sigs.select(col("node"))
    val edges = Decisions.matchEdges(decisionsDf)
    ConnectedComponents.labelsWithSingletons(vertices, edges)
  }

  /** Canonicals enriched with the cluster-quality columns: coherence flag
    * (C3), mean match confidence (G12, NULL for singletons), tier2_assisted
    * (G13 analog).
    */
  def canonicals(labelsDf: DataFrame, extractedDf: DataFrame,
      decisionsDf: Option[DataFrame] = None): DataFrame =
    stage("canonicals", (Seq(labelsDf, extractedDf) ++ decisionsDf.toSeq): _*) {
    // Narrow labels join: `__text_len` is projected BEFORE the join so the
    // extracted text column never crosses the node shuffle; the winner-text
    // fetch inside canonicals reads (url, extracted_text) straight off the
    // extracted cache — text bytes cross at most the ONE fetch join, never
    // the labels join or the per-cluster aggregation shuffle.
    val labeled = extractedDf
      .select(xxhash64(col("url")).as("node"), col("url"), col("warc_ts"), col("lang"),
        when(col("extracted_text").isNotNull && length(col("extracted_text")) > 0,
          length(col("extracted_text"))).as("__text_len"))
      .join(labelsDf, "node")
    val base = Synthesis.canonicals(labeled, cfg,
      texts = Some(extractedDf.select(col("url"), col("extracted_text"))))
    decisionsDf match {
      case None => base
      case Some(decs) =>
        // Fused cluster quality (r6): [[Synthesis.clusterQuality]] re-counted
        // the FULL labels frame per component and joined that back — but
        // `base` already carries source_count, which is the same
        // per-component member count (urls are the pipeline's unique key).
        // Only the match-edge aggregation actually needs its own join: a
        // frame bounded by the number of matched pairs (≪ corpus; empty for
        // all-singleton corpora), so the quality join's right side shrinks
        // from |clusters| rows to |matched components| — at 1M docs this
        // removed two 1M-row shuffles (labels re-count + base⋈quality) from
        // the canonicals stage (guide §2.4: share one aggregation instead of
        // re-deriving it). Semantics per clusterQuality: match rows ONLY
        // (overlap_match never creates a cluster edge), node_a side is exact
        // because match endpoints share a component.
        val matchAgg = decs
          .where(col("decision") === "match")
          .select(col("node_a").as("node"),
            col("exact_jaccard").as("match_weight"),
            (col("tier") =!= "jaccard").as("is_tier2"))
          .join(labelsDf.select(col("node"), col("component")), "node")
          .groupBy("component")
          .agg(
            avg(col("match_weight")).as("match_confidence"),
            bool_or(col("is_tier2")).as("tier2_assisted"))
        // coherence check (c) webtext analog: date spread = distinct warc_ts
        // days, computed inside the canonicals aggregation itself (the
        // labeled frame carries warc_ts — no second extracted scan/join).
        // OPT-IN (cfg.cluster.warcDateCriterion): recrawls of one page
        // across many days are normal in web dedup, so flagging on crawl-day
        // spread is a policy choice, not a default — mirroring the
        // reference, where check (c) applies only when event dates exist.
        val dateClause =
          if (cfg.cluster.warcDateCriterion)
            col("distinct_days") > cfg.cluster.maxDistinctDates
          else lit(false)
        val joined = base.join(matchAgg, Seq("component"), "left")
        // same output column ORDER as the pre-fusion plan:
        // base columns, flagged, match_confidence, tier2_assisted
        joined.select(base.columns.map(col) ++ Seq(
          (col("source_count") > cfg.cluster.maxClusterSize ||
            (col("match_confidence").isNotNull &&
              col("match_confidence") < cfg.cluster.minInternalSimilarity) ||
            dateClause).as("flagged"),
          col("match_confidence"),
          coalesce(col("tier2_assisted"), lit(false)).as("tier2_assisted")): _*)
    }
  }

  /** Run end-to-end; returns the canonicals DataFrame. */
  def run(pages: DataFrame): DataFrame = {
    val ext = extracted(pages)
    val sigs = signatures(ext)
    val cands = candidates(sigs)
    val decs = decisions(cands, sigs, ext)
    val lbls = labels(sigs, decs)
    canonicals(lbls, ext, Some(decs))
  }

  /** All intermediate stages, for tests/metrics. */
  def runAll(pages: DataFrame): DedupResult = {
    val ext = extracted(pages)
    val sigs = signatures(ext)
    val cands = candidates(sigs)
    val decs = decisions(cands, sigs, ext)
    val lbls = labels(sigs, decs)
    val canon = canonicals(lbls, ext, Some(decs))
    DedupResult(ext, sigs, cands, decs, lbls, canon)
  }
}

final case class DedupResult(
    extracted: DataFrame,
    signatures: DataFrame,
    candidates: DataFrame,
    decisions: DataFrame,
    labels: DataFrame,
    canonicals: DataFrame
)
