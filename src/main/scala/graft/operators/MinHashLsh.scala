package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.functions.Hashing

/** MinHash + LSH banding candidate generation and exact-Jaccard verification
  * (SURVEY.md §2.3 B7/B8, §2.4). The reference's analog is blocking-key
  * candidate generation + within-block pair enumeration
  * (`/root/reference/src/event_dedup/matching/candidate_pairs.py:31-64`):
  * explode keys → self-join on key with canonical ordering → dedup across
  * blocks. Ours swaps date/geo keys for MinHash band keys and verifies with
  * exact shingle Jaccard (the reference's scorer role, `matching/pipeline.py:123-153`).
  *
  * Scale posture:
  *  - the band self-join is THE skew-sensitive shuffle; over-dense buckets
  *    (boilerplate pages, hot hosts) are capped at `cfg.lsh.maxBucketSize`
  *    via a broadcast anti-join of hot keys (dropped buckets are observable
  *    in [[bucketStats]], never silent) — pair blowup is quadratic in bucket
  *    size, so one 10^6 bucket would otherwise emit 10^12 pairs;
  *  - AQE skew-join handles residual imbalance below the cap;
  *  - pair canonical ordering `node_a < node_b` halves the join output and
  *    `dropDuplicates` dedups across bands (candidate_pairs.py:59-64 semantics).
  */
object MinHashLsh {

  /** Per-doc signature stage: tokens → distinct shingle hashes → MinHash
    * signature + SimHash. One narrow projection, no shuffle.
    *
    * Input: (url, extracted_text, …); output adds
    * (node, n_tokens, shingles, minhash, simhash).
    * `node` is the 64-bit xxhash of the url — the CC node id. At 10^12 docs
    * 64-bit birthday collisions appear (~3%); production would widen to a
    * 128-bit id, the pipeline only needs ids orderable + hashable.
    */
  def signatures(extracted: DataFrame, cfg: GraftConfig, textCol: String = "extracted_text"): DataFrame = {
    // One fused byte-walk per document ([[graft.functions.DocSignature]])
    // instead of split×3 + four interpreted trees; exposed through
    // `inline(array(...))` so the struct is evaluated exactly ONCE per row
    // (four GetStructField projections would re-run the sketch 4×: projection
    // collapse inlines struct fields, and common-subexpression elimination
    // does not reach into CodegenFallback subtrees).
    val sig = Hashing.docSignature(col(textCol),
      cfg.lsh.shingleSize, cfg.lsh.numHashes, cfg.lsh.seed, cfg.simhash.seed)
    extracted
      .withColumn("node", xxhash64(col("url")))
      .select(col("*"), inline(array(sig)))
  }

  /** Exploded (node, band_key) table. Band keys are already salted with the
    * band index (see [[graft.functions.BandKeys]]), so a single-column join
    * suffices.
    */
  def bands(sigs: DataFrame, cfg: GraftConfig): DataFrame =
    sigs.where(col("minhash").isNotNull)
      .select(col("node"), explode(Hashing.bandKeys(col("minhash"), cfg.lsh.bands, cfg.lsh.rowsPerBand)).as("band_key"))

  /** Bucket-size distribution + how many buckets the cap drops — the
    * reference logs blocking reduction stats the same way
    * (candidate_pairs.py:66-76).
    */
  def bucketStats(bands: DataFrame, cfg: GraftConfig): DataFrame =
    bands.groupBy("band_key").count()
      .agg(
        count(lit(1)).as("buckets"),
        max("count").as("max_bucket"),
        sum(when(col("count") > cfg.lsh.maxBucketSize, 1).otherwise(0)).as("capped_buckets"),
        sum(when(col("count") > 1, col("count") * (col("count") - 1) / 2).otherwise(0)).as("candidate_pairs_upper")
      )

  /** Exact set of hot keys (bucket size > cap) computed WITHOUT the
    * corpus-wide (key, count) aggregation shuffle the naive
    * `groupBy(key).count()` pays (guide §2.4 — that exchange carries one row
    * per DISTINCT key, i.e. nearly the full exploded frame when band keys are
    * mostly unique, and in the self-join callers the whole count subtree was
    * even duplicated once per join side).
    *
    * Pass 1 (shuffle-free): count keys per partition and keep only keys that
    * clear the pigeonhole bound — a key with total count > cap spread over m
    * partitions must reach a local count ≥ ceil((cap+1)/m) in at least one
    * partition, so the survivor set is a superset of the true hot set. On
    * non-pathological corpora it is empty and detection costs one narrow
    * local pass over cached bytes. Per-task state is one (key → count) map
    * over the partition's distinct keys — bounded by partition row count,
    * the same order of memory the old hash aggregation used.
    *
    * Pass 2 (only when pass 1 finds survivors): exact-count just the
    * survivor keys behind a broadcast semi-join and apply the true `> cap`
    * filter — the aggregation output is |survivors|, not |distinct keys|.
    */
  private[operators] def hotKeyArray(rows: DataFrame, keyCol: String, cap: Int): Array[Long] = {
    val keys = rows.select(col(keyCol))
    require(keys.schema.head.dataType == org.apache.spark.sql.types.LongType,
      s"hot-key detection expects a LongType key, got ${keys.schema.head.dataType}")
    val rdd = keys.queryExecution.toRdd // InternalRow: no Row conversion
    val m = math.max(1, rdd.getNumPartitions)
    val thr = (cap.toLong + m) / m // ceil((cap+1)/m)
    val survivors = rdd.mapPartitions { it =>
      val counts = new java.util.HashMap[Long, Long]()
      while (it.hasNext) {
        val k = it.next().getLong(0)
        counts.put(k, counts.getOrDefault(k, 0L) + 1L)
      }
      import scala.jdk.CollectionConverters._
      counts.entrySet().iterator().asScala
        .filter(_.getValue >= thr).map(_.getKey.longValue())
    }.collect().distinct
    if (survivors.isEmpty) Array.empty[Long]
    else {
      val spark = rows.sparkSession
      import spark.implicits._
      keys.join(broadcast(survivors.toSeq.toDF(keyCol)), Seq(keyCol), "left_semi")
        .groupBy(keyCol).count()
        .where(col("count") > cap)
        .select(keyCol).collect().map(_.getLong(0))
    }
  }

  /** Drop every row whose `keyCol` bucket holds more than `cap` members —
    * the hot-bucket guard shared by the band join, the SimHash block join
    * and the embedding-LSH bucket join ([[graft.operators.Similarity
    * .nearDupPairs]]). Hot keys are few by construction (each one holds
    * > cap rows), so they broadcast. `cap == Int.MaxValue` skips the prune
    * entirely (exhaustive semantics, no counting shuffle); `cap < 1` would
    * silently drop every non-empty bucket, so it's rejected.
    *
    * r6: the hot set is detected eagerly via [[hotKeyArray]] (pigeonhole
    * local count, no corpus-wide count shuffle) and the anti-join is elided
    * outright when it is empty — the previous lazy `groupBy(key).count()`
    * subtree was planned once per self-join SIDE in every caller (two
    * Exchange + HashAggregate pairs per query, visible in the q18/q19
    * baseline plans).
    */
  private[operators] def pruneHotBuckets(rows: DataFrame, keyCol: String, cap: Int): DataFrame =
    if (cap == Int.MaxValue) rows
    else {
      require(cap >= 1, s"maxBucketSize must be >= 1, got $cap")
      val hot = hotKeyArray(rows, keyCol, cap)
      if (hot.isEmpty) rows
      else {
        val spark = rows.sparkSession
        import spark.implicits._
        // NOTE: the Seq-key anti-join moves keyCol first in the output —
        // callers must select columns by NAME afterwards, never by position
        rows.join(broadcast(hot.toSeq.toDF(keyCol)), Seq(keyCol), "left_anti")
      }
    }

  /** LSH candidate pairs: (node_a, node_b) with node_a < node_b, deduped
    * across bands, hot buckets dropped (observable via [[bucketStats]]).
    */
  def lshCandidates(sigs: DataFrame, cfg: GraftConfig): DataFrame = {
    val b = bands(sigs, cfg)
    val pruned = pruneHotBuckets(b, "band_key", cfg.lsh.maxBucketSize)
    val a = pruned.alias("a")
    val bb = pruned.alias("b")
    a.join(bb, col("a.band_key") === col("b.band_key") && col("a.node") < col("b.node"))
      .select(col("a.node").as("node_a"), col("b.node").as("node_b"))
      .dropDuplicates("node_a", "node_b")
  }

  /** SimHash Hamming-ball candidates (SURVEY.md §2.3 B9): join on pigeonhole
    * block keys, keep pairs with Hamming distance ≤ d. A second recall path
    * for near-dups whose shingle sets drifted below LSH sensitivity but whose
    * token distributions stayed close.
    */
  def simHashCandidates(sigs: DataFrame, cfg: GraftConfig): DataFrame = {
    val d = cfg.simhash.maxHammingDistance
    val blocks = sigs.where(col("simhash").isNotNull)
      .select(col("node"), col("simhash"), explode(Hashing.simHashBlocks(col("simhash"), d + 1)).as("block_key"))
    val pruned = pruneHotBuckets(blocks, "block_key", cfg.lsh.maxBucketSize)
    val a = pruned.alias("a")
    val b = pruned.alias("b")
    a.join(b, col("a.block_key") === col("b.block_key") && col("a.node") < col("b.node"))
      .where(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= d)
      .select(col("a.node").as("node_a"), col("b.node").as("node_b"))
      .dropDuplicates("node_a", "node_b")
  }

  /** Fused candidate generation: MinHash band keys AND SimHash block keys in
    * ONE exploded frame → one hot-key pass → one self-join → one dedup.
    * Same output as union(lshCandidates, simHashCandidates) with tier =
    * lexical min ('lsh' < 'simhash'), at roughly half the shuffles — on a
    * real cluster the band self-join is the dominant shuffle, so halving its
    * count matters more than any per-row cost.
    *
    * **Mega-bucket handling** (skew, north_rule): a bucket of m members
    * emits m(m-1)/2 pairs — one 10^6-member boilerplate bucket would emit
    * 5·10^11 pairs and kill the job. Buckets above `cfg.lsh.maxBucketSize`
    * switch to STAR candidates: every member pairs with the bucket minimum
    * (O(m) pairs). For the dominant mega-bucket cause — identical/near-
    * identical boilerplate — verification accepts the star edges and
    * connected components restores the full cluster transitively; genuinely
    * heterogeneous mega-buckets degrade recall gracefully instead of
    * exploding. Counts are observable via [[bucketStats]].
    */
  /** @param materialize optional persistence hook for the exploded key
    *   frame (consumed by the hot-key agg, both self-join sides, and the
    *   star branch when hot buckets exist). The pipeline deliberately passes
    *   identity: re-deriving the explode from the column-pruned signatures
    *   cache costs fewer memory BYTES than caching the exploded form
    *   (~150 B/doc × 3 reads vs ~800 B/doc write + 3 reads), and memory
    *   bandwidth — not CPU — is the observed scaling ceiling (BENCH.md).
    *   Callers whose upstream is not persisted (ad-hoc use on a raw scan)
    *   should still pass a cache here.
    */
  def fusedCandidates(sigs: DataFrame, cfg: GraftConfig,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    val d = cfg.simhash.maxHammingDistance
    // Accept either a precomputed `band_keys` column (the pipeline persists
    // those 16 longs instead of the 128-long minhash — 8x fewer cached
    // bytes on the stage every candidate/verify scan reads) or derive the
    // keys from `minhash` on the fly.
    val bandKeysCol =
      if (sigs.columns.contains("band_keys")) col("band_keys")
      else Hashing.bandKeys(col("minhash"), cfg.lsh.bands, cfg.lsh.rowsPerBand)
    // tier travels as one byte until the final projection: the exploded key
    // frame is the widest shuffle of the pipeline, and a 3-16 char UTF8
    // string per row is pure overhead there ('0' lsh < '1' simhash < '2'
    // star keeps the same min-wins dedup priority).
    val banded = sigs.withColumn("bk", bandKeysCol).where(col("bk").isNotNull)
      .select(col("node"), col("simhash"), explode(col("bk")).as("key"))
      .withColumn("tier", lit(0).cast("tinyint"))
    val blocked = sigs.where(col("simhash").isNotNull)
      .select(col("node"), col("simhash"),
        // salt block keys into a disjoint key space from band keys
        explode(Hashing.simHashBlocks(col("simhash"), d + 1)).as("raw_key"))
      .select(col("node"), col("simhash"), xxhash64(col("raw_key"), lit("simblock")).as("key"))
      .withColumn("tier", lit(1).cast("tinyint"))
    val keyed = materialize(banded.unionByName(blocked))
    // The hot-key SET is tiny by construction (keys whose bucket exceeds the
    // cap) — collect it once: the broadcast build would pull it to the
    // driver anyway, and knowing it's empty lets the whole anti-join + star
    // subplan tree be elided from the plan (it usually is on clean corpora;
    // boilerplate-heavy web crawls are where it kicks in). r6: detection
    // goes through [[hotKeyArray]]'s pigeonhole local count — the previous
    // `groupBy(key).count()` shuffled one row per DISTINCT key (≈ the whole
    // 20-keys/doc exploded frame, its second-largest exchange after the
    // self-join itself) just to find a set that is almost always empty.
    val spark = sigs.sparkSession
    val hotArr = hotKeyArray(keyed, "key", cfg.lsh.maxBucketSize)
    import spark.implicits._
    val hotKeys = broadcast(hotArr.toSeq.toDF("key"))

    // normal buckets: all-pairs within bucket
    val pruned =
      if (hotArr.isEmpty) keyed else keyed.join(hotKeys, Seq("key"), "left_anti")
    val a = pruned.alias("a")
    val b = pruned.alias("b")
    val allPairs = a.join(b, col("a.key") === col("b.key") && col("a.node") < col("b.node"))
      .where(col("a.tier") === col("b.tier")) // a pair matches within one tier's key space
      .where(col("a.tier") === 0 ||
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= d)
      .select(col("a.node").as("node_a"), col("b.node").as("node_b"), col("a.tier").as("cand_tier"))

    val withStar =
      if (hotArr.isEmpty) allPairs
      else {
        // hot buckets: star to the bucket minimum (skew-safe linear fan-out)
        val hot = keyed.join(hotKeys, Seq("key"), "left_semi")
        val hotMin = hot.groupBy("key").agg(min(col("node")).as("min_node"))
        val starPairs = hot.join(hotMin, "key")
          .where(col("node") > col("min_node"))
          .select(col("min_node").as("node_a"), col("node").as("node_b"),
            lit(2).cast("tinyint").as("cand_tier"))
        allPairs.unionByName(starPairs)
      }

    withStar
      .groupBy("node_a", "node_b")
      .agg(min(col("cand_tier")).as("t")) // 0 lsh < 1 simhash < 2 star
      .select(col("node_a"), col("node_b"),
        when(col("t") === 0, "lsh").when(col("t") === 1, "simhash")
          .otherwise("star").as("cand_tier"))
  }

  /** Signature-estimated Jaccard: fraction of agreeing MinHash components.
    * The scale path — at 10^12 docs you verify from the 128-long signature
    * you already carry instead of re-joining full shingle sets.
    */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x
    ).cast("double") / k

  /** Exact shingle-set Jaccard. Inputs are distinct-sets by construction
    * ([[graft.functions.ShingleHashes]]), so |A∪B| = |A|+|B|-|A∩B| — one
    * hash-set probe instead of also materializing the union array.
    */
  def exactJaccard(shA: Column, shB: Column): Column = {
    val inter = size(array_intersect(shA, shB)).cast("double")
    val uni = (size(shA) + size(shB)).cast("double") - inter
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** Broadcast semi-join reduction shared by every verify consumer: prune a
    * corpus-wide per-node `frame` to rows whose `node` appears in `pairs`
    * (node_a/node_b) — only pair members can contribute to a pair join, so
    * the frame's payload (shingle arrays, full text) must never cross the
    * verify shuffle for non-candidate nodes.
    *
    * The broadcast collect scales with 2×|pairs| (node ids, ~16 B/row —
    * duplicates per node included; the HashedRelation dedups only as it
    * BUILDS, after the collect), NOT with doc count: hot-bucket caps keep
    * per-doc pair degree O(1), so at 10^8 docs with degree ~1-2 this is
    * hundreds of MB — near the practical broadcast ceiling. Beyond it,
    * swap the hint for a shuffled or bloom semi-join — ONE place now.
    * No `.distinct()` on the pair nodes: a pre-dedup is a full shuffle +
    * stage barrier that costs more than the duplicate ids it removes
    * until exactly the scale where the whole broadcast should be swapped.
    */
  def pruneToPairNodes(frame: DataFrame, pairs: DataFrame): DataFrame = {
    val nodes = pairs.select(col("node_a").as("node"))
      .unionByName(pairs.select(col("node_b").as("node")))
    frame.join(broadcast(nodes), Seq("node"), "left_semi")
  }

  /** Verify candidate pairs: join back to signatures (B4's pair→event lookup,
    * `matching/pipeline.py:117-125`) and score exact shingle Jaccard.
    *
    * Input: candidates (node_a, node_b [, tier]); output adds
    * (url_a, url_b, exact_jaccard) — plus `est_jaccard` ONLY when `sigs`
    * carries a `minhash` column. The pipeline's signature stage persists
    * band keys instead of the 128-long minhash (8× fewer cached bytes), so
    * the hot path intentionally skips the est diagnostic; pass a frame from
    * [[signatures]] directly to get it.
    */
  def verify(candidates: DataFrame, sigs: DataFrame, cfg: GraftConfig): DataFrame = {
    val hasMinhash = sigs.columns.contains("minhash")
    if (hasMinhash) {
      val side = sigs.select(col("node"), col("url"), col("shingles"), col("minhash"))
      val a = side.toDF("node_a", "url_a", "sh_a", "mh_a")
      val b = side.toDF("node_b", "url_b", "sh_b", "mh_b")
      candidates
        .join(a, "node_a")
        .join(b, "node_b")
        .withColumn("est_jaccard", estJaccard(col("mh_a"), col("mh_b"), cfg.lsh.numHashes))
        .withColumn("exact_jaccard", exactJaccard(col("sh_a"), col("sh_b")))
        .drop("sh_a", "sh_b", "mh_a", "mh_b")
    } else {
      // pipeline hot path: signatures carry band keys, not the raw minhash
      // — decisions read exact Jaccard only, so skip the est diagnostic
      // instead of shuffling 1 KB/doc of signature just to compute it
      val side = sigs.select(col("node"), col("url"), col("shingles"))
      val a = side.toDF("node_a", "url_a", "sh_a")
      val b = side.toDF("node_b", "url_b", "sh_b")
      candidates
        .join(a, "node_a")
        .join(b, "node_b")
        .withColumn("exact_jaccard", exactJaccard(col("sh_a"), col("sh_b")))
        .drop("sh_a", "sh_b")
    }
  }
}
