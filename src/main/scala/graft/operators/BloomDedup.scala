package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.functions.{toCol, toExpr}

/** Bloom-prefiltered incremental exact dedup: which documents of a new batch
  * are NOT already in the corpus?
  *
  * Reference analog: the file-hash idempotency ledger
  * (`/root/reference/src/event_dedup/ingestion/json_loader.py:104-117`,
  * checked at `ingestion/file_processor.py:187-196`) — "skip what we already
  * ingested", scaled from a per-file DB lookup to a corpus-sized membership
  * test.
  *
  * Two phases, exact by construction:
  *
  *  1. **Bloom prefilter** — a distributed-built Bloom filter over the
  *     corpus's 64-bit content fingerprints (`df.stat.bloomFilter`: partial
  *     filters built per partition, merged once — no shuffle of the corpus).
  *     Probed with Spark's own codegen'd [[BloomFilterMightContain]]
  *     expression (the same primitive AQE runtime-filter pushdown uses), so
  *     the probe is a scan-local predicate. Rows the bloom rejects are
  *     *definitely new* (Bloom filters have no false negatives).
  *  2. **Exact confirm** — only rows the bloom claims seen (true seen + the
  *     fpp fraction of false positives) reach a `left_anti` join on the
  *     SHA-256 content hash. The bloom shrinks this join's left side from
  *     |batch| to ≈ |batch∩corpus| + fpp·|batch|; the output equals the
  *     plain anti-join exactly.
  *
  * At 10^12 docs the anti-join's corpus side is the bottleneck; the 32-byte
  * sha2 projection (not the text) is what shuffles, and a date/bucket
  * partitioned corpus lets the join run co-located. The 64-bit xxhash is
  * fine for the *bloom* (false positives get re-checked) but NOT for the
  * exact phase — at 10^12 rows 64-bit birthday collisions would silently
  * drop genuinely-new docs, hence sha2 there.
  *
  * Practical ceiling of THIS single-filter form: the bloom is materialized
  * as one driver-side byte array baked into the plan, and a 1% filter costs
  * ~1.2 bytes/item — fine to ~10^9-10^10 corpus items (a few GB), not
  * 10^12 in one filter. Beyond that, partition the corpus (by date/bucket)
  * and build one bloom per partition probed against the matching batch
  * slice; the two-phase shape is unchanged. `expectedItems` exists so the
  * caller can thread a known count (e.g. the stage-lineage `rows` figure
  * from [[graft.pipeline.Checkpoints]]) and skip the sizing count job.
  */
object BloomDedup {

  /** Probe a serialized Bloom filter with a long-valued column — Spark's
    * native codegen'd expression, exposed as a Column function.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    toCol(BloomFilterMightContain(Literal(bloomBytes, BinaryType), toExpr(value)))

  /** Serialized Bloom filter over `fingerprint` (a long-valued Column) of
    * `corpus`. `expectedItems <= 0` sizes from a corpus count.
    */
  def buildBloom(corpus: DataFrame, fingerprint: Column,
      expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val fps = corpus.select(fingerprint.as("fp"))
    // zero-row corpora: stat.bloomFilter's aggregate yields a null buffer
    // (NPE on deserialize) — an empty filter (rejects everything) is the
    // correct membership answer. Emptiness is checked EXPLICITLY (cheap
    // limit-1 probe when the caller supplied expectedItems and we didn't
    // count) rather than by catching NPE, which would mask unrelated NPEs
    // from the aggregate path.
    val n = if (expectedItems > 0) expectedItems else fps.count()
    val isEmpty = if (expectedItems > 0) fps.isEmpty else n == 0
    val bloom =
      if (isEmpty) org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else fps.stat.bloomFilter("fp", math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Rows of `batch` whose `textCol` content does not occur in `corpus` —
    * exactly `batch left_anti corpus` on content, with the bloom phase
    * eliminating the definitely-new majority before the join.
    */
  def newDocs(batch: DataFrame, corpus: DataFrame, textCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val fp = xxhash64(col(textCol))
    val bloomBytes = buildBloom(corpus, fp, expectedItems, fpp)
    val seen = mightContain(bloomBytes, fp)

    val definitelyNew = batch.where(!seen)
    val suspects = batch.where(seen)
    val corpusSha = corpus.select(sha2(col(textCol), 256).as("__sha"))
    val confirmedNew = suspects
      .withColumn("__sha", sha2(col(textCol), 256))
      .join(corpusSha, Seq("__sha"), "left_anti")
      .drop("__sha")
    definitelyNew.unionByName(confirmedNew)
  }
}
