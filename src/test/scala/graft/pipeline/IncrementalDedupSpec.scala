package graft.pipeline

import graft.SparkSpec
import graft.config.GraftConfig
import graft.datagen.PagesGen
import org.apache.spark.sql.functions._

/** Incremental fold ≡ full run: folding the corpus in batches must yield
  * byte-identical labels to the one-shot pipeline over the union — the
  * determinism that makes incremental maintenance trustworthy at scale.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("A then B labels == full-run labels over A ∪ B") {
    // 32×4 banding pushes LSH recall at j≥0.8 to ~1-5e-8 so the LSH tier
    // alone determines the match set on this corpus — the equivalence is
    // then exact, not probabilistic.
    val cfg = GraftConfig.default.copy(
      lsh = GraftConfig.default.lsh.copy(bands = 32, rowsPerBand = 4))
    val all = PagesGen.pages(spark, 600L).toDF().cache()
    val batchA = all.where(xxhash64($"url") % 2 === 0)
    val batchB = all.where(xxhash64($"url") % 2 =!= 0)

    val inc = new IncrementalDedup(spark, cfg)
    val s1 = inc.step(inc.emptyState, batchA)
    val s2 = inc.step(s1, batchB)
    val incremental = s2.labels.as[(Long, Long)].collect().toMap

    val full = new DedupPipeline(spark, cfg)
    val fullLabels = full.labels(
      full.signatures(full.extracted(all)),
      full.decisions(full.candidates(full.signatures(full.extracted(all))),
        full.signatures(full.extracted(all)), full.extracted(all)))
      .as[(Long, Long)].collect().toMap

    assert(incremental.size == fullLabels.size,
      s"label counts differ: ${incremental.size} vs ${fullLabels.size}")
    // full pipeline also has simhash + overlap tiers; incremental uses the
    // LSH tier — compare on clusters driven by jaccard-verified edges:
    // every pair clustered together incrementally must be together in full
    val incPairs = incremental.groupBy(_._2).values
      .flatMap(g => g.keys.toSeq.sorted.combinations(2).map(p => (p(0), p(1)))).toSet
    val fullPairs = fullLabels.groupBy(_._2).values
      .flatMap(g => g.keys.toSeq.sorted.combinations(2).map(p => (p(0), p(1)))).toSet
    assert(incPairs.subsetOf(fullPairs),
      s"incremental created pairs the full run lacks: ${(incPairs -- fullPairs).take(3)}")
    val missing = fullPairs -- incPairs
    // full run may add simhash-tier pairs; jaccard-tier pairs must all be found
    assert(missing.isEmpty,
      s"incremental missed ${missing.size} pairs, e.g. ${missing.take(3)}")
  }

  test("second batch does not recompute signatures of the first") {
    val cfg = GraftConfig.default
    val inc = new IncrementalDedup(spark, cfg)
    val s1 = inc.step(inc.emptyState, PagesGen.pages(spark, 100L).toDF())
    val n1 = s1.signatures.count()
    val s2 = inc.step(s1, spark.range(100L, 200L).map(id => PagesGen.pageOf(42L, id)).toDF())
    assert(n1 == 100 && s2.signatures.count() == 200)
    assert(s2.labels.count() == 200)
    // the band index and key counts accumulate across folds
    assert(s2.bands.count() == s2.signatures.count() * cfg.lsh.bands)
    assert(s2.keyCounts.agg(sum($"n")).as[Long].head() == s2.bands.count())
  }

  test("fold joins the STORED band index, not bands recomputed from signatures") {
    // Feed a state whose band index was artificially emptied while its
    // signatures remain intact, then fold a batch of exact duplicates of the
    // old corpus. If step re-derived the all-side bands from signatures (the
    // round-2 ∝-corpus recompute), every duplicate would pair with its
    // original; reading the stored (empty) index, only new×new pairs can
    // exist — so NO old node may appear in any edge.
    val cfg = GraftConfig.default
    val inc = new IncrementalDedup(spark, cfg)
    val batch = PagesGen.pages(spark, 80L).toDF()
    val s1 = inc.step(inc.emptyState, batch)
    val gutted = s1.copy(
      bands = s1.bands.limit(0),
      keyCounts = s1.keyCounts.limit(0))
    val dup = batch.withColumn("url", concat($"url", lit("#copy")))
    val s2 = inc.step(gutted, dup)
    val oldNodes = s1.labels.select($"node").as[Long].collect().toSet
    // only edges ADDED by this fold matter (state.edges carries fold-1 edges)
    val priorEdges = s1.edges.as[(Long, Long)].collect().toSet
    val newEdges = s2.edges.as[(Long, Long)].collect().toSet -- priorEdges
    val edgeNodes = newEdges.flatMap(e => Seq(e._1, e._2))
    assert(edgeNodes.nonEmpty, "duplicate batch should at least pair within itself")
    assert(edgeNodes.intersect(oldNodes).isEmpty,
      "old nodes in new edges ⇒ the all side was recomputed from signatures")
  }
}
