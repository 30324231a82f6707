package graft.operators

import graft.SparkSpec
import graft.config.GraftConfig
import org.apache.spark.sql.functions._

class MinHashLshSpec extends SparkSpec {
  import spark.implicits._

  private def sigsOf(docs: Seq[(Long, String)], cfg: GraftConfig): org.apache.spark.sql.DataFrame =
    MinHashLsh.signatures(
      docs.toDF("doc_id", "extracted_text").withColumn("url", col("doc_id")), cfg)
      .withColumn("node", col("doc_id"))

  test("LSH finds high-jaccard pairs, skips unrelated docs") {
    val cfg = GraftConfig.default
    val base = (1 to 120).map(i => s"w$i").mkString(" ")
    val near = (1 to 120).map(i => if (i == 60) "swapped" else s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, (1000 to 1120).map(i => s"z$i").mkString(" ")))
    val sigs = sigsOf(docs, cfg)
    val pairs = MinHashLsh.fusedCandidates(sigs, cfg)
    val verified = MinHashLsh.verify(pairs, sigs, cfg)
      .where(col("exact_jaccard") >= cfg.lsh.jaccardThreshold)
      .select("node_a", "node_b").as[(Long, Long)].collect().toSet
    assert(verified == Set((1L, 2L)))
  }

  test("mega-bucket star handling: huge exact-dup bucket still fully clustered") {
    // 300 identical docs with maxBucketSize 50 → every band bucket is hot →
    // star candidates only; CC must still recover ONE 300-member cluster.
    val cfg = GraftConfig.default.copy(lsh = GraftConfig.default.lsh.copy(maxBucketSize = 50))
    val text = (1 to 80).map(i => s"boiler$i").mkString(" ")
    val docs = (1L to 300L).map(id => (id, text)) :+ (900L, (1 to 80).map(i => s"other$i").mkString(" "))
    val sigs = sigsOf(docs, cfg)
    val cands = MinHashLsh.fusedCandidates(sigs, cfg)
    // star fan-out is linear, not quadratic
    val nCands = cands.count()
    assert(nCands < 5000, s"expected O(n) candidates, got $nCands")
    assert(cands.where(col("cand_tier") === "star").count() > 0)
    val verified = MinHashLsh.verify(cands, sigs, cfg)
      .where(col("exact_jaccard") >= cfg.lsh.jaccardThreshold)
    val edges = verified.select(col("node_a").as("src"), col("node_b").as("dst"))
    val labels = ConnectedComponents.labelsWithSingletons(sigs.select(col("node")), edges)
      .as[(Long, Long)].collect().toMap
    assert((1L to 300L).forall(labels(_) == 1L), "mega exact-dup cluster must survive the cap")
    assert(labels(900L) == 900L)
  }

  test("est_jaccard from signatures tracks exact jaccard (scale verification path)") {
    val cfg = GraftConfig.default
    val base = (1 to 200).map(i => s"t$i").mkString(" ")
    val variant = (1 to 200).map(i => if (i % 17 == 0) s"x$i" else s"t$i").mkString(" ")
    val sigs = sigsOf(Seq((1L, base), (2L, variant)), cfg)
    val pairs = Seq((1L, 2L)).toDF("node_a", "node_b")
    val row = MinHashLsh.verify(pairs, sigs, cfg)
      .select("est_jaccard", "exact_jaccard").as[(Double, Double)].collect()(0)
    assert(math.abs(row._1 - row._2) < 0.15, s"est=${row._1} exact=${row._2}")
  }

  test("hotKeyArray is exact at the cap boundary and across thin partition spread") {
    // keys: 100 → count cap+1 (hot), 200 → count exactly cap (NOT hot),
    // 300 → count 1. Rows are spread round-robin over many partitions so
    // every partition-local count sits far below the cap — the pigeonhole
    // pass-1 bound (local ≥ ceil((cap+1)/m)) must still surface key 100,
    // and pass 2's exact recount must reject 200 despite it surviving
    // pass 1 alongside 100.
    val cap = 40
    val rows = (Seq.fill(cap + 1)(100L) ++ Seq.fill(cap)(200L) ++ Seq(300L))
    val df = spark.sparkContext.parallelize(rows, 16).toDF("key")
    val hot = MinHashLsh.hotKeyArray(df, "key", cap)
    assert(hot.toSet == Set(100L), s"expected exactly {100}, got ${hot.toSet}")
    // empty result when nothing exceeds the cap — the caller elides the
    // anti-join entirely in this case
    assert(MinHashLsh.hotKeyArray(df, "key", cap + 1).isEmpty)
  }

  test("bucketStats reports capped buckets") {
    val cfg = GraftConfig.default.copy(lsh = GraftConfig.default.lsh.copy(maxBucketSize = 10))
    val text = (1 to 50).map(i => s"same$i").mkString(" ")
    val docs = (1L to 40L).map(id => (id, text))
    val sigs = sigsOf(docs, cfg)
    val stats = MinHashLsh.bucketStats(MinHashLsh.bands(sigs, cfg), cfg).collect()(0)
    assert(stats.getAs[Long]("max_bucket") == 40L)
    assert(stats.getAs[Long]("capped_buckets") >= 16L) // every band bucket is hot
  }
}
