package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.functions.Hashing
import graft.operators.MinHashLsh
import graft.pipeline.DedupPipeline

/** Ad-hoc sub-step profiler for the fused candidate join (not part of the
  * driver contract). Usage: runMain graft.ProfileCandidates <cores> <nDocs>
  */
object ProfileCandidates {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      // 64, same as Bench/BenchScale/ProfilePipeline: the sub-step timings
      // must decompose the SAME-partitioned plan the pipeline stage runs —
      // a different partition count changes task granularity and AQE
      // coalescing, profiling a different plan than the one being explained
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()

    val pages = spark.read.parquet(Bench.corpusPath(spark, n))
    val cfg = GraftConfig.default
    val p = new DedupPipeline(spark, cfg)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cand] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sigs = p.signatures(p.extracted(pages))
    time("materialize sigs")(sigs.write.mode("overwrite").format("noop").save())

    // Sub-steps mirror MinHashLsh.fusedCandidates EXACTLY (band_keys from
    // the pipeline's signature projection, tinyint tiers, star candidates
    // for hot buckets) — a drifted inline copy would profile a different
    // operator than the "full fusedCandidates" line below times.
    val d = cfg.simhash.maxHammingDistance
    val banded = sigs.where(col("band_keys").isNotNull)
      .select(col("node"), col("simhash"), explode(col("band_keys")).as("key"))
      .withColumn("tier", lit(0).cast("tinyint"))
    val blocked = sigs.where(col("simhash").isNotNull)
      .select(col("node"), col("simhash"),
        explode(Hashing.simHashBlocks(col("simhash"), d + 1)).as("raw_key"))
      .select(col("node"), col("simhash"), xxhash64(col("raw_key"), lit("simblock")).as("key"))
      .withColumn("tier", lit(1).cast("tinyint"))
    val keyed = banded.unionByName(blocked)
    val nKeyed = time("keyed count")(keyed.count())
    println(s"[cand] keyed rows = $nKeyed")

    val hotArr = time("hotKeys collect")(keyed.groupBy("key").count()
      .where(col("count") > cfg.lsh.maxBucketSize).select("key")
      .collect().map(_.getLong(0)))
    println(s"[cand] hot keys = ${hotArr.length}  (maxBucketSize=${cfg.lsh.maxBucketSize})")
    import spark.implicits._
    val hotKeys = broadcast(hotArr.toSeq.toDF("key"))

    val pruned =
      if (hotArr.isEmpty) keyed else keyed.join(hotKeys, Seq("key"), "left_anti")
    val a = pruned.alias("a")
    val b = pruned.alias("b")
    val allPairs = a.join(b, col("a.key") === col("b.key") && col("a.node") < col("b.node"))
      .where(col("a.tier") === col("b.tier"))
      .where(col("a.tier") === 0 ||
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= d)
      .select(col("a.node").as("node_a"), col("b.node").as("node_b"), col("a.tier").as("cand_tier"))
    val withStar =
      if (hotArr.isEmpty) allPairs
      else {
        val hot = keyed.join(hotKeys, Seq("key"), "left_semi")
        val hotMin = hot.groupBy("key").agg(min(col("node")).as("min_node"))
        allPairs.unionByName(hot.join(hotMin, "key")
          .where(col("node") > col("min_node"))
          .select(col("min_node").as("node_a"), col("node").as("node_b"),
            lit(2).cast("tinyint").as("cand_tier")))
      }
    val nPairs = time("self-join pairs (+star)")(withStar.count())
    println(s"[cand] raw pairs = $nPairs")

    val deduped = withStar.groupBy("node_a", "node_b").agg(min(col("cand_tier")).as("cand_tier"))
    val nDedup = time("dedup")(deduped.count())
    println(s"[cand] deduped pairs = $nDedup")

    time("full fusedCandidates")(
      MinHashLsh.fusedCandidates(sigs, cfg).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
