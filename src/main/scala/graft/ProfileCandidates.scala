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
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()

    val path = s"/tmp/graft_bench_pages_$n"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      graft.datagen.PagesGen.pages(spark, n).toDF().repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    val pages = spark.read.parquet(path)
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

    val d = cfg.simhash.maxHammingDistance
    val banded = sigs.where(col("minhash").isNotNull)
      .select(col("node"), col("simhash"),
        explode(Hashing.bandKeys(col("minhash"), cfg.lsh.bands, cfg.lsh.rowsPerBand)).as("key"))
      .withColumn("tier", lit("lsh"))
    val blocked = sigs.where(col("simhash").isNotNull)
      .select(col("node"), col("simhash"),
        explode(Hashing.simHashBlocks(col("simhash"), d + 1)).as("raw_key"))
      .select(col("node"), col("simhash"), xxhash64(col("raw_key"), lit("simblock")).as("key"))
      .withColumn("tier", lit("simhash"))
    val keyed = banded.unionByName(blocked)
    val nKeyed = time("keyed count")(keyed.count())
    println(s"[cand] keyed rows = $nKeyed")

    val hotKeys = keyed.groupBy("key").count()
      .where(col("count") > cfg.lsh.maxBucketSize).select("key")
    val nHot = time("hotKeys count")(hotKeys.count())
    println(s"[cand] hot keys = $nHot  (maxBucketSize=${cfg.lsh.maxBucketSize})")

    val pruned = keyed.join(broadcast(hotKeys), Seq("key"), "left_anti")
    val a = pruned.alias("a")
    val b = pruned.alias("b")
    val allPairs = a.join(b, col("a.key") === col("b.key") && col("a.node") < col("b.node"))
      .where(col("a.tier") === col("b.tier"))
      .where(col("a.tier") === "lsh" ||
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= d)
      .select(col("a.node").as("node_a"), col("b.node").as("node_b"), col("a.tier").as("cand_tier"))
    val nPairs = time("self-join pairs")(allPairs.count())
    println(s"[cand] raw pairs = $nPairs")

    val deduped = allPairs.groupBy("node_a", "node_b").agg(min(col("cand_tier")).as("cand_tier"))
    val nDedup = time("dedup")(deduped.count())
    println(s"[cand] deduped pairs = $nDedup")

    time("full fusedCandidates")(
      MinHashLsh.fusedCandidates(sigs, cfg).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
