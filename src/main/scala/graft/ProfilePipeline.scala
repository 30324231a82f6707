package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.pipeline.DedupPipeline

/** Ad-hoc per-stage profiler for the dedup pipeline (not part of the driver
  * contract). Usage: runMain graft.ProfilePipeline <level> <nDocs> [rounds]
  * Level: `N` → local[N] threads; `WxC` → local-cluster with W executor
  * JVMs × C cores (BenchScale syntax; needs SPARK_HOME).
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val level = if (args.length > 0) args(0) else "32"
    val n = if (args.length > 1) args(1).toLong else 100000L
    val b = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (level.contains("x")) {
      val Array(w, c) = level.split("x")
      b.master(s"local-cluster[$w,$c,12288]")
        .config("spark.executor.memory", "10g")
        .config("spark.executor.extraJavaOptions", "-Xms10g -XX:+AlwaysPreTouch")
        .config("spark.network.timeout", "600s")
        .config("spark.executor.extraClassPath",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    } else b.master(s"local[$level]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft_bench_pages_$n"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      graft.datagen.PagesGen.pages(spark, n).toDF().repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    val pages = spark.read.parquet(path)
    val cfg = GraftConfig.default

    val rounds = if (args.length > 2) args(2).toInt else 2
    for (r <- 1 to rounds) {
      val p = new DedupPipeline(spark, cfg)
      def time(name: String)(df: => DataFrame): DataFrame = {
        val t0 = System.nanoTime()
        val d = df
        d.write.mode("overwrite").format("noop").save()
        println(f"[profile] r$r $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        d
      }
      val t0 = System.nanoTime()
      val ext = time("extracted")(p.extracted(pages))
      val sigs = time("signatures")(p.signatures(ext))
      val cands = time("candidates")(p.candidates(sigs))
      val decs = time("decisions")(p.decisions(cands, sigs, ext))
      val lbls = time("labels")(p.labels(sigs, decs))
      time("canonicals")(p.canonicals(lbls, ext, Some(decs)))
      println(f"[profile] r$r TOTAL        ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      p.unpersistAll()
    }
    spark.stop()
  }
}
