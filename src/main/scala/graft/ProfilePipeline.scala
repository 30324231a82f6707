package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.pipeline.DedupPipeline

/** Ad-hoc per-stage profiler for the dedup pipeline (not part of the driver
  * contract). Usage: runMain graft.ProfilePipeline <level> <nDocs> [rounds] [mode]
  * Level: `N` → local[N] threads; `WxC` → local-cluster with W executor
  * JVMs × C cores (BenchScale syntax; needs SPARK_HOME).
  * Mode: `persist` (default) caches stages in memory; `ckpt` writes each
  * stage as parquet to a fresh tmpfs workDir per round (compressed columnar
  * storage — trades scan bandwidth for codec CPU, the relevant trade on a
  * bandwidth-ceilinged box).
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val level = if (args.length > 0) args(0) else "32"
    val n = if (args.length > 1) args(1).toLong else 100000L
    // parse/validate EVERYTHING before the session build: a flag typo must
    // fail now, not after a multi-minute local-cluster spawn
    val rounds = if (args.length > 2) args(2).toInt else 2
    // args(3): comma-separated flag set. Known flags: `ckpt` (checkpoint
    // every stage to tmpfs instead of persist), `bc64` (raise the AQE
    // broadcast threshold to 64 MB). Unknown flags fail fast — a typo like
    // `checkpoint` must not silently profile the persist path.
    val flags = if (args.length > 3) args(3).split(",").filter(_.nonEmpty).toSet
                else Set.empty[String]
    val unknown = flags -- Set("ckpt", "bc64")
    require(unknown.isEmpty, s"unknown profile flags: ${unknown.mkString(",")}")
    val b = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (level.contains("x")) {
      val (w, c) = BenchScale.parseLevel(level) // fail fast on a bad spec
        .getOrElse(throw new IllegalArgumentException(s"bad level: $level"))
      // -Dgraft.execMemGb overrides the per-executor heap (default 10g —
      // worker counts ≥8 must shrink it or 8 pretouched heaps + driver
      // exceed host RAM and the OOM killer takes the run).
      val memGb = sys.props.getOrElse("graft.execMemGb", "10").toInt
      b.master(s"local-cluster[$w,$c,${memGb * 1024 + 2048}]")
        .config("spark.executor.memory", s"${memGb}g")
        .config("spark.executor.extraJavaOptions", s"-Xms${memGb}g -XX:+AlwaysPreTouch")
        .config("spark.network.timeout", "600s")
        .config("spark.executor.extraClassPath",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    } else b.master(s"local[$level]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()

    val pages = spark.read.parquet(Bench.corpusPath(spark, n))
    val cfg = GraftConfig.default

    val ckptMode = flags("ckpt")
    // bc64: let AQE broadcast runtime-small join sides up to 64 MB (labels,
    // candidate pairs). Adaptive, not a hint — at 10^12 docs the same config
    // still shuffles because those sides exceed the threshold.
    if (flags("bc64")) {
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    }
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
      x.delete(): Unit
    }
    val ckptBase = sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark")
    def ckptDir(r: Int) = s"$ckptBase/profile_ckpt_$r"
    // startup sweep of ALL profile_ckpt_* dirs, not just round indices this
    // run reaches: a killed previous run with MORE rounds leaves its later
    // dirs pinned on tmpfs alongside this run's executor heaps — exactly
    // the memory margin the OOM-killer note below is about
    if (ckptMode) Option(new java.io.File(ckptBase).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("profile_ckpt_")).foreach(rm)
    for (r <- 1 to rounds) {
      val workDir = if (!ckptMode) None else Some(ckptDir(r))
      val p = new DedupPipeline(spark, cfg, workDir)
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
      // this round's checkpoint data is dead once the round ends — free the
      // RAM-backed tmpfs NOW, not after all rounds (4 full stage sets on
      // /dev/shm alongside executor heaps is how the OOM killer takes runs)
      workDir.foreach(d => rm(new java.io.File(d)))
    }
    spark.stop()
  }
}
