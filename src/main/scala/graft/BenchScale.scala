package graft

import org.apache.spark.sql.SparkSession
import graft.config.GraftConfig
import graft.pipeline.DedupPipeline

/** Ad-hoc scaling experiment (not part of the driver contract): the full
  * dedup pipeline at a list of parallelism levels, min of `reps` runs each.
  * Usage: runMain graft.BenchScale <nDocs> <reps> <level...>
  *
  * Level spec: `N` → `local[N]` (threads in one JVM);
  * `WxC` → `local-cluster[W,C,12288]` (W REAL executor JVMs × C cores each —
  * the faithful N-vs-4N-executors analog; needs SPARK_HOME=/opt/spark).
  */
object BenchScale {
  private def session(level: String): SparkSession = {
    val master =
      if (level.contains("x")) {
        val Array(w, c) = level.split("x")
        s"local-cluster[$w,$c,12288]"
      } else s"local[$level]"
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-scale-$level")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withExec =
      if (level.contains("x"))
        // NOTE: local-cluster[w,c,mem] sets the WORKER budget; the executor
        // heap itself is spark.executor.memory (default 1g) — set it.
        // no AlwaysPreTouch here: 8 executors pre-touching 10g each at
        // spawn stalls registration past the heartbeat window; first-touch
        // cost lands in rep 1 and min-of-reps discards it.
        b.config("spark.executor.memory", "10g")
          // standalone executors get only -Xmx from spark.executor.memory;
          // -Xms + pretouch pins the heap at spawn (see Bench.execSession)
          .config("spark.executor.extraJavaOptions",
            sys.props.getOrElse("graft.execOpts", "-Xms10g -XX:+AlwaysPreTouch"))
          .config("spark.network.timeout", "600s")
          .config("spark.executor.extraClassPath",
            new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      else b
    val s = withExec.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()
    s
  }

  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val reps = args(1).toInt
    val levels = args.drop(2)
    val path = s"/tmp/graft_bench_pages_$n"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val gen = session("32")
      graft.datagen.PagesGen.pages(gen, n).toDF().repartition(64)
        .write.mode("overwrite").parquet(path)
      gen.stop()
    }
    // In-driver warm-up only for thread levels (executor levels warm their
    // own fresh JVMs on the first rep — take min of reps ≥ 2 there).
    if (levels.forall(!_.contains("x"))) {
      val gen = session("32")
      val p0 = new DedupPipeline(gen, GraftConfig.default)
      p0.run(gen.read.parquet(path)).write.mode("overwrite").format("noop").save()
      p0.unpersistAll()
      gen.stop()
    }

    levels.foreach { level =>
      val spark = session(level)
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val p = new DedupPipeline(spark, GraftConfig.default)
        p.run(spark.read.parquet(path)).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        p.unpersistAll()
        s
      }
      println(f"[scale] level=$level%-5s best=${secs.min}%7.2f s  (${n / secs.min}%.0f docs/s)  all=${secs.map(s => f"$s%.1f").mkString(",")}")
      spark.stop()
    }
  }
}
