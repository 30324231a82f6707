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
  /** Parse a level spec up front — a malformed spec must fail BEFORE the
    * multi-minute datagen/warm-up, not MatchError mid-run. Returns
    * Left(threads) or Right((workers, coresEach)).
    */
  private[graft] def parseLevel(level: String): Either[Int, (Int, Int)] =
    if (level.contains("x")) level.split("x", -1) match {
      case Array(w, c) if w.nonEmpty && c.nonEmpty &&
          w.forall(_.isDigit) && c.forall(_.isDigit) && w.toInt >= 1 && c.toInt >= 1 =>
        Right((w.toInt, c.toInt))
      case _ => throw new IllegalArgumentException(
        s"bad level spec '$level' — want N (threads) or WxC (executor JVMs x cores), all >= 1")
    } else {
      // >= 1: '0' is all-digits but local[0]/local-cluster[0,..] dies only
      // AFTER the multi-minute datagen — the late failure this parse exists
      // to prevent
      require(level.nonEmpty && level.forall(_.isDigit) && level.toInt >= 1,
        s"bad level spec '$level' — want N (threads) or WxC (executor JVMs x cores), all >= 1")
      Left(level.toInt)
    }

  // one knob for the executor heap (ProfilePipeline's mechanism): drives
  // the worker budget, spark.executor.memory AND -Xms together — a partial
  // override via extraJavaOptions alone could set -Xms above the pinned
  // -Xmx and kill every executor at launch
  private def execMemGb: Int = sys.props.getOrElse("graft.execMemGb", "10").toInt

  private def session(level: String): SparkSession = {
    val master = parseLevel(level) match {
      case Right((w, c)) => s"local-cluster[$w,$c,${(execMemGb + 2) * 1024}]"
      case Left(t) => s"local[$t]"
    }
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
        // local-cluster[w,c,mem] sets the WORKER budget; the executor heap
        // itself is spark.executor.memory — standalone executors get only
        // -Xmx from it, so -Xms + AlwaysPreTouch pins the heap at spawn
        // (see Bench.execSession; graft.execMemGb resizes all three knobs
        // coherently)
        b.config("spark.executor.memory", s"${execMemGb}g")
          .config("spark.executor.extraJavaOptions",
            sys.props.getOrElse("graft.execOpts",
              s"-Xms${execMemGb}g -XX:+AlwaysPreTouch"))
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
    levels.foreach(parseLevel) // validate ALL specs before any expensive work
    val path = {
      val gen = session("32")
      try Bench.corpusPath(gen, n) finally gen.stop()
    }
    // In-driver warm-up whenever ANY thread level is present (executor
    // levels warm their own fresh JVMs on the first rep — take min of
    // reps ≥ 2 there). Gating on ALL levels being thread specs would
    // measure the thread levels of a mixed list cold — JIT/first-touch
    // costs (4-10× on cold stages) attributed to whichever level ran first.
    if (levels.exists(!_.contains("x"))) {
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
