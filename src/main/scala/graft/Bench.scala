package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GraftConfig
import graft.datagen.PagesGen
import graft.pipeline.DedupPipeline

/** Benchmark entry point (driver contract).
  *
  * Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *    "dedup":{"docs":N,"docs_per_sec":...},
  *    "scaling":{"cores_lo":8,"cores_hi":32,"docs_per_sec_lo":...,
  *               "docs_per_sec_hi":...,"efficiency":...}}
  *
  * The scaling block is the sandbox evidence for the north_rule's
  * two-cluster-size criterion (BASELINE.md): the identical dedup job runs at
  * local[8] and local[32] over the same corpus bytes; efficiency =
  * (throughput@32 / throughput@8) / 4.
  */
object Bench {

  /** Identical SQL plans at every parallelism level: shuffle partitions are
    * fixed (AQE coalesces the small ones), only executor-thread count varies
    * — the clean analog of "same job, N vs 4N executors".
    */
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** REAL executor JVMs for the N-vs-4N protocol: `local-cluster` spawns
    * `workers` separate executor processes (4 cores, 10 g heap each) via the
    * Spark standalone launcher — own heaps, own GC, netty shuffle between
    * them. Only the executor COUNT varies between levels; the executor spec
    * is fixed, exactly like growing a real cluster. Requires SPARK_HOME
    * (set in build.sbt for forked runs); falls back to thread levels if the
    * launcher is unavailable.
    */
  private def execSession(workers: Int): SparkSession = {
    // wherever THIS code was loaded from is what executors need on their
    // classpath (classes dir under sbt, jar under spark-submit)
    val codePath = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,4,12288]")
      .appName(s"graft-bench-exec-$workers")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", sys.props.getOrElse("graft.localDir", "/dev/shm/graft-spark"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", "10g")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.extraClassPath", codePath)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Deterministic pages corpus parquet, generated once per size. */
  private def corpusPath(spark: SparkSession, n: Long): String = {
    val path = s"/tmp/graft_bench_pages_$n"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      PagesGen.pages(spark, n).toDF()
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** One full dedup pipeline run; returns wall seconds. */
  private def runPipeline(spark: SparkSession, path: String): Double = {
    val pages = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val p = new DedupPipeline(spark, GraftConfig.default)
    p.run(pages).write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    p.unpersistAll()
    secs
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Scaling corpus must be big enough that COMPUTE dominates the fixed
    // per-job latency (plan analysis, AQE stage scheduling, CC round
    // barriers — ~13 s per run in this sandbox regardless of cores): after
    // the hot-path fusion + heap-pretouch work the pipeline clears 300k
    // docs in ~26 s at 32 cores, which is latency-bound — the 8-core run
    // looks artificially close. 2M docs puts both levels back in the
    // compute-bound regime the north_rule's N-vs-4N criterion is about.
    // 1M shares one generated corpus with the scaling block and keeps a
    // cold full bench run (gen + queries + headline + 5 scaling runs)
    // around ~13 min; 2M raises throughput ~2% more (BENCH.md) but costs
    // a second corpus gen and doubles every run.
    val n: Long = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong).getOrElse {
      if (sfDir.contains("sf0.1")) 1000000L
      else if (sfDir.contains("sf0.01")) 30000L
      else 2000L
    }

    // ---- query timings at the driver-requested parallelism ----
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- headline dedup throughput at requested parallelism ----
    // min of two measured runs after a warm-up: this sandbox has bursty
    // host CPU steal (3x swings between identical runs), and the minimum
    // is the only steal-free estimator of the job's true cost.
    val path = corpusPath(spark, n)
    runPipeline(spark, path) // warm-up (JIT, page cache)
    val tHi = math.min(runPipeline(spark, path), runPipeline(spark, path))
    val thrHi = n / tHi

    // ---- scaling protocol: N vs 4N REAL executor JVMs ----
    // 1 executor vs 4 executors, fixed 4-core/10g executor spec, identical
    // job and bytes — the faithful sandbox analog of growing a cluster.
    // Falls back to local[8] vs local[32] threads if local-cluster can't
    // launch here.
    val nScale: Long = sys.env.get("SPARK_GRAFT_SCALE_DOCS").map(_.toLong)
      .getOrElse(math.min(n, 1000000L))
    val scalePath = corpusPath(spark, nScale)
    // Fixed-latency probe corpus: a run over it is almost pure per-run
    // overhead (Catalyst analysis, AQE stage scheduling, job barriers —
    // all constant in executor count), so it measures the latency floor
    // each level pays regardless of data volume.
    val nTiny = 20000L
    val tinyPath = corpusPath(spark, nTiny)
    spark.stop()

    // Host CPU steal on this box is TIME-VARYING on ~10-minute scales
    // (whole windows where every JVM gets <25% of a core). Measuring the
    // two levels in disjoint windows therefore corrupts the RATIO even
    // with min-of-reps. Protocol: paired rounds — each round measures
    // hi then lo back-to-back so both levels sample the same host
    // conditions; the per-round ratios are combined by median, which one
    // starved round cannot move. Absolute docs/sec fields still report the
    // best (min) time observed at each level across all rounds.
    val rounds = sys.env.get("SPARK_GRAFT_SCALE_ROUNDS").map(_.toInt).getOrElse(3)

    def minRuns(s: SparkSession, path: String, reps: Int): Double =
      (1 to reps).map(_ => runPipeline(s, path)).min

    // One level measurement within one round: fresh session, `reps` scale
    // runs (min), plus the fixed-latency probe on the first round.
    def level(mk: => SparkSession, reps: Int, probe: Boolean): (Double, Double) = {
      val s = mk
      try {
        val t = minRuns(s, scalePath, reps)
        val f = if (probe) minRuns(s, tinyPath, 2) else Double.NaN
        (t, f)
      } finally s.stop()
    }

    def paired(mkHi: => SparkSession, mkLo: => SparkSession)
        : (Seq[(Double, Double)], Double, Double) = {
      var fHi = Double.NaN
      var fLo = Double.NaN
      val ts = (1 to rounds).map { r =>
        // round 1 runs twice per level (warms fresh executor JVMs; min
        // discards the JIT-cold run), later rounds once
        val reps = if (r == 1) 2 else 1
        val (tH, fH) = level(mkHi, reps, probe = r == 1)
        val (tL, fL) = level(mkLo, reps, probe = r == 1)
        if (r == 1) { fHi = fH; fLo = fL }
        (tH, tL)
      }
      (ts, fHi, fLo)
    }

    val (mode, exLo, exHi, coresLo, coresHi, roundTimes, fHi, fLo) =
      try {
        val (ts, fH, fL) = paired(execSession(4), execSession(1))
        ("executors_4c10g", 1, 4, 4, 16, ts, fH, fL)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] local-cluster unavailable (${e.getMessage}); thread fallback")
          val (ts, fH, fL) = paired(session(32), session(8))
          ("threads", 1, 1, 8, 32, ts, fH, fL)
      }

    val tHiScale = roundTimes.map(_._1).min
    val tLo = roundTimes.map(_._2).min
    val fHiV = fHi
    val fLoV = fLo
    val thrLo = nScale / tLo
    val thrHiScale = nScale / tHiScale
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val roundEffs = roundTimes.map { case (tH, tL) => (tL / tH) / 4.0 }
    val eff = median(roundEffs)
    // Efficiency of the data-proportional fraction: subtract each level's
    // measured latency floor. On a real cluster jobs run minutes-to-hours,
    // so the floor amortizes to ~0 and THIS is the ratio that survives the
    // scale-up; the raw `efficiency` stays reported alongside. The
    // decomposition only separates when the scale run clearly exceeds the
    // floor at both levels (not at toy corpus sizes) — else fall back to
    // the raw ratio rather than report an artifact.
    val separable = !fLoV.isNaN && !fHiV.isNaN &&
      (tLo - fLoV) > math.max(2.0, 0.2 * tLo) &&
      (tHiScale - fHiV) > math.max(2.0, 0.2 * tHiScale)
    val effCompute =
      if (separable) ((tLo - fLoV) / (tHiScale - fHiV)) / 4.0 else eff

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val roundsJson = roundTimes.zip(roundEffs)
      .map { case ((tH, tL), e) => f"""{"secs_hi":$tH%.3f,"secs_lo":$tL%.3f,"efficiency":$e%.3f}""" }
      .mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","dedup":{"docs":$n,"secs":$tHi%.3f,"docs_per_sec":$thrHi%.1f},"scaling":{"mode":"$mode","docs":$nScale,"executors_lo":$exLo,"executors_hi":$exHi,"cores_lo":$coresLo,"cores_hi":$coresHi,"secs_lo":$tLo%.3f,"secs_hi":$tHiScale%.3f,"fixed_secs_lo":$fLoV%.3f,"fixed_secs_hi":$fHiV%.3f,"docs_per_sec_lo":$thrLo%.1f,"docs_per_sec_hi":$thrHiScale%.1f,"rounds":$roundsJson,"efficiency":$eff%.3f,"efficiency_compute":$effCompute%.3f}}""")
  }
}
