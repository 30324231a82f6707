package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc optimization-round measurement harness (NOT part of the driver
  * contract — graft.Bench stays the frozen measurement surface; this main
  * exists so guide §1.4-style isolation runs don't require editing it).
  *
  * Usage: runMain graft.BenchExtra [sel] [reps] [plansDir]
  *  - sel: comma-separated query-name prefixes ("q44,q53"), "all"
  *    (default; every declared query incl. the Verify-only ones), or
  *    "bench" (exactly the set Bench times), or "pipeline:N" to time the
  *    headline dedup pipeline at N docs.
  *  - reps: per-query repetitions; reported value is the MIN (the same
  *    steal-robust estimator Bench uses). Default 3.
  *  - plansDir: when set, writes `<name>.txt` with `.explain("formatted")`
  *    output per selected query (the round's plan evidence).
  *
  * Same session shape as Bench (local[$SPARK_GRAFT_CPUS], 64 shuffle
  * partitions, AQE, UTC) and the same noop-sink action, so numbers are
  * comparable to the frozen bench's per-query block.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sel = if (args.length > 0) args(0) else "all"
    val reps = if (args.length > 1) args(1).toInt else 3
    val plansDir = if (args.length > 2) Some(args(2)) else None

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()

    // same warm-up as Bench: JIT/codegen/scan-service init must not be
    // charged to the first measured query
    try {
      spark.range(2000000L).agg(org.apache.spark.sql.functions.sum("id")).collect(): Unit
      spark.read.parquet(s"$sfDir/documents.parquet")
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }

    plansDir.foreach(d => new java.io.File(d).mkdirs())

    if (sel.startsWith("pipeline:")) {
      val n = sel.stripPrefix("pipeline:").toLong
      val path = Bench.corpusPath(spark, n)
      def once(): Double = {
        val pages = spark.read.parquet(path)
        val t0 = System.nanoTime()
        val p = new graft.pipeline.DedupPipeline(spark, graft.config.GraftConfig.default)
        p.run(pages).write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0) / 1e9
        p.unpersistAll()
        secs
      }
      once() // warm-up
      val t = (1 to reps).map(_ => once()).min
      println(f"""{"pipeline_docs":$n,"secs":$t%.3f,"docs_per_sec":${n / t}%.1f}""")
      Runtime.getRuntime.halt(0)
    }

    val verifyOnly = Set("q30_ann_lsh_topk", "q31_embedding_neardup",
      "q40_ann_ivf_topk", "q58_stream_host_windows")
    val wanted: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
        sel match {
          case "all" => true
          case "bench" => !verifyOnly(name)
          case s => s.split(",").exists(p => name.startsWith(p))
        }
      }
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    wanted.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      plansDir.foreach { d =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/$name.txt"),
            plan.getBytes("UTF-8")): Unit
        } catch { case e: Throwable =>
          System.err.println(s"[extra] WARN plan for $name failed: $e")
        }
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[extra] WARN query $name failed: $e")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val t = (1 to reps).map(_ => once()).min
      results += name -> t
      println(f"[extra] $name%-28s $t%7.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    val total = results.map(_._2).sum
    val qjson = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    println(f"""{"extra_total":$total%.3f,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    Runtime.getRuntime.halt(0)
  }
}
