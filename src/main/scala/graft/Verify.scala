package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-3 postmortem hardening (the round's CORRECTNESS file came back `{}`
  * with no error trail — indistinguishable from "no queries exist"):
  *  - `oracle_sql.json` is written FIRST, before any Spark work, so a
  *    mid-run kill leaves the driver a partial gate (the queries that
  *    completed) instead of an empty one;
  *  - every query appends one JSON line to `verify_progress.jsonl`
  *    (name, ok/err, seconds) — forensic evidence that survives any kill
  *    and makes a crashed gate distinguishable from an empty one;
  *  - the forked heap is lean (build.sbt default 10 g — the old build-wide
  *    pre-touched 24 g made Verify the OOM killer's first target).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // progress lines format seconds with f"%.2f" — locale-proof the decimal
    // separator so the jsonl stays machine-parseable on any host JVM
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val Array(sfDir, outDir) = args
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val progress = Paths.get(s"$outDir/verify_progress.jsonl")
    def note(line: String): Unit = {
      try Files.writeString(progress, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      catch { case _: Throwable => () }
      System.err.println(s"[verify] $line")
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()
    var ok = 0
    var err = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        ok += 1
        note(f"""{"query":"$name","ok":true,"secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      } catch { case e: Throwable =>
        err += 1
        // q() escapes ALL control chars (not just \n\r\t) — an exception
        // message carrying \b/\f/etc. must not break the jsonl forensics
        val msg = q(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        note(f"""{"query":"$name","ok":false,"secs":${(System.nanoTime() - t0) / 1e9}%.2f,"err":$msg}""")
      }
    }
    note(s"""{"done":true,"ok":$ok,"err":$err,"total":${SparkEntry.queries.size}}""")
    spark.stop()
  }
}
