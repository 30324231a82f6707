package graft

import org.apache.spark.sql.SparkSession

/** Smoke-run of the driver's flagship check: `SparkEntry.entry` rows > 0.
  * Usage: runMain graft.EntrySmoke
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.hintWarnings()
    // localCheckpoint: count() and the show() below must not each re-run
    // the whole dedup pipeline
    val df = SparkEntry.entry(spark).localCheckpoint(true)
    val rows = df.count()
    println(s"[entry-smoke] rows=$rows")
    df.orderBy("canonical_url").show(3, truncate = 60)
    require(rows > 0, "entry must return rows")
    spark.stop()
  }
}
