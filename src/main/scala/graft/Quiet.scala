package graft

/** Log hygiene for entrypoints whose stderr the driver tail-captures.
  *
  * The CC driver-finisher's bounded label table carries an explicit
  * broadcast hint (ConnectedComponents.localLabels) consumed by the
  * downstream labels joins; analysis passes over NON-join usages of the
  * same frame (checkpoint writes, cluster-size aggregations) each log a
  * benign "hint not part of a join relation" WARN. Those lines would land
  * in the driver's ~2.3 KB stdout/stderr tail and could displace the final
  * JSON line, so the one logger is demoted to ERROR — every hinted usage
  * is intentional.
  */
object Quiet {
  def hintWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.HintErrorLogger",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
}
