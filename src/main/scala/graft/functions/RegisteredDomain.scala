package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registered (registrable) domain of a lowercased host under the FULL
  * public suffix list — publicsuffix.org data, embedded as a classpath
  * resource (`/graft/public_suffix_list.dat`, the Debian `publicsuffix`
  * package copy; MPL-2.0-licensed public data).
  *
  * Implements the PSL algorithm (https://publicsuffix.org/list/):
  * right-to-left label match; wildcard rules (`*.ck`) match one extra
  * label; exception rules (`!www.ck`) prevail over everything and name a
  * registrable domain directly; unmatched TLDs fall back to the implicit
  * `*` rule (the TLD itself is the public suffix). Registered domain =
  * public suffix + one label; a host that IS a public suffix yields ""
  * (same no-match value as the previous regex implementation).
  *
  * A native `Expression` (not a UDF) so the per-row lookup stays inside
  * whole-stage codegen next to the other scan-local URL kernels. The rule
  * table loads once per JVM (executor-local static state, ~10k entries).
  *
  * Reference analog: host-level grouping at ingest
  * (`/root/reference/src/event_dedup/ingestion/file_processor.py:68-130`
  * canonicalizes record identity before the id-keyed insert).
  */
case class RegisteredDomainExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = StringType
  // analysis-time type check — see HtmlArticleText
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Psl.registeredDomainU8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Psl.registeredDomainU8($c)")

  override protected def withNewChildInternal(newChild: Expression): RegisteredDomainExpr =
    copy(child = newChild)
  override def prettyName: String = "registered_domain"
}

/** The parsed public suffix list: one static load per JVM. */
object Psl {

  // (normal rules, wildcard bases — the X of `*.X`, exception rules — the
  // body of `!rule`). ICANN and PRIVATE sections both included (github.io
  // style private registries group like registries for crawl dedup).
  private val (rules, wildcards, exceptions):
      (java.util.HashSet[String], java.util.HashSet[String], java.util.HashSet[String]) = {
    val r = new java.util.HashSet[String](16384)
    val w = new java.util.HashSet[String](256)
    val e = new java.util.HashSet[String](16)
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "embedded public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    // The list publishes IDN rules as unicode U-labels (`公司.cn`); hosts
    // arriving from crawled URLs are usually punycode A-labels
    // (`xn--55qx5d.cn`). Store BOTH forms so either host spelling matches.
    def addForms(set: java.util.HashSet[String], rule: String): Unit = {
      set.add(rule)
      if (rule.exists(_ > 0x7f))
        try set.add(java.net.IDN.toASCII(rule, java.net.IDN.ALLOW_UNASSIGNED))
        catch { case _: Exception => () }
    }
    try {
      for (raw <- src.getLines()) {
        // spec: everything after the first whitespace is ignorable; skip
        // comments and blanks
        val line = raw.takeWhile(c => !Character.isWhitespace(c))
        if (line.nonEmpty && !line.startsWith("//")) {
          if (line.startsWith("!")) addForms(e, line.substring(1))
          else if (line.startsWith("*.")) addForms(w, line.substring(2))
          else addForms(r, line)
        }
      }
    } finally src.close()
    (r, w, e)
  }

  /** Codegen/interpreted shared entry point. Expects a lowercased host. */
  def registeredDomainU8(host: UTF8String): UTF8String =
    if (host == null) null
    else UTF8String.fromString(registeredDomain(host.toString))

  def registeredDomain(host: String): String = {
    if (host == null || host.isEmpty) return ""
    // IP addresses are not DNS names — the PSL does not apply. Without this
    // guard an IPv4 host falls through to the implicit-* rule and every
    // host sharing its last two octets collapses into one bogus
    // "registered domain" ('10.0.0.1' and '192.168.0.1' → '0.1'). IPv6
    // literals carry ':' (bracketed or not).
    if (host.indexOf(':') >= 0) return ""
    // limit -1: Java's split('.') DROPS trailing empty strings, so the
    // empty-label guard below would miss a trailing dot ("example.com.")
    // while catching the symmetric leading one
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n == 0 || labels.exists(_.isEmpty)) return "" // leading/trailing dot
    // IPv4 literals in decimal AND hex/octal dotted forms ("0x7f.0.0.1")
    // — ASCII digits only: Char.isDigit accepts Unicode digits, which are
    // valid IDN label content, not IP octets
    def asciiDigits(l: String) = l.forall(c => c >= '0' && c <= '9')
    def hexOctet(l: String) = l.length > 2 && (l.startsWith("0x") || l.startsWith("0X")) &&
      l.drop(2).forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
    if (labels.forall(l => asciiDigits(l) || hexOctet(l))) return "" // IP literal
    // suffix starting at label i
    def suffix(i: Int): String =
      if (i == n - 1) labels(n - 1)
      else labels.slice(i, n).mkString(".")
    var excPs = -1 // public-suffix start via an exception rule
    var normPs = -1 // via the longest normal/wildcard rule
    var i = 0
    while (i < n && (excPs < 0 || normPs < 0)) {
      val s = suffix(i)
      if (excPs < 0 && exceptions.contains(s)) excPs = i + 1
      if (normPs < 0 &&
        (rules.contains(s) || (i + 1 < n && wildcards.contains(suffix(i + 1)))))
        normPs = i
      i += 1
    }
    // exceptions prevail; otherwise longest rule; otherwise the implicit `*`
    // rule (the bare TLD is the public suffix)
    val psStart = if (excPs >= 0) excPs else if (normPs >= 0) normPs else n - 1
    if (psStart == 0) "" // the host itself is a public suffix — unregistrable
    else suffix(psStart - 1)
  }
}
