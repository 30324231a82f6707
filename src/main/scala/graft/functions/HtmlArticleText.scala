package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused html→text extraction for the deterministic page wrapper
  * (SURVEY.md §2.2 P9): UTF-8 decode → `<article>…</article>` slice →
  * tag strip (each tag → one space) → entity unescape (&lt; &gt; &amp;).
  *
  * Replaces a 2-regex + 3-replace Column chain with one indexOf + one char
  * walk — regex on 1.5 KB html bytes was a top cost of the extraction
  * stage. Differential-tested against the declarative chain.
  */
case class HtmlArticleText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  // analysis-time type check: without it a STRING child type-checks and
  // then dies mid-job with an executor-side ClassCastException
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HtmlArticleText.extractU8(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlArticleText.extractU8($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlArticleText =
    copy(child = newChild)
  override def prettyName: String = "html_article_text"
}

object HtmlArticleText {

  /** Static entry point shared by interpreted and generated code.
    * Invalid UTF-8 decodes to U+FFFD replacement characters (Java/Python
    * `str` semantics — what the reference sees after its own decode step),
    * whereas the declarative spec chain's binary→string CAST passes raw
    * bytes through unvalidated: the differential-parity contract with that
    * chain therefore covers valid-UTF-8 inputs; on malformed bytes THIS
    * kernel's replacement behavior is the defined semantics.
    */
  def extractU8(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(extract(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))

  def extract(html: String): String = {
    val open = html.indexOf("<article>")
    if (open < 0) return ""
    val start = open + "<article>".length
    val close = html.lastIndexOf("</article>")
    if (close < start) return ""
    val body = html.substring(start, close)
    // tag strip: every <...> span becomes a single space (regex parity with
    // regexp_replace(body, "<[^>]*>", " "))
    val sb = new java.lang.StringBuilder(body.length)
    var i = 0
    var tagStart = -1
    while (i < body.length) {
      val c = body.charAt(i)
      if (tagStart >= 0) { if (c == '>') tagStart = -1 }
      else if (c == '<') { tagStart = i; sb.append(' ') }
      else sb.append(c)
      i += 1
    }
    // regex parity on an unclosed '<': "<[^>]*>" never matches a tag with
    // no closing '>', so the '<' and everything after it stay verbatim —
    // the walk must not silently swallow the document's tail (real crawl
    // html has stray '<'s; the generator's escaped output never does)
    if (tagStart >= 0) {
      sb.setLength(sb.length - 1) // undo the space appended for that '<'
      sb.append(body, tagStart, body.length)
    }
    // entity unescape, reference order: &lt; then &gt; then &amp;
    sb.toString.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
  }
}
