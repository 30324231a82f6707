package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Reference analog: `unicodedata.normalize("NFC", text)` inside
  * `/root/reference/src/event_dedup/preprocessing/normalizer.py:43` — merges
  * decomposed umlaut forms (a + U+0308) into composed codepoints before the
  * umlaut→digraph expansion, so both forms normalize identically.
  *
  * Spark has no built-in NFC function, so this wraps
  * `java.text.Normalizer` (the JDK's ICU-derived implementation of UAX #15 —
  * same algorithm as Python's `unicodedata`). Codegen-enabled: the generated
  * code calls the static helper below, keeping the expression inside
  * whole-stage codegen spans.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = StringType
  // analysis-time type check — see HtmlArticleText
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Static entry point shared by interpreted and generated code paths. */
  def normalize(s: UTF8String): UTF8String = {
    // Fast path ON THE RAW BYTES: pure ASCII is always NFC already, and
    // checking bytes avoids the per-row UTF-8 decode + String allocation
    // the fast path exists to skip.
    if (isAsciiBytes(s)) return s
    val str = s.toString
    // Composed non-ASCII text (the common case for German crawl data) is
    // usually NFC already — isNormalized skips the re-normalization copy,
    // same gate NormalizeTextExpr.normalize uses.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private def isAsciiBytes(s: UTF8String): Boolean = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < nb) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
}
