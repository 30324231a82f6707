package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass implementation of the reference's `normalize_text`
  * (`/root/reference/src/event_dedup/preprocessing/normalizer.py:16-67`).
  *
  * The declarative chain (lower → NFC → 7 literal umlaut replaces → regex
  * whitespace collapse → synonym replaces → regex punct strip → trim) makes
  * ~12 full passes over every document — the dominant per-row cost of the
  * extraction stage. This expression computes the identical bytes in two
  * passes (lowercase+NFC, then one fused walk), byte-parity enforced by the
  * golden tests against the reference's own output.
  *
  * Semantics notes (verified against the Python):
  *  - whitespace runs collapse to ONE space *before* punctuation deletion,
  *    so a deleted punctuation char between two spaces leaves TWO spaces
  *    ("a , b" → "a  b") — the walk flushes the pending space when it hits
  *    any non-whitespace char, punctuation included;
  *  - synonyms (when present) apply between whitespace collapse and punct
  *    strip, longest key first — that path splits the walk in two.
  */
case class NormalizeTextExpr(child: Expression, synonyms: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  // analysis-time type check (wrong-typed input must fail at analysis,
  // not as an executor-side ClassCastException mid-job)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else NormalizeTextExpr.normalizeU8(v.asInstanceOf[UTF8String], synonyms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val synRef = ctx.addReferenceObj("synonyms", synonyms, "scala.collection.immutable.Seq")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? UTF8String.EMPTY_UTF8
          : graft.functions.NormalizeTextExpr.normalizeU8(${childGen.value}, $synRef);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
  override def prettyName: String = "normalize_text"
}

object NormalizeTextExpr {

  /** Static entry point shared by interpreted and generated code. */
  def normalizeU8(s: UTF8String, synonyms: Seq[(String, String)]): UTF8String =
    UTF8String.fromString(normalize(s.toString, synonyms))

  /** Python `\s` on str: ASCII whitespace + 0x1c-0x1f + 0x85 + Unicode
    * space separators.
    */
  @inline def isPyWhitespace(c: Char): Boolean = {
    if (c == ' ' || (c >= '\u0009' && c <= '\u000d')) true
    else if (c < '\u001c') false
    else (c <= '\u001f') || c == '\u0085' || c == '\u00a0' || c == '\u1680' ||
      (c >= '\u2000' && c <= '\u200a') || c == '\u2028' || c == '\u2029' ||
      c == '\u202f' || c == '\u205f' || c == '\u3000'
  }

  @inline def isStrippedPunct(c: Char): Boolean = c match {
    case '"' | '\'' | '!' | '?' | ',' | '.' | ':' | ';' | '(' | ')' | '[' | ']' | '{' | '}' => true
    case _ => false
  }

  /** Append `c` (or its umlaut digraph) to `sb`. */
  @inline private def appendMapped(sb: java.lang.StringBuilder, c: Char): Unit = c match {
    case 'ä' | 'Ä' => sb.append("ae")
    case 'ö' | 'Ö' => sb.append("oe")
    case 'ü' | 'Ü' => sb.append("ue")
    case 'ß' => sb.append("ss")
    case other => sb.append(other)
  }

  /** Fused walk: umlaut expansion + whitespace collapse (+ optional punct
    * deletion) + trim, in one pass over the lowercased NFC string.
    */
  private def walk(s: String, dropPunct: Boolean): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPyWhitespace(c)) pendingSpace = true
      else {
        if (pendingSpace) {
          if (sb.length > 0) sb.append(' ')
          pendingSpace = false
        }
        if (!(dropPunct && isStrippedPunct(c))) appendMapped(sb, c)
      }
      i += 1
    }
    // final strip (punct deletion can leave a trailing space)
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }

  private def dropPunctAndStrip(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!isStrippedPunct(c)) sb.append(c)
      i += 1
    }
    var start = 0
    var end = sb.length
    while (start < end && sb.charAt(start) == ' ') start += 1
    while (end > start && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(start, end)
  }

  def normalize(raw: String, synonyms: Seq[(String, String)]): String = {
    if (raw.isEmpty) return ""
    val lowered = raw.toLowerCase(java.util.Locale.ROOT)
    val nfc =
      if (java.text.Normalizer.isNormalized(lowered, java.text.Normalizer.Form.NFC)) lowered
      else java.text.Normalizer.normalize(lowered, java.text.Normalizer.Form.NFC)
    if (synonyms.isEmpty) walk(nfc, dropPunct = true)
    else {
      var s = walk(nfc, dropPunct = false)
      val it = synonyms.iterator
      while (it.hasNext) {
        val (variant, canonical) = it.next()
        s = s.replace(variant, canonical)
      }
      dropPunctAndStrip(s)
    }
  }
}
