package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-walk implementations of the Unicode-whitespace tokenizer
  * surface ([[TextFunctions.WhitespaceClass]]).
  *
  * The declarative forms — `filter(split(coalesce(text,''), WS+), t =>
  * length(t) > 0)`, `trim(regexp_replace(text, WS+, ' '))` and the padded
  * double-space stopword occurrence count — each cost one or more
  * `java.util.regex` passes per evaluation, and Catalyst re-evaluates the
  * split inside every consumer that cannot share it (the n-gram slices of
  * [[graft.operators.WebCorpus.ngrams]] re-ran it 4× per row in the q42/q44
  * plans). These expressions walk the UTF-8 bytes exactly once (guide §4:
  * make the per-row work cheap once the job shape is right); the declarative
  * chains remain in [[TextFunctions]] / [[graft.operators.TextAnalysis]] as
  * the semantic spec, and `WsTextSpec` differential-tests byte equality on
  * generated + adversarial corpora.
  *
  * Byte-walk safety: every whitespace code point in the class is ≤ U+3000,
  * so a 4-byte UTF-8 sequence can never be whitespace; ASCII bytes never
  * occur inside multi-byte sequences, so scanning is resynchronizing.
  */
object WsText {

  /** Exactly the code points of [[TextFunctions.WhitespaceClass]]:
    * Java `\s` ([ \t\n\x0B\f\r]) + 0x1c-0x1f, 0x85, 0xa0, 0x1680,
    * 0x2000-0x200a, 0x2028, 0x2029, 0x202f, 0x205f, 0x3000.
    */
  @inline private[functions] def isWs(cp: Int): Boolean =
    if (cp < 0x80)
      (cp >= 0x09 && cp <= 0x0d) || cp == 0x20 || (cp >= 0x1c && cp <= 0x1f)
    else
      cp == 0x85 || cp == 0xa0 || cp == 0x1680 ||
        (cp >= 0x2000 && cp <= 0x200a) || cp == 0x2028 || cp == 0x2029 ||
        cp == 0x202f || cp == 0x205f || cp == 0x3000

  /** Decode the code point starting at byte i; returns (cp << 3) | byteLen.
    * Malformed/truncated sequences decode as a non-whitespace sentinel of
    * length 1 (corpora are valid UTF-8 by construction; the regex path's
    * behavior on malformed bytes is equally undefined).
    */
  @inline private def cpAt(base: Object, off: Long, nb: Int, i: Int): Int = {
    val b0 = Platform.getByte(base, off + i)
    if ((b0 & 0x80) == 0) ((b0 & 0x7f) << 3) | 1
    else if ((b0 & 0xe0) == 0xc0 && i + 1 < nb) {
      val cp = ((b0 & 0x1f) << 6) | (Platform.getByte(base, off + i + 1) & 0x3f)
      (cp << 3) | 2
    } else if ((b0 & 0xf0) == 0xe0 && i + 2 < nb) {
      val cp = ((b0 & 0x0f) << 12) |
        ((Platform.getByte(base, off + i + 1) & 0x3f) << 6) |
        (Platform.getByte(base, off + i + 2) & 0x3f)
      (cp << 3) | 3
    } else if ((b0 & 0xf8) == 0xf0 && i + 3 < nb) (0x10000 << 3) | 4
    else (0xfffd << 3) | 1 // malformed: non-ws, advance 1
  }

  /** Walk `text` once, invoking `onToken(startByte, endByteExcl)` for every
    * maximal run of non-whitespace code points.
    */
  @inline private[functions] def forEachToken(text: UTF8String)(onToken: (Int, Int) => Unit): Unit = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes()
    var i = 0
    var start = -1
    while (i < nb) {
      val enc = cpAt(base, off, nb, i)
      val ws = isWs(enc >>> 3)
      if (ws) {
        if (start >= 0) { onToken(start, i); start = -1 }
      } else if (start < 0) start = i
      i += enc & 7
    }
    if (start >= 0) onToken(start, nb)
  }

  @inline private[functions] def sliceBytes(text: UTF8String, start: Int, end: Int): UTF8String = {
    val len = end - start
    val bytes = new Array[Byte](len)
    Platform.copyMemory(text.getBaseObject, text.getBaseOffset + start,
      bytes, Platform.BYTE_ARRAY_OFFSET, len)
    UTF8String.fromBytes(bytes)
  }
}

/** `filter(split(coalesce(text, ''), WS+, -1), t => length(t) > 0)` in one
  * byte-walk. NULL input → empty array (the declarative form coalesces).
  */
case class WsTokens(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  // containsNull = true matches the declarative filter(split(...)) type
  // bit-for-bit so downstream schemas (explode output nullability) can't
  // drift from what the oracle rows were hashed against
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) empty else compute(v.asInstanceOf[UTF8String])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  private def compute(text: UTF8String): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    WsText.forEachToken(text)((s, e) => out += WsText.sliceBytes(text, s, e))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
  override def prettyName: String = "ws_tokens"
}

/** `trim(regexp_replace(text, WS+, ' '))` in one byte-walk: tokens joined by
  * single ASCII spaces (the replacement makes every leading/trailing/run
  * whitespace a space, which trim then strips). NULL → NULL.
  */
case class CollapseWs(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val nb = text.numBytes()
    val buf = new Array[Byte](nb)
    var n = 0
    WsText.forEachToken(text) { (s, e) =>
      if (n > 0) { buf(n) = 0x20; n += 1 }
      Platform.copyMemory(text.getBaseObject, text.getBaseOffset + s,
        buf, Platform.BYTE_ARRAY_OFFSET + n, e - s)
      n += e - s
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(buf, n))
  }

  override protected def withNewChildInternal(newChild: Expression): CollapseWs =
    copy(child = newChild)
  override def prettyName: String = "collapse_ws"
}

/** Stopword hit count: number of whitespace tokens whose lowercase equals a
  * member of `words`, as DOUBLE — the fused form of
  * [[graft.operators.TextAnalysis.stopwordHits]]'s per-word padded
  * occurrence counts (each word cost a full regexp_replace + replace pass;
  * the sum over a language list is exactly the count of tokens in the set,
  * since a token equals at most one distinct word). Lowercasing per token
  * uses the same UTF8String.toLowerCase as `lower()`, and no lowercase
  * mapping produces a whitespace char, so tokens(lower(text)) ≡
  * map(lower, tokens(text)). NULL → NULL (concat over a null column).
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  require(words.nonEmpty, "use lit(0.0) for an empty stopword list")

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)): Unit)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    var hits = 0L
    WsText.forEachToken(text) { (s, e) =>
      if (wordSet.contains(WsText.sliceBytes(text, s, e).toLowerCase)) hits += 1
    }
    hits.toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
  override def prettyName: String = "stopword_hits"
}
