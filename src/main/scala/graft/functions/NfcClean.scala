package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression canonicalizing crawl text: Unicode NFC
  * normalization followed by control-character stripping.
  *
  * Crawl text arrives with the same visible string in multiple byte
  * encodings — `é` as U+00E9 or as `e` + U+0301 — which defeats every
  * hash-keyed operator in this library (exact dedup d1, shingle
  * decontamination d17, vocabulary d19 all key on bytes). NFC composes
  * to the canonical form so equal-looking text hashes equally.
  * Control characters (C0 except `\t`/`\n`, DEL, C1: the codepoint
  * ranges 00–08, 0B–1F, 7F–9F) are terminal-escape and encoding debris
  * with no linguistic content; they are removed outright.
  *
  * WHY an Expression: Spark has no NFC builtin (the JDK's
  * `java.text.Normalizer` is the standard implementation), and a UDF
  * would break whole-stage codegen on what is by definition a
  * every-row-of-the-corpus map. The fast path short-circuits: ASCII
  * text with no control characters (the overwhelming majority of a
  * real corpus, and `Normalizer.isNormalized`'s cheap prefix) returns
  * the input UTF8String unchanged with zero allocation.
  *
  * Parity: DuckDB's `nfc_normalize` + a codepoint-class
  * `regexp_replace` compute the identical result (driver-gated via
  * d63; the fixture corpus is ASCII so the gate pins the identity
  * path, and `FunctionsSpec` plants combining marks, C1 debris, and
  * astral-plane text for the real cases — same split as d26's PII
  * fixtures).
  */
case class NfcClean(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_clean"

  override def nullSafeEval(input: Any): Any =
    NfcClean.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcClean.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.clean($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcClean =
    copy(child = newChild)
}

object NfcClean {

  /** True for the stripped codepoint classes: C0 minus `\t`/`\n`, DEL,
    * C1. Public because generated code calls [[clean]]. */
  private def isStripped(cp: Int): Boolean =
    (cp < 0x20 && cp != '\t' && cp != '\n') || (cp >= 0x7F && cp <= 0x9F)

  /** NFC-normalize and strip control codepoints. Zero-allocation when
    * the input is pure printable ASCII (always NFC, nothing to strip). */
  def clean(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var asciiClean = true
    while (asciiClean && i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b >= 0x80 || isStripped(b)) asciiClean = false
      i += 1
    }
    if (asciiClean) return s
    val nfc = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
    val out = new java.lang.StringBuilder(nfc.length)
    var j = 0
    while (j < nfc.length) {
      val cp = nfc.codePointAt(j)
      if (!isStripped(cp)) out.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }

  /** Column-level entry point: `NfcClean(text)`. */
  def apply(text: Column): Column =
    GraftColumns.column(NfcClean(GraftColumns.expression(text)))
}
