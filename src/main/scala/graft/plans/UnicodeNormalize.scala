package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization form conversion (NFC/NFD/NFKC/NFKD) — the
  * canonical-composition half of the reference's character normalizer
  * (cpp/include/nvtext/normalize.hpp:51-90). Full codegen: the generated
  * code is a single static call into java.text.Normalizer, so this stays
  * inside WholeStageCodegen as a map stage. DuckDB's `nfc_normalize`
  * makes the NFC form oracle-checkable. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form $form")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Normalizer.normalize(v.toString,
      Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = CodeGenerator.javaType(dataType)
      s"""${ev.value} = (${res}) org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

object UnicodeNormalize {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def apply(c: Column, form: String): Column =
    column(UnicodeNormalize(expression(c), form))
  def nfc(c: Column): Column = apply(c, "NFC")
}

/** Full character normalizer (nvtext/normalize.hpp:51-90 /
  * character_normalizer): BERT basic-tokenizer semantics —
  *  - whitespace (\t \n \r …) → single space
  *  - control characters (categories Cc / Cf) removed
  *  - punctuation (category P*, plus the non-alphanumeric ASCII range)
  *    and CJK-block characters padded with one space on each side
  *  - if `doLowerCase`: lower-cased with accents stripped (NFD → drop
  *    combining marks, matching the reference's lower≡de-accent coupling)
  *  - `specialTokens` (e.g. "[CLS]", "[MASK]"; bracketed, upper-case)
  *    are protected from the `[` / `]` padding and emitted verbatim.
  *
  * String-manipulation-heavy → CodegenFallback (same policy as
  * WordPieceTokenize); still a pure map stage, no shuffle. */
case class CharacterNormalize(child: Expression, doLowerCase: Boolean,
    specialTokens: Seq[String]) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  @transient private lazy val special = specialTokens.toSet

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  private def isPunct(cp: Int): Boolean = {
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) return true
    Character.getType(cp) match {
      case Character.CONNECTOR_PUNCTUATION | Character.DASH_PUNCTUATION |
           Character.START_PUNCTUATION | Character.END_PUNCTUATION |
           Character.INITIAL_QUOTE_PUNCTUATION |
           Character.FINAL_QUOTE_PUNCTUATION |
           Character.OTHER_PUNCTUATION => true
      case _ => false
    }
  }

  private def stripMarks(s: String): String = {
    // Code-point iteration: a per-Char filter would misclassify
    // supplementary-plane combining marks (surrogate halves are not
    // marks individually).
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        out.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    out.toString
  }

  private def normalizeSegment(seg: String, sb: java.lang.StringBuilder): Unit = {
    val s =
      if (doLowerCase)
        // Locale.ROOT: the default locale would turn 'I' into dotless
        // 'ı' on a Turkish-locale executor, diverging from the
        // reference's locale-independent BERT normalizer
        stripMarks(Normalizer.normalize(
          seg.toLowerCase(java.util.Locale.ROOT), Normalizer.Form.NFD))
      else seg
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val tpe = Character.getType(cp)
      if (Character.isWhitespace(cp)) sb.append(' ')
      else if (tpe == Character.CONTROL || tpe == Character.FORMAT) ()
      else if (isPunct(cp) || isCjk(cp)) {
        sb.append(' '); sb.appendCodePoint(cp); sb.append(' ')
      } else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.toString
    val sb = new java.lang.StringBuilder(text.length + 16)
    // Process WHOLE segments between special tokens (one lowercase+NFD
    // pass per segment, not per code point — this is a per-row map stage
    // on the 100 TB text path).
    var i = 0
    var segStart = 0
    while (i < text.length) {
      // Special-token protection: "[TOK]" at this position passes through
      // unpadded (reference: no padding after '[' / before ']').
      val tok =
        if (text.charAt(i) == '[') {
          val end = text.indexOf(']', i)
          if (end > i && special.contains(text.substring(i, end + 1)))
            text.substring(i, end + 1)
          else null
        } else null
      if (tok != null) {
        if (segStart < i) normalizeSegment(text.substring(segStart, i), sb)
        sb.append(' ').append(tok).append(' ')
        i += tok.length
        segStart = i
      } else i += 1
    }
    if (segStart < text.length) normalizeSegment(text.substring(segStart), sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): CharacterNormalize =
    copy(child = c)
}

object CharacterNormalize {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def apply(c: Column, doLowerCase: Boolean = true,
      specialTokens: Seq[String] = Nil): Column =
    column(CharacterNormalize(expression(c), doLowerCase, specialTokens))
}
