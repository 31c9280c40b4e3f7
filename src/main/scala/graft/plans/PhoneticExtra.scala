package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NYSIIS (Taft 1970 — the New York State Identification and
  * Intelligence System key, the census-lineage companion of Soundex
  * that preserves vowel POSITIONS as 'A') and Refined Soundex (the
  * higher-resolution Soundex variant that codes every letter and keeps
  * full length). Both follow the rule sets as standardized by Apache
  * commons-codec 1.x; the test suite referees both against
  * commons-codec on fixtures + fuzz (same contract as
  * [[DoubleMetaphoneImpl]]).
  */
object PhoneticExtraImpl {
  private val Vowels = "AEIOU"
  private def isVowel(c: Char): Boolean = Vowels.indexOf(c) >= 0

  private def clean(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) { sb.append(Character.toUpperCase(c)); () }
      i += 1
    }
    sb.toString
  }

  /** NYSIIS key; strict = truncate to 6 (commons-codec default). */
  def nysiis(input: String, strict: Boolean = true): String = {
    if (input == null) return null
    var str = clean(input)
    if (str.isEmpty) return str
    // first-character transcodes
    str = str.replaceFirst("^MAC", "MCC").replaceFirst("^KN", "NN")
      .replaceFirst("^K", "C").replaceFirst("^(PH|PF)", "FF")
      .replaceFirst("^SCH", "SSS")
    // last-character transcodes
    str = str.replaceFirst("(EE|IE)$", "Y")
      .replaceFirst("(DT|RT|RD|NT|ND)$", "D")
    val key = new java.lang.StringBuilder(str.length)
    key.append(str.charAt(0))
    val chars = str.toCharArray
    val len = chars.length
    var i = 1
    while (i < len) {
      val next = if (i < len - 1) chars(i + 1) else ' '
      val aNext = if (i < len - 2) chars(i + 2) else ' '
      val prev = chars(i - 1)
      val curr = chars(i)
      val transcoded: Array[Char] =
        if (curr == 'E' && next == 'V') Array('A', 'F')
        else if (isVowel(curr)) Array('A')
        else if (curr == 'Q') Array('G')
        else if (curr == 'Z') Array('S')
        else if (curr == 'M') Array('N')
        else if (curr == 'K') { if (next == 'N') Array('N', 'N') else Array('C') }
        else if (curr == 'S' && next == 'C' && aNext == 'H') Array('S', 'S', 'S')
        else if (curr == 'P' && next == 'H') Array('F', 'F')
        else if (curr == 'H' && (!isVowel(prev) || !isVowel(next))) Array(prev)
        else if (curr == 'W' && isVowel(prev)) Array(prev)
        else Array(curr)
      System.arraycopy(transcoded, 0, chars, i, transcoded.length)
      if (chars(i) != key.charAt(key.length - 1)) { key.append(chars(i)); () }
      i += 1
    }
    if (key.length > 1) {
      if (key.charAt(key.length - 1) == 'S') { key.deleteCharAt(key.length - 1); () }
      if (key.length > 2 && key.charAt(key.length - 1) == 'Y' &&
          key.charAt(key.length - 2) == 'A') {
        key.deleteCharAt(key.length - 2); ()
      }
      if (key.length > 0 && key.charAt(key.length - 1) == 'A') {
        key.deleteCharAt(key.length - 1); ()
      }
    }
    val out = key.toString
    if (strict && out.length > 6) out.substring(0, 6) else out
  }

  /** Refined Soundex: first letter + a digit per letter (consecutive
    * duplicate codes collapsed), no length cap. */
  private val RsMap = "01360240043788015936020505" // A..Z
  def refinedSoundex(input: String): String = {
    if (input == null) return null
    val str = clean(input)
    if (str.isEmpty) return str
    val sb = new java.lang.StringBuilder(str.length + 1)
    sb.append(str.charAt(0))
    var last = '*'
    var i = 0
    while (i < str.length) {
      val code = RsMap.charAt(str.charAt(i) - 'A')
      if (code != last) { sb.append(code); () }
      last = code
      i += 1
    }
    sb.toString
  }
}

/** `nysiis(s)` / `refined_soundex(s)` scalar expressions (codegen
  * static calls, same pattern as [[Metaphone]]). */
case class NysiisExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nysiis needs string, got ${child.dataType}")
  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      PhoneticExtraImpl.nysiis(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.PhoneticExtraImpl.nysiis($s.toString(), true));""".stripMargin)
  override protected def withNewChildInternal(c: Expression): NysiisExpr =
    copy(child = c)
}

case class RefinedSoundexExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"refined_soundex needs string, got ${child.dataType}")
  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      PhoneticExtraImpl.refinedSoundex(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.PhoneticExtraImpl.refinedSoundex($s.toString()));""".stripMargin)
  override protected def withNewChildInternal(c: Expression): RefinedSoundexExpr =
    copy(child = c)
}
