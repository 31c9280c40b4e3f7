package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece subword tokenizer (cpp/include/nvtext/wordpiece_tokenize.hpp;
  * byte_pair_encoding.hpp is the same query surface): greedy
  * longest-match-first against a vocabulary, continuation pieces prefixed
  * "##", unknown words → [UNK].
  *
  * Two vocab regimes: inline `vocab` ships inside the expression (task
  * closure — fine at typical 30-50k subword sizes, like the reference's
  * device-resident vocab); `broadcastVocab` ships via TorrentBroadcast
  * once per executor with only the handle in the plan/closure — the
  * regime for 100k+ vocabularies.
  */
case class WordPieceTokenize(child: Expression, vocab: Seq[String] = Nil,
    broadcastVocab: Option[
      org.apache.spark.broadcast.Broadcast[Array[String]]] = None,
    doLowerCase: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wordpiece_tokenize needs string, got ${child.dataType}")

  @transient private lazy val entries: Seq[String] =
    broadcastVocab.map(_.value.toSeq).getOrElse(vocab)
  @transient private lazy val vocabSet: Set[String] = entries.toSet
  @transient private lazy val maxLen: Int =
    if (entries.isEmpty) 0 else entries.map(_.stripPrefix("##").length).max

  private def tokenizeWord(word: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = math.min(word.length, start + maxLen)
      var piece: String = null
      while (end > start && piece == null) {
        val cand = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocabSet.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return Seq("[UNK]")
      out += piece
      start = end
    }
    out.toSeq
  }

  override def nullSafeEval(v: Any): Any = {
    // doLowerCase mirrors BERT's uncased/cased pipelines: true (default)
    // for uncased vocabs; FALSE for cased vocabs, whose entries would
    // otherwise never match and collapse every cased word to [UNK].
    val text = if (doLowerCase) v.toString.toLowerCase(java.util.Locale.ROOT)
      else v.toString
    val words = text.split("\\s+").filter(_.nonEmpty)
    val pieces = words.flatMap(tokenizeWord)
    new GenericArrayData(pieces.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(c: Expression): WordPieceTokenize =
    copy(child = c)
}

object WordPieceTokenize {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def apply(c: Column, vocab: Seq[String]): Column =
    column(WordPieceTokenize(expression(c), vocab))

  /** Broadcast-vocab mode for large vocabularies: ships the entries once
    * per executor; the expression holds only the broadcast handle. */
  def broadcast(c: Column, spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[String]): Column =
    column(WordPieceTokenize(expression(c), Nil,
      Some(spark.sparkContext.broadcast(vocab.toArray))))
}
