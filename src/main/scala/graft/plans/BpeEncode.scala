package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (cpp/include/nvtext/byte_pair_encoding.hpp): the
  * real merge-table algorithm — start from characters, repeatedly apply
  * the lowest-ranked adjacent merge until none applies. Rank lookup is a
  * hash map, cost O(word² · merges-applied) per word, linear in corpus
  * size overall.
  *
  * Two merge-table regimes (load_merge_pairs is unbounded in the
  * reference):
  *  - inline `merges`: the table ships inside the expression (task
  *    closure) — fine up to ~50k pairs;
  *  - `broadcastMerges`: a Broadcast handle — the table ships via
  *    TorrentBroadcast ONCE per executor and the plan/closure carries
  *    only the id, the regime for 100k+ production merge tables.
  */
case class BpeEncode(child: Expression,
    merges: Seq[(String, String)] = Nil,
    broadcastMerges: Option[
      org.apache.spark.broadcast.Broadcast[Array[(String, String)]]] = None)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rank: Map[(String, String), Int] =
    broadcastMerges match {
      case Some(bc) => bc.value.iterator.zipWithIndex.toMap
      case None => merges.zipWithIndex.toMap
    }

  private def encodeWord(word: String): Vector[String] = {
    var toks = word.map(_.toString).toVector
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue; var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bestIdx = i }
        i += 1
      }
      if (bestIdx == -1) done = true
      else {
        val (a, b) = (toks(bestIdx), toks(bestIdx + 1))
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        if (toks.length < 2) done = true
      }
    }
    toks
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    val pieces = words.toSeq.flatMap(encodeWord)
    new GenericArrayData(pieces.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object BpeEncode {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncode(expression(c), merges))

  /** Broadcast-merges mode for large tables: ships the pairs once per
    * executor; the expression (and its plan rendering) holds only the
    * broadcast handle. */
  def broadcast(c: Column, spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): Column =
    column(BpeEncode(expression(c), Nil,
      Some(spark.sparkContext.broadcast(merges.toArray))))
}
