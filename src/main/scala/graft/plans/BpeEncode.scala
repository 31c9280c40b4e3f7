package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (cpp/include/nvtext/byte_pair_encoding.hpp): the
  * real merge-table algorithm — start from characters, repeatedly apply
  * the lowest-ranked adjacent merge until none applies. The merge table
  * ships inside the expression (≙ the reference's device-resident merge
  * pairs); rank lookup is a hash map, cost O(word² · merges-applied)
  * per word, linear in corpus size overall.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

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
}
