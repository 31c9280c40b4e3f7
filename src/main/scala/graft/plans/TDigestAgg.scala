package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable t-digest quantile sketch (TDIGEST / MERGE_TDIGEST agg kinds,
  * cpp/include/cudf/aggregation.hpp:113-114, tdigest_column_view.hpp;
  * Dunning & Ertl's merging-digest algorithm) as a
  * TypedImperativeAggregate — the partial/merge/final decomposition maps
  * 1:1 onto Spark's partial aggregation, so the sketch shuffles as a
  * compact binary buffer (like the reference's merge_tdigest path).
  *
  * `delta` is the compression (≙ reference's max_centroids); memory is
  * O(delta) regardless of input size.
  */
class TDigest(val delta: Int) extends Serializable {
  // Unmerged points are buffered and folded in at compress time.
  var means: Array[Double] = Array.empty
  var weights: Array[Double] = Array.empty
  private var bufM = new scala.collection.mutable.ArrayBuffer[Double]
  private var bufW = new scala.collection.mutable.ArrayBuffer[Double]

  def add(x: Double, w: Double = 1.0): Unit = {
    // NaN would poison every centroid mean at compress time and null
    // the final quantile; skip it (Spark's own percentile family also
    // never returns NaN-tainted results for a single bad row).
    if (x.isNaN) return
    bufM += x; bufW += w
    if (bufM.length >= 4 * delta) compress()
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      bufM += other.means(i); bufW += other.weights(i); i += 1
    }
    if (bufM.length >= 4 * delta) compress()
  }

  /** Dunning merging pass with the k1 scale function's q-capacity bound:
    * a centroid may absorb weight while 4·n·q(1-q)/delta stays above its
    * size (bounded-error invariant near the tails). */
  def compress(): Unit = {
    if (bufM.isEmpty) return
    val m = means ++ bufM
    val w = weights ++ bufW
    bufM = new scala.collection.mutable.ArrayBuffer[Double]
    bufW = new scala.collection.mutable.ArrayBuffer[Double]
    val order = m.indices.sortBy(m(_))
    val total = w.sum
    val outM = new scala.collection.mutable.ArrayBuffer[Double]
    val outW = new scala.collection.mutable.ArrayBuffer[Double]
    var curM = m(order.head); var curW = w(order.head)
    var seen = 0.0
    order.tail.foreach { idx =>
      val q = (seen + curW / 2) / total
      val cap = math.max(1.0, 4.0 * total * q * (1 - q) / delta)
      if (curW + w(idx) <= cap) {
        // weighted mean update
        curM = (curM * curW + m(idx) * w(idx)) / (curW + w(idx))
        curW += w(idx)
      } else {
        outM += curM; outW += curW; seen += curW
        curM = m(idx); curW = w(idx)
      }
    }
    outM += curM; outW += curW
    means = outM.toArray; weights = outW.toArray
  }

  /** Interpolated quantile over centroid midpoints. */
  def quantile(q: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val total = weights.sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2
        val t = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + t * (means(i) - means(i - 1))
      }
      cum += weights(i); i += 1
    }
    means.last
  }

  def serialize(): Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(delta); out.writeInt(means.length)
    means.foreach(out.writeDouble); weights.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }
}

object TDigest {
  /** Catalyst numeric → double, including DecimalType (whose runtime
    * value is o.a.s.sql.types.Decimal, NOT java.lang.Number — a bare
    * Number cast throws ClassCastException on decimal columns). */
  def numericValue(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"tdigest expects a numeric input, got ${other.getClass.getName}")
  }

  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigest(in.readInt())
    val n = in.readInt()
    d.means = Array.fill(n)(in.readDouble())
    d.weights = Array.fill(n)(in.readDouble())
    d
  }
}

case class TDigestQuantile(child: Expression, percentage: Double, delta: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigest = new TDigest(delta)
  override def update(buf: TDigest, row: org.apache.spark.sql.catalyst.InternalRow): TDigest = {
    val v = child.eval(row)
    if (v != null) buf.add(TDigest.numericValue(v))
    buf
  }
  override def merge(buf: TDigest, other: TDigest): TDigest = { buf.merge(other); buf }
  override def eval(buf: TDigest): Any = {
    val q = buf.quantile(percentage)
    if (q.isNaN) null else q
  }
  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestQuantile =
    copy(child = c)
}

object TDigestQuantile {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  /** tdigest_quantile(col, q, delta) as a Column aggregate. */
  def of(c: Column, q: Double, delta: Int = 100): Column =
    column(TDigestQuantile(expression(c), q, delta).toAggregateExpression())
}

/** TDIGEST as a VALUE (cpp/include/cudf/aggregation.hpp:113 — the agg
  * that RETURNS the digest, not a quantile): aggregates doubles into a
  * serialized digest BinaryType column. The incremental-sketch-table
  * pattern at 100 TB: materialize per-partition/per-day digests once,
  * answer any later quantile by merging digests (never rescanning the
  * raw column) via [[TDigestMergeQuantile]]. */
case class TDigestSketch(child: Expression, delta: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigest = new TDigest(delta)
  override def update(buf: TDigest, row: org.apache.spark.sql.catalyst.InternalRow): TDigest = {
    val v = child.eval(row)
    if (v != null) buf.add(TDigest.numericValue(v))
    buf
  }
  override def merge(buf: TDigest, other: TDigest): TDigest = { buf.merge(other); buf }
  override def eval(buf: TDigest): Any = buf.serialize()
  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): TDigestSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestSketch =
    copy(child = c)
}

/** MERGE_TDIGEST (cpp/include/cudf/aggregation.hpp:114): aggregates a
  * column of serialized digests (from [[TDigestSketch]]) by digest
  * merge, evaluating to the requested quantile. Rollup pattern:
  * fine-grained sketch table → coarser quantiles without touching raw
  * data. Input digests may use any delta; the MERGE BUFFER always uses this
  * aggregate's own `delta` parameter (centroids fold through its k1
  * capacity rule), so rollup accuracy is governed by the delta passed
  * HERE — pass one at least as large as the stored sketches' to keep
  * their resolution. */
case class TDigestMergeQuantile(child: Expression, percentage: Double,
    delta: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigest = new TDigest(delta)
  override def update(buf: TDigest, row: org.apache.spark.sql.catalyst.InternalRow): TDigest = {
    val v = child.eval(row)
    if (v != null) buf.merge(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: TDigest, other: TDigest): TDigest = { buf.merge(other); buf }
  override def eval(buf: TDigest): Any = {
    val q = buf.quantile(percentage)
    if (q.isNaN) null else q
  }
  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestMergeQuantile =
    copy(child = c)
}

object TDigestSketch {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  /** tdigest_sketch(col, delta): serialized digest as a binary column. */
  def of(c: Column, delta: Int = 100): Column =
    column(TDigestSketch(expression(c), delta).toAggregateExpression())
  /** merge_tdigest_quantile(sketchCol, q): quantile from merged digests. */
  def mergeQuantile(c: Column, q: Double, delta: Int = 100): Column =
    column(TDigestMergeQuantile(expression(c), q, delta).toAggregateExpression())
}
