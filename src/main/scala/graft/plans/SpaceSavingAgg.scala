package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving top-k / heavy-hitters sketch (Metwally, Agrawal &
  * El Abbadi 2005), the frequency-ESTIMATION companion of CMS that
  * returns the heavy keys THEMSELVES: m counters; a new key beyond
  * capacity evicts the current minimum and inherits its count as its
  * error bound. Guarantees (single stream): every key with true count
  * > n/m is retained, and min ≤ est ≤ min + n/m.
  *
  * Distributed use here is the TypedImperativeAggregate partial/merge
  * protocol (Agarwal et al. 2012 prove mergeability of this summary
  * class): merge sums counters keywise, where a key ABSENT from a
  * saturated summary contributes that summary's MINIMUM counter — the
  * upper bound of its possible evicted count — so the no-undercount
  * invariant (est ≥ true) survives merging (treating absent as 0
  * undercounts keys evicted in one partial — caught by the Zipf
  * property test); then trims back to m by keeping the top-m counts
  * (count desc, key asc — deterministic). Two regimes:
  *  - **exact** (m ≥ distinct keys — bounded-domain columns like
  *    brand/priority/shipmode): no eviction anywhere, every partial is
  *    the full exact count map, merge is exact addition ⇒ the output
  *    IS the exact top-k at ANY data scale, which is what the oracle
  *    gate checks.
  *  - **sketched** (m < distinct): heavy keys survive with bounded
  *    overestimate; the property test drives a Zipf stream through a
  *    random 8-way partitioning and asserts retention + error bounds.
  * Buffer is O(m); partials shuffle as ≤ m (key, count, err) triples.
  */
class SpaceSavingBuffer(val m: Int) extends Serializable {
  /** key -> (count, err) */
  val counters = new mutable.HashMap[String, (Long, Long)]()

  def add(key: String, w: Long = 1L): Unit = counters.get(key) match {
    case Some((c, e)) => counters.update(key, (c + w, e)); ()
    case None =>
      if (counters.size < m) { counters.update(key, (w, 0L)); () }
      else {
        var minK: String = null; var minC = Long.MaxValue
        counters.foreach { case (k, (c, _)) =>
          if (c < minC || (c == minC && (minK == null || k < minK))) {
            minK = k; minC = c
          }
        }
        counters.remove(minK)
        counters.update(key, (minC + w, minC))
        ()
      }
  }

  def merge(other: SpaceSavingBuffer): Unit = {
    // A saturated summary bounds any evicted key's count by its min
    // counter; an unsaturated one never evicted, so absent means 0.
    val minSelf =
      if (counters.size >= m) counters.valuesIterator.map(_._1).min else 0L
    val minOther =
      if (other.counters.size >= m) other.counters.valuesIterator.map(_._1).min
      else 0L
    val keys = counters.keySet ++ other.counters.keySet
    val merged = keys.iterator.map { k =>
      val (cA, eA) = counters.getOrElse(k, (minSelf, minSelf))
      val (cB, eB) = other.counters.getOrElse(k, (minOther, minOther))
      k -> (cA + cB, eA + eB)
    }.toSeq
    counters.clear()
    merged.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
      .foreach { case (k, v) => counters.update(k, v) }
    ()
  }

  /** Top-k by (count desc, key asc). */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq.sortBy { case (key, (c, _)) => (-c, key) }
      .take(k).map { case (key, (c, e)) => (key, c, e) }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m); out.writeInt(counters.size)
    counters.foreach { case (k, (c, e)) =>
      // Length-prefixed raw UTF-8, not writeUTF: writeUTF throws for keys
      // whose modified-UTF-8 encoding exceeds 65535 bytes, which a
      // long-string column can hit mid-shuffle.
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }
}

object SpaceSavingBuffer {
  def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      val k = new String(kb, "UTF-8")
      val c = in.readLong(); val e = in.readLong()
      b.counters.update(k, (c, e))
      i += 1
    }
    b
  }
}

/** `topk_heavy(col, m, k)`: array of (term, cnt, err) structs — the
  * k heaviest values by Space-Saving estimate (see
  * [[SpaceSavingBuffer]] for regimes/guarantees). Callers explode to
  * scalar rows for oracle gating. */
case class SpaceSavingTopK(child: Expression, m: Int, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {
  require(k <= m, s"k ($k) must be <= capacity m ($m)")

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(m)
  override def update(buf: SpaceSavingBuffer, row: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(row)
    // Stringify generically (like KmvSketch): non-string columns count by
    // their string form instead of throwing ClassCastException.
    if (v != null) buf.add(v match {
      case u: UTF8String => u.toString
      case other => other.toString
    })
    buf
  }
  override def merge(buf: SpaceSavingBuffer,
      other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.topK(k).map { case (term, c, e) =>
      InternalRow(UTF8String.fromString(term), c, e)
    })
  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.deserialize(bytes)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SpaceSavingTopK =
    copy(child = c)
}

object SpaceSavingTopK {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def of(c: Column, m: Int = 64, k: Int = 10): Column =
    column(SpaceSavingTopK(expression(c), m, k).toAggregateExpression())
}
