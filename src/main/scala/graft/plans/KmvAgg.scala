package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  * 2002; Beyer et al. 2007 unbiased estimator) — the ORACLE-CHECKABLE
  * member of the sketch family: where HLL and CMS estimates are
  * engine-implementation-specific, KMV over the portable md5-60 hash
  * ([[PortableHash]] contract) is a pure function of the input SET —
  * "the k smallest distinct hash values" — so DuckDB replays the sketch
  * AND the estimate bit for bit (ORDER BY hash LIMIT k + the same
  * (k−1)·2^60 / h_k arithmetic).
  *
  * Estimator: exact |S| while |S| < k (the sketch IS the distinct set);
  * else (k−1)·2^60 / h_k where h_k is the k-th smallest hash. Standard
  * error ≈ 1/√(k−2): k=256 → ~6%. Buffer is a bounded TreeSet —
  * O(k) memory, order-insensitive inserts, mergeable (union + trim) —
  * so it partial-aggregates and shuffles as ≤ 8k bytes.
  */
class KmvBuffer(val k: Int) extends Serializable {
  val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last()) {
      if (mins.add(h)) { mins.remove(mins.last()); () }
    }
  }

  def merge(other: KmvBuffer): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) add(it.next())
  }

  /** (k−1)·2^60 / h_k, or the exact count below saturation. */
  def estimate: Double =
    if (mins.size < k) mins.size.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / mins.last().toDouble

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(mins.size)
    val it = mins.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }
}

object KmvBuffer {
  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.mins.add(in.readLong()); i += 1 }
    b
  }
}

/** `kmv_distinct(col, k)`: portable distinct-count estimate (see
  * [[KmvBuffer]]). Input values hash by their STRING form (cast
  * explicitly for non-strings so both engines stringify identically);
  * nulls are skipped like COUNT(DISTINCT). */
case class KmvDistinct(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buf: KmvBuffer,
      row: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      buf.add(PortableHash.md5_60(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    buf
  }
  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: KmvBuffer): Any = buf.estimate
  override def serialize(buf: KmvBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinct =
    copy(child = c)
}

object KmvDistinct {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def of(c: Column, k: Int = 256): Column =
    column(KmvDistinct(expression(c), k).toAggregateExpression())
}
