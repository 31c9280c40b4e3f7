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
  /** The ONE stringify + portable-md5-60 ingestion contract shared by
    * KmvDistinct and KmvSketch — the DuckDB oracles replay exactly
    * this pipeline, so the two aggregates must never diverge. */
  def addValue(buf: KmvBuffer, v: Any): KmvBuffer = {
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
      row: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer =
    KmvBuffer.addValue(buf, child.eval(row))
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

/** `kmv_sketch(col, k)`: the KMV sketch itself as a storable BINARY
  * column — the theta-sketch role (Dasgupta et al. 2016): build once
  * per partition/day/source, persist, then combine with SET ALGEBRA
  * ([[KmvSetEst]]) without re-reading the data. Same portable-hash
  * contract as [[KmvDistinct]], so sketch CONTENT is oracle-replayable
  * (the k smallest distinct md5-60 values). */
case class KmvSketch(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buf: KmvBuffer,
      row: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer =
    KmvBuffer.addValue(buf, child.eval(row))
  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }
  override def eval(buf: KmvBuffer): Any = buf.serialize()
  override def serialize(buf: KmvBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvSketch =
    copy(child = c)
}

object KmvSketch {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def of(c: Column, k: Int = 256): Column =
    column(KmvSketch(expression(c), k).toAggregateExpression())
}

/** `kmv_merge(sketch_col, k)`: re-aggregate serialized [[KmvSketch]]
  * columns up a hierarchy (month → quarter → total) WITHOUT touching
  * base data — the MERGE_TDIGEST / HLL-rollup pattern, but with an
  * oracle-exact result: "the k smallest of a union of per-group
  * k-smallest sets" equals "the k smallest of the union set", so the
  * merged estimate is a pure function of the combined input set and
  * DuckDB replays it from the raw table directly. Evaluates to the
  * distinct-count estimate. */
case class KmvMerge(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)
  override def update(buf: KmvBuffer,
      row: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val other = KmvBuffer.deserialize(v.asInstanceOf[Array[Byte]])
      require(other.k == k, s"sketch k mismatch: ${other.k} vs $k")
      buf.merge(other)
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
  override def withNewMutableAggBufferOffset(o: Int): KmvMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvMerge =
    copy(child = c)
}

object KmvMerge {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def of(c: Column, k: Int = 256): Column =
    column(KmvMerge(expression(c), k).toAggregateExpression())
}

/** Theta-style SET ALGEBRA over two serialized [[KmvSketch]]es
  * (Beyer et al. 2007 §4; the Apache DataSketches theta union /
  * intersection / A-not-B trio): estimate |A∪B|, |A∩B|, |A\B|, or
  * Jaccard — without touching the base data.
  *
  * Deterministic replay contract (why DuckDB can hash-match the
  * ESTIMATES, not just the sketches): let U = the k smallest values of
  * mins(A) ∪ mins(B).
  *  - |U| < k  ⇒ both sketches are complete hash sets, so the counts
  *    over U are EXACT (union = |U|, ∩/\ by membership).
  *  - |U| = k  ⇒ θ = max(U); union_est = (k−1)·2^60/θ; each set-op
  *    count K over U scales as K·union_est/k. Membership of u ∈ U
  *    against mins(X) is exact because θ ≤ θ_X.
  * Every step is order statistics + set membership over the same
  * md5-60 hashes in both engines; the double arithmetic mirrors the
  * oracle SQL operation-for-operation (see MiscPack.thetaSetOpsSql).
  */
case class KmvSetEst(left: Expression, right: Expression, op: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(Set("union", "intersect", "diff", "jaccard")(op),
    s"op must be union|intersect|diff|jaccard, got $op")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = KmvBuffer.deserialize(l.asInstanceOf[Array[Byte]])
    val b = KmvBuffer.deserialize(r.asInstanceOf[Array[Byte]])
    require(a.k == b.k, s"sketch k mismatch: ${a.k} vs ${b.k}")
    val k = a.k
    val u = new java.util.TreeSet[java.lang.Long](a.mins)
    u.addAll(b.mins)
    while (u.size > k) { u.remove(u.last()); () }
    var ki = 0; var kd = 0
    val it = u.iterator()
    while (it.hasNext) {
      val h = it.next()
      val inA = a.mins.contains(h); val inB = b.mins.contains(h)
      if (inA && inB) ki += 1
      if (inA && !inB) kd += 1
    }
    if (u.size < k) op match {           // exact mode: complete sets
      case "union"     => u.size.toDouble
      case "intersect" => ki.toDouble
      case "diff"      => kd.toDouble
      case "jaccard"   => if (u.size == 0) 0.0 else ki.toDouble / u.size.toDouble
    } else {
      val unionEst =
        (k - 1).toDouble * 1152921504606846976.0 / u.last().toDouble
      op match {
        case "union"     => unionEst
        case "intersect" => ki.toDouble * unionEst / k.toDouble
        case "diff"      => kd.toDouble * unionEst / k.toDouble
        case "jaccard"   => ki.toDouble / k.toDouble
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KmvSetEst = copy(left = l, right = r)
}

object KmvSetEst {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def union(a: Column, b: Column): Column =
    column(KmvSetEst(expression(a), expression(b), "union"))
  def intersect(a: Column, b: Column): Column =
    column(KmvSetEst(expression(a), expression(b), "intersect"))
  def diff(a: Column, b: Column): Column =
    column(KmvSetEst(expression(a), expression(b), "diff"))
  def jaccard(a: Column, b: Column): Column =
    column(KmvSetEst(expression(a), expression(b), "jaccard"))
}
