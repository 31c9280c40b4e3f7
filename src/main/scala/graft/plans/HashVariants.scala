package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The two reference hash variants Spark lacks natively
  * (cpp/include/cudf/hashing.hpp:72 murmurhash3_x64_128,
  * hashing.hpp:176 xxhash_32) — Spark ships murmur3_x86_32 (`hash`),
  * xxhash64, md5/sha. Kernels follow the PUBLISHED algorithms
  * (Appleby's smhasher MurmurHash3.cpp; Collet's xxHash spec) and are
  * unit-tested against the reference's own expected outputs
  * (cpp/tests/hashing/murmurhash3_x64_128_test.cpp:43,
  * cpp/tests/hashing/xxhash_32_test.cpp:15).
  *
  * Values are hashed over their byte representation the way the
  * reference does: strings/binary as their bytes, fixed-width numerics
  * as little-endian fixed-width encodings. Unsigned results are
  * returned as the same-width signed bit patterns (Spark has no
  * unsigned types).
  */
object HashKernels {

  /** MurmurHash3_x64_128 (Appleby, public domain): returns
    * Array(h1, h2) — the two 64-bit words of the 128-bit hash. */
  def murmur3x64_128(data: Array[Byte], seed: Long): Array[Long] = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    val len = data.length
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    def leLong(off: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (data(off + i) & 0xffL); i -= 1 }
      v
    }
    var b = 0
    while (b < nblocks) {
      var k1 = leLong(b * 16)
      var k2 = leLong(b * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    val tail = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var i = math.min(rem, 16) - 1
      while (i >= 8) { k2 ^= (data(tail + i) & 0xffL) << ((i - 8) * 8); i -= 1 }
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem >= 1) {
      var i = math.min(rem, 8) - 1
      while (i >= 0) { k1 ^= (data(tail + i) & 0xffL) << (i * 8); i -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    def fmix64(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      x
    }
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    Array(h1, h2)
  }

  /** XXH32 (Collet's published spec): 32-bit result as the signed bit
    * pattern. */
  def xxhash32(data: Array[Byte], seed: Int): Int = {
    val P1 = 0x9e3779b1; val P2 = 0x85ebca77; val P3 = 0xc2b2ae3d
    val P4 = 0x27d4eb2f; val P5 = 0x165667b1
    val len = data.length
    def leInt(off: Int): Int =
      (data(off) & 0xff) | ((data(off + 1) & 0xff) << 8) |
        ((data(off + 2) & 0xff) << 16) | ((data(off + 3) & 0xff) << 24)
    var p = 0
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (p + 16 <= len) {
          v1 = Integer.rotateLeft(v1 + leInt(p) * P2, 13) * P1
          v2 = Integer.rotateLeft(v2 + leInt(p + 4) * P2, 13) * P1
          v3 = Integer.rotateLeft(v3 + leInt(p + 8) * P2, 13) * P1
          v4 = Integer.rotateLeft(v4 + leInt(p + 12) * P2, 13) * P1
          p += 16
        }
        Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
          Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
      } else seed + P5
    h += len
    while (p + 4 <= len) {
      h = Integer.rotateLeft(h + leInt(p) * P3, 17) * P4
      p += 4
    }
    while (p < len) {
      h = Integer.rotateLeft(h + (data(p) & 0xff) * P5, 11) * P1
      p += 1
    }
    h ^= h >>> 15; h *= P2
    h ^= h >>> 13; h *= P3
    h ^= h >>> 16
    h
  }

  def le4(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def le8(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (i * 8)) & 0xff).toByte; i += 1 }
    out
  }

  /** Endianness adapter for ByteCastExpr codegen: reverses the
    * little-endian byte view when big-endian output is requested. */
  def castBytes(le: Array[Byte], bigEndian: Boolean): Array[Byte] =
    if (!bigEndian) le
    else {
      val r = new Array[Byte](le.length)
      var i = 0
      while (i < le.length) { r(i) = le(le.length - 1 - i); i += 1 }
      r
    }

  /** Byte view of a Catalyst value, mirroring the reference's
    * fixed-width little-endian row layout. Floats hash their IEEE bit
    * pattern as stored (no NaN canonicalization — callers wanting
    * stable NaN keys normalize first, see NormalizeNaNZero). Primitive
    * overloads exist because Janino's autoboxing is unreliable in
    * generated code. */
  def bytesOf(s: UTF8String): Array[Byte] = s.getBytes
  def bytesOf(b: Array[Byte]): Array[Byte] = b
  def bytesOf(i: Int): Array[Byte] = le4(i)
  def bytesOf(l: Long): Array[Byte] = le8(l)
  def bytesOf(f: Float): Array[Byte] = le4(java.lang.Float.floatToIntBits(f))
  def bytesOf(d: Double): Array[Byte] = le8(java.lang.Double.doubleToLongBits(d))
  def bytesOf(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
    case i: java.lang.Integer => le4(i)
    case l: java.lang.Long => le8(l)
    case f: java.lang.Float => le4(java.lang.Float.floatToIntBits(f))
    case d: java.lang.Double => le8(java.lang.Double.doubleToLongBits(d))
    case other =>
      throw new IllegalArgumentException(
        s"unsupported hash input ${other.getClass}")
  }
}

private[plans] trait HashVariantInput { self: UnaryExpression =>
  protected def supported: Seq[DataType] =
    Seq(StringType, BinaryType, IntegerType, LongType, FloatType, DoubleType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (supported.contains(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} supports ${supported.mkString("/")}, " +
        s"got ${child.dataType}")
}

/** murmurhash3_x64_128 of one value (hashing.hpp:72): struct of the two
  * 64-bit words. Codegen calls the shared kernel; the per-row work is
  * the hash itself, so interpreted-vs-codegen parity is trivially the
  * same code path. */
case class Murmur3X64_128(child: Expression, seed: Long)
    extends UnaryExpression with HashVariantInput {
  override def dataType: DataType =
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false)))
  override def prettyName: String = "murmur3_x64_128"
  override def nullSafeEval(v: Any): Any = {
    val r = HashKernels.murmur3x64_128(HashKernels.bytesOf(v), seed)
    InternalRow(r(0), r(1))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mm")
      s"""
        |long[] $r = graft.plans.HashKernels.murmur3x64_128(
        |  graft.plans.HashKernels.bytesOf($c), ${seed}L);
        |${ev.value} = new org.apache.spark.sql.catalyst.expressions
        |  .GenericInternalRow(new Object[]{
        |    java.lang.Long.valueOf($r[0]), java.lang.Long.valueOf($r[1])});
        |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Murmur3X64_128 =
    copy(child = c)
}

/** xxhash_32 of one value (hashing.hpp:176): uint32 as signed Int bit
  * pattern. */
case class XxHash32Expr(child: Expression, seed: Int)
    extends UnaryExpression with HashVariantInput {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "xxhash_32"
  override def nullSafeEval(v: Any): Any =
    HashKernels.xxhash32(HashKernels.bytesOf(v), seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashKernels.xxhash32(" +
        s"graft.plans.HashKernels.bytesOf($c), $seed);")
  override protected def withNewChildInternal(c: Expression): XxHash32Expr =
    copy(child = c)
}

/** byte_cast (cpp/include/cudf/reshape.hpp:84): a fixed-width numeric
  * column reinterpreted as its raw bytes, big- or little-endian
  * (flip_endianness::YES is the reference default on little-endian
  * GPUs — big-endian output). BinaryType result; hex() of the
  * big-endian form equals the zero-padded hex of the value, which is
  * what the DuckDB oracle checks. */
case class ByteCastExpr(child: Expression, bigEndian: Boolean)
    extends UnaryExpression with HashVariantInput {
  override protected def supported: Seq[DataType] =
    Seq(IntegerType, LongType, FloatType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_cast"
  override def nullSafeEval(v: Any): Any =
    HashKernels.castBytes(HashKernels.bytesOf(v), bigEndian)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HashKernels.castBytes(" +
        s"graft.plans.HashKernels.bytesOf($c), $bigEndian);")
  override protected def withNewChildInternal(c: Expression): ByteCastExpr =
    copy(child = c)
}

object HashVariants {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def murmur3x64_128(c: Column, seed: Long = 0L): Column =
    column(Murmur3X64_128(expression(c), seed))
  def xxhash32(c: Column, seed: Int = 0): Column =
    column(XxHash32Expr(expression(c), seed))
  def byteCast(c: Column, bigEndian: Boolean = true): Column =
    column(ByteCastExpr(expression(c), bigEndian))
  /** Spark's codegen XXH64 with an explicit seed (the `functions.xxhash64`
    * façade hardwires seed 42; the reference's xxhash_64 vectors use
    * seed 0 — cpp/tests/hashing/xxhash_64_test.cpp:126). */
  def xxhash64Seeded(c: Column, seed: Long): Column =
    column(org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(expression(c)), seed))
}
