package graft.plans

import java.security.MessageDigest

/** Engine-portable hashing for the minhash / simhash dedup kernels.
  *
  * The reference's minhash (nvtext/minhash.hpp:62) hashes with a
  * device-native permuted MurmurHash — correct but unverifiable from
  * any other engine. Here every per-token base hash is the first 60
  * bits of MD5 (the same md5 → 15-hex-chars → integer pipeline as
  * Curation.hashUnit), and the k per-seed minhash values derive from
  * that one digest via affine maps `(a_s·h0 + b_s) mod (2^61−1)` with
  * fixed published constants — a classic universal-hash family over a
  * Mersenne prime. Every step is exactly replayable in ANSI-ish SQL
  * (DuckDB: md5 + HUGEINT modular arithmetic), so the LSH pipelines'
  * outputs are oracle-checkable end to end, not just recall-tested.
  *
  * Cost: ONE MD5 per distinct token (thread-local digest, no alloc
  * churn) + k ~3-instruction remixes — the same shape as the XXH64
  * kernel it replaced (one strong hash + cheap per-seed derivation);
  * MD5's extra nanoseconds are noise next to the band shuffle.
  */
object PortableHash {

  /** 2^61 − 1, the Mersenne prime all affine remixes reduce by. */
  final val P: Long = 2305843009213693951L

  private final val MaxSeeds = 64

  /** Fixed affine constants, generated once by splitmix64 from a
    * published seed — a_s nonzero, both reduced into [0, P). The SQL
    * oracle embeds the same values via [[sqlSeedRows]]. */
  private def splitmix(state: Long): Long = {
    var z = state + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val seedA: Array[Long] = Array.tabulate(MaxSeeds) { s =>
    var x = splitmix(0x5EEDA000L + s)
    var a = java.lang.Long.remainderUnsigned(x, P)
    while (a == 0L) { x = splitmix(x); a = java.lang.Long.remainderUnsigned(x, P) }
    a
  }

  val seedB: Array[Long] = Array.tabulate(MaxSeeds) { s =>
    java.lang.Long.remainderUnsigned(splitmix(0x5EEDB000L + s), P)
  }

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of MD5(bytes) as a non-negative Long — identical to
    * DuckDB's `('0x' || substring(md5(x), 1, 15))::BIGINT` (15 hex
    * chars = first 7 bytes + the high nibble of byte 8, big-endian). */
  def md5_60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h >>> 4
  }

  /** `(a · b) mod (2^61−1)` for a, b in [0, 2^61): exact via the
    * 128-bit product and Mersenne folding (2^64 ≡ 8 mod P). Matches
    * DuckDB's `(CAST(a AS HUGEINT) * b) % P` bit for bit — asserted by
    * the BigInt property test in ExpressionsSpec. */
  def mulmodP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // operands non-negative => unsigned hi
    val lo = a * b                   // low 64 bits of the product
    var r = hi * 8L + (lo & P) + (lo >>> 61)
    r = (r & P) + (r >>> 61)
    if (r >= P) r - P else r
  }

  /** Per-seed minhash value: `(a_s·h0 + b_s) mod P` — the sum of two
    * values in [0, P) stays under 2P, so one subtract reduces it. */
  def affine(h0: Long, s: Int): Long = {
    val r = mulmodP(h0, seedA(s)) + seedB(s)
    if (r >= P) r - P else r
  }

  /** First 15 hex chars of MD5(s) — the band-key digest, identical to
    * DuckDB `substring(md5(s), 1, 15)`. */
  def md5Hex15(s: String): String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(15)
    var i = 0
    while (i < 8) {
      val b = d(i) & 0xFF
      sb.append(Character.forDigit(b >>> 4, 16))
      if (i < 7) sb.append(Character.forDigit(b & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  /** The affine constants as a SQL VALUES body `(s, a, b), …` for the
    * oracle's `seeds(s, a, b)` CTE. */
  def sqlSeedRows(k: Int): String = {
    require(k <= MaxSeeds, s"at most $MaxSeeds seeds, got $k")
    (0 until k).map(s => s"(${s}, ${seedA(s)}, ${seedB(s)})").mkString(", ")
  }

  /** DuckDB expression for [[md5_60]] of a VARCHAR expression. */
  def sqlMd5_60(e: String): String =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  /** Spark COLUMN form of [[md5_60]] as a decimal-digit string (callers
    * cast to long or scale to a unit double) — the ONE definition of the
    // 60-bit-MD5 contract on the column side, shared by Curation.hashUnit
    // and the winnowing fingerprints so the oracle-replayed hash can
    // never silently diverge between operators. */
  def md5_60Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 15), 16, 10)
  }

  /** DuckDB expression for [[affine]] given h0 and seed-row aliases. */
  def sqlAffine(h0: String, a: String, b: String): String =
    s"CAST(((CAST($h0 AS HUGEINT) * $a) % $P + $b) % $P AS BIGINT)"
}
