package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact duplicate-substring detection — the reference's flagship dedup
  * op (cpp/include/nvtext/deduplicate.hpp:40,66,95: build_suffix_array /
  * resolve_duplicates / resolve_duplicates_pair).
  *
  * Spark mapping: the reference builds ONE suffix array over the whole
  * (≤ 2 GB) concatenated column on a single GPU. The distributed analog
  * keeps that algorithm — suffix array + Kasai LCP scan, exact — but at
  * CHUNK granularity: documents are range-partitioned into deterministic
  * chunks, each chunk is concatenated and processed partition-locally
  * (mapPartitions; no driver involvement), and chunk outputs are
  * distinct-merged. A duplicate whose occurrences all land in different
  * chunks is missed — the same boundary the reference hits at its 2 GB
  * limit, here per-chunk instead of per-corpus. For corpus-wide
  * near-dup screening compose with [[Dedup.minhashNgramPairs]]; use
  * larger chunks (fewer partitions) to widen the exact window.
  */
object SubstringDedup {

  /** Separator that terminates every document in the concatenated chunk;
    * matches crossing it are truncated, so no emitted duplicate spans
    * documents. */
  private final val Sep = '\u0000'

  /** Prefix-doubling suffix array, O(n log² n) — exact and allocation-
    * light; n is bounded by the chunk's character count. */
  private[graft] def suffixArray(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s.charAt(i).toInt; i += 1 }
    var sa = Array.range(0, n)
    val next = new Array[Int](n)
    var k = 1
    var done = false
    while (!done && k < n) {
      def cmp(a: Int, b: Int): Int = {
        if (rank(a) != rank(b)) Integer.compare(rank(a), rank(b))
        else {
          val ra = if (a + k < n) rank(a + k) else -1
          val rb = if (b + k < n) rank(b + k) else -1
          Integer.compare(ra, rb)
        }
      }
      sa = sa.sortWith((a, b) => cmp(a, b) < 0)
      next(sa(0)) = 0
      i = 1
      while (i < n) {
        next(sa(i)) = next(sa(i - 1)) + (if (cmp(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      Array.copy(next, 0, rank, 0, n)
      done = rank(sa(n - 1)) == n - 1
      k <<= 1
    }
    sa
  }

  /** Kasai LCP array: lcp(i) = common-prefix length of sa(i-1) and sa(i). */
  private[graft] def lcpArray(s: String, sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s.charAt(i + h) == s.charAt(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Duplicated substrings (≥ minWidth chars, ≥ 2 occurrences) within
    * one concatenated chunk. `srcOf`: optional source tag per text; when
    * set, only substrings whose adjacent suffix-array occurrences span
    * DIFFERENT sources are emitted (resolve_duplicates_pair semantics —
    * any substring present in both corpora has at least one adjacent
    * cross-source pair in its suffix-array interval). */
  // Caveat: the separator is U+0000; a document legitimately containing
  // NUL is treated as multiple documents at the truncation step, so
  // duplicates spanning a NUL are missed (binary payloads belong in
  // Multimodal's binary columns, not here).
  private def chunkDuplicates(texts: Seq[(String, Int)], minWidth: Int,
      crossSourceOnly: Boolean): Iterator[String] = {
    if (texts.isEmpty) return Iterator.empty
    val sb = new java.lang.StringBuilder
    val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (end, src)
    texts.foreach { case (t, src) =>
      sb.append(t).append(Sep)
      bounds += ((sb.length, src))
    }
    val s = sb.toString
    val n = s.length
    val srcAt = new Array[Int](n)
    var p = 0
    bounds.foreach { case (end, src) =>
      while (p < end) { srcAt(p) = src; p += 1 }
    }
    val sa = suffixArray(s)
    val lcp = lcpArray(s, sa)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 1
    while (i < n) {
      var l = lcp(i)
      if (l >= minWidth) {
        val start = sa(i)
        // Truncate at the first separator: dups never span documents.
        val sep = s.indexOf(Sep, start)
        if (sep >= 0 && sep - start < l) l = sep - start
        if (l >= minWidth &&
            (!crossSourceOnly || srcAt(sa(i)) != srcAt(sa(i - 1))))
          out += s.substring(start, start + l)
      }
      i += 1
    }
    out.iterator
  }

  /** resolve_duplicates (deduplicate.hpp:66): all substrings of at least
    * `minWidth` characters appearing more than once, at chunk
    * granularity. `chunks` bounds per-partition memory (suffix array is
    * ~8 bytes/char, mirroring the reference's 4x temp + 4x output note).
    * Deterministic: chunk assignment is a range partition on `idCol`. */
  def resolveDuplicates(df: DataFrame, idCol: String, textCol: String,
      minWidth: Int, chunks: Int = 16): DataFrame = {
    require(minWidth > 8, "min_width must be > 8 (deduplicate.hpp:62)")
    val spark = df.sparkSession
    import spark.implicits._
    val texts: Dataset[String] = df
      // null text would reach StringBuilder.append as the literal
      // "null" (fabricated corpus content) — drop such rows up front
      .filter(col(textCol).isNotNull)
      .repartitionByRange(chunks, col(idCol))
      .sortWithinPartitions(col(idCol)) // fixed concatenation order
      .select(col(textCol)).as[String]
    texts.mapPartitions(it =>
        chunkDuplicates(it.map((_, 0)).toSeq, minWidth, crossSourceOnly = false))
      .toDF("dup_text")
      .distinct()
  }

  /** [[resolveDuplicatesPair]] over ONE tagged input: `srcCol` (int)
    * marks each document's corpus; only substrings whose suffix-array
    * adjacencies span different sources emit. Single scan of the input.
    * The within-partition sort fixes the concatenation order — without
    * it the cross-source adjacency test could flip between runs when
    * equal doc-final suffixes straddle the sources (shuffle-fetch order
    * is otherwise arbitrary). */
  def resolveDuplicatesTagged(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, minWidth: Int, chunks: Int = 16): DataFrame = {
    require(minWidth > 8, "min_width must be > 8 (deduplicate.hpp:90)")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df
      // null text appends as "null"; a null src crashes the primitive
      // Int decoder mid-job — both are malformed input, dropped up front
      .filter(col(textCol).isNotNull && col(srcCol).isNotNull)
      .repartitionByRange(chunks, col(idCol))
      .sortWithinPartitions(col(idCol))
      .select(col(textCol).cast("string"), col(srcCol).cast("int"))
      .as[(String, Int)]
    rows.mapPartitions(it =>
        chunkDuplicates(it.toSeq, minWidth, crossSourceOnly = true))
      .toDF("dup_text")
      .distinct()
  }

  /** resolve_duplicates_pair (deduplicate.hpp:95): substrings of at
    * least `minWidth` characters appearing in BOTH inputs (e.g.
    * train-set contamination of an eval set). Both sides are tagged,
    * co-range-partitioned on id, and scanned in one suffix array per
    * chunk; only cross-source adjacencies emit. */
  def resolveDuplicatesPair(df1: DataFrame, df2: DataFrame, idCol: String,
      textCol: String, minWidth: Int, chunks: Int = 16): DataFrame =
    resolveDuplicatesTagged(
      df1.select(col(idCol), col(textCol), lit(0).as("__src"))
        .union(df2.select(col(idCol), col(textCol), lit(1).as("__src"))),
      idCol, textCol, "__src", minWidth, chunks)
}
