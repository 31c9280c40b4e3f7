package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact duplicate-substring detection — the reference's flagship dedup
  * op (cpp/include/nvtext/deduplicate.hpp:40,66,95: build_suffix_array /
  * resolve_duplicates / resolve_duplicates_pair).
  *
  * Spark mapping: the reference builds ONE suffix array over the whole
  * (≤ 2 GB) concatenated column on a single GPU. The distributed analog
  * keeps that algorithm — suffix array + Kasai LCP scan, exact — in TWO
  * passes that together are corpus-complete (STRICTLY stronger than the
  * reference's global-but-≤2 GB bound):
  *
  *  1. CHUNK pass: documents are range-partitioned into deterministic
  *     chunks, each chunk is concatenated and processed partition-
  *     locally (mapPartitions; no driver involvement). Finds every
  *     duplicate with ≥2 occurrences inside one chunk — including all
  *     within-document repeats.
  *  2. CROSS-CHUNK pass: character-level winnowing fingerprints
  *     (Schleimer-Wilkerson-Aiken 2003, k-char rolling hash + w-window
  *     minimum with k = minWidth−1, w = 2, so k+w−1 = minWidth)
  *     GUARANTEE that any substring of ≥ minWidth chars shared by two
  *     documents yields a shared fingerprint value at every
  *     occurrence. Occurrences of REPEATED fingerprint values extract
  *     their ≤2 overlapping minWidth-char context grams as exact text;
  *     candidate doc pairs come from posting lists keyed on the GRAM
  *     (so every candidate pair shares a real duplicated
  *     minWidth-gram — no hash or hot-fingerprint false pairs reach
  *     the quadratic stage; the round-13 fix, see crossChunkDups);
  *     each pair is verified EXACTLY by a two-document suffix array.
  *
  * Cost shape at 100 TB: pass 1 is one range shuffle + linear local
  * work (chunk count corpus-adaptive via autoChunks, so per-task SA
  * memory stays bounded at any corpus); pass 2 shuffles ~0.67
  * fingerprints per char, ships gram-sized text only for repeated
  * fingerprints (∝ duplicated content, ~zero on mostly-unique
  * corpora), and pair-verifies ∝ the corpus's TRUE duplicate
  * structure. A gram duplicated across m documents still fans out
  * C(m,2) in its posting list — the same documented caveat as MinHash
  * LSH banding (hot clusters ⇒ hot bands there too); SCALING.md's
  * round-13 section carries the measured time-vs-structure table.
  */
object SubstringDedup {

  /** Separator that terminates every document in the concatenated chunk;
    * matches crossing it are truncated, so no emitted duplicate spans
    * documents. */
  private final val Sep = '\u0000'

  /** Corpus-adaptive chunk count (pass `chunks <= 0` to the resolvers):
    * one chunk per ~4M characters, floor 4 — the round-11 granularity
    * lesson (ANY compile-time blocking granularity breaks past its
    * tuning scale) applied to the suffix-array pass: a FIXED chunk
    * count means per-chunk SAs grow linearly with the corpus, and the
    * SA pass needs ~8-16 bytes/char of task memory, so chunk size must
    * stay executor-bounded at ANY corpus. Output is chunk-count
    * invariant (spec-asserted), so adaptivity never changes results. */
  def autoChunks(totalChars: Long, targetChars: Long = 4000000L): Int =
    math.max(4L, math.min(1000000L,
      (totalChars + targetChars - 1) / targetChars)).toInt

  /** Resolve an explicit or adaptive (`chunks <= 0`) chunk count; the
    * adaptive path pays one aggregate over the text column. */
  private def resolveChunks(df: DataFrame, textCol: String,
      chunks: Int): Int =
    if (chunks > 0) chunks
    else autoChunks(Option(df.agg(sum(length(col(textCol)))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L))

  /** Prefix-doubling suffix array with two stable counting-sort passes
    * per round — O(n log n) on primitive int arrays (the round-13
    * rewrite of the original comparison-sort doubling, whose boxed
    * sortWith paid an O(log n) factor AND heavy per-compare constants;
    * this is the textbook radix formulation: order by the second key
    * by walking the previous SA, then a stable counting sort by the
    * first key). Exact; n is bounded by the chunk's character count
    * (autoChunks keeps it executor-sized). */
  private[graft] def suffixArray(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = s.charAt(i).toInt; i += 1 }
    val sa = new Array[Int](n)
    val tmp = new Array[Int](n)
    var newRank = new Array[Int](n)
    // initial counting sort by char code (16-bit domain)
    val K0 = 65536
    val cnt = new Array[Int](math.max(n, K0) + 1)
    i = 0; while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
    i = 0; while (i < K0) { cnt(i + 1) += cnt(i); i += 1 }
    i = 0; while (i < n) { sa(cnt(rank(i))) = i; cnt(rank(i)) += 1; i += 1 }
    // densify: the k-loop's counting sort assumes ranks < n, but the
    // initial ranks are raw 16-bit char codes
    newRank(sa(0)) = 0
    var r0 = 0
    i = 1
    while (i < n) {
      if (s.charAt(sa(i)) != s.charAt(sa(i - 1))) r0 += 1
      newRank(sa(i)) = r0
      i += 1
    }
    val sw0 = rank; rank = newRank; newRank = sw0
    if (r0 == n - 1) return sa
    var k = 1
    while (k < n) {
      // order by the SECOND key without sorting: suffixes with an
      // empty second key (i >= n-k) come first, then every sa(j)-k in
      // current SA order — stable by rank(i+k) by construction
      var p = 0
      i = n - k
      while (i < n) { tmp(p) = i; p += 1; i += 1 }
      var j = 0
      while (j < n) { if (sa(j) >= k) { tmp(p) = sa(j) - k; p += 1 }; j += 1 }
      // stable counting sort by the FIRST key (ranks < n)
      java.util.Arrays.fill(cnt, 0, n + 1, 0)
      i = 0; while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 0; while (i < n) { cnt(i + 1) += cnt(i); i += 1 }
      i = 0
      while (i < n) {
        val x = tmp(i); sa(cnt(rank(x))) = x; cnt(rank(x)) += 1; i += 1
      }
      // dense re-rank over the new order
      newRank(sa(0)) = 0
      var r = 0
      i = 1
      while (i < n) {
        val a = sa(i - 1); val b = sa(i)
        val ra2 = if (a + k < n) rank(a + k) else -1
        val rb2 = if (b + k < n) rank(b + k) else -1
        if (rank(a) != rank(b) || ra2 != rb2) r += 1
        newRank(b) = r
        i += 1
      }
      val sw = rank; rank = newRank; newRank = sw
      if (r == n - 1) return sa // all ranks distinct — fully ordered
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

  private final val HashBase = 1000003L

  /** Character-level winnowing fingerprints: rolling k-char polynomial
    * hashes (mod 2^64), sliding w-window minimum via a monotonic deque,
    * distinct selected values. Any substring of ≥ k+w−1 chars shared by
    * two strings produces a shared fingerprint VALUE in both (equal
    * content ⇒ equal rolling hash ⇒ equal window minimum over the
    * aligned region). O(n) time, ~2/(w+1) selection density. */
  private[graft] def winnowChars(s: String, k: Int, w: Int): Array[Long] =
    winnowCharsPos(s, k, w).map(_._2)

  /** [[winnowChars]] with the selected POSITIONS (one entry per
    * distinct selected position, in order): the cross-chunk pass needs
    * positions to extract the context grams around each selected
    * k-gram. The guarantee sharpens positionally: for any duplicated
    * substring G of exactly k+w−1 chars, the window spanning G's w
    * k-gram positions lies fully inside G, so its minimum — the same
    * k-gram CONTENT at every occurrence of G — is selected at every
    * occurrence; a gram containing the selected k-gram is recoverable
    * from the position alone. */
  private[graft] def winnowCharsPos(s: String, k: Int,
      w: Int): Array[(Int, Long)] = {
    val n = s.length
    val g = n - k + 1
    if (g < w) return Array.empty
    var pow = 1L
    var i = 1
    while (i < k) { pow *= HashBase; i += 1 }
    val hs = new Array[Long](g)
    var h = 0L
    i = 0
    while (i < k) { h = h * HashBase + s.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < g) {
      h = (h - s.charAt(i - 1) * pow) * HashBase + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Int]
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < g) {
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(i)) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst() <= i - w) dq.pollFirst()
      if (i >= w - 1) out += dq.peekFirst()
      i += 1
    }
    out.iterator.map(p => (p, hs(p))).toArray
  }

  /** Exact common substrings (≥ minWidth chars) of a candidate pair —
    * the cross-chunk verify kernel. */
  private[graft] def commonSubstringsPair(a: String, b: String,
      minWidth: Int): Iterator[String] =
    chunkDuplicates(Seq((a, 0), (b, 1)), minWidth, crossSourceOnly = true)

  /** Deterministically chunk the corpus and tag each row with its chunk
    * id. Output columns: __id, __t, __src, __chunk.
    *
    * The chunk id is a DETERMINISTIC hash of the id — NOT
    * spark_partition_id over a range partition: range boundaries are
    * re-sampled on every evaluation of the exchange, so two consumers
    * of this frame (the local pass and the fingerprint pass) could
    * otherwise disagree on chunk assignment, and the cross-chunk
    * filter would silently drop a pair the local pass never
    * co-concatenated. `repartition(chunks, __chunk)` keys the shuffle
    * on that same deterministic value, so same __chunk ⇒ same
    * partition in the local pass, which is exactly the invariant the
    * `a.__chunk =!= b.__chunk` pruning relies on. localCheckpoint
    * materializes the chunked frame ONCE (eager, MEMORY_AND_DISK) —
    * the op has four consumers and Spark 4 does not reuse identical
    * repartition exchanges. */
  private def chunk(df: DataFrame, idCol: String, textCol: String,
      srcExpr: org.apache.spark.sql.Column, chunks: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        col(textCol).cast("string").as("__t"), srcExpr.cast("int").as("__src"))
      .withColumn("__chunk", pmod(hash(col("__id")), lit(chunks)))
      .repartition(chunks, col("__chunk"))
      .sortWithinPartitions(col("__chunk"), col("__id")) // fixed concat order
      .transform(Checkpoints.cut)

  /** Pass 2: winnow-fingerprint discovery → EXACT gram-text
    * verification → candidate doc pairs spanning ≥2 chunks → exact
    * per-pair suffix-array verify. `crossSourceOnly` adds the
    * resolve_duplicates_pair constraint (pair must span sources).
    *
    * Why the gram-text middle stage (round 13): candidates keyed on
    * raw fingerprint VALUES degenerate to all-pairs on natural text —
    * at the original k = ⌈minWidth/2⌉ = 8, common English 8-grams put
    * most of the corpus in a few posting lists (measured on the 25×
    * gate corpus: the hottest 8-char fp listed 450 of 750 docs;
    * candidate pairs saturated C(n,2); the gate rode at ~n^1.5). The
    * fix has two parts. (a) k = minWidth−1, w = 2 — the guarantee
    * k+w−1 = minWidth still holds, selection density rises from
    * 2/(w+1) = 0.22 to 0.67 per char (a constant, still linear), but a
    * (minWidth−1)-char fingerprint is selective where an 8-char one is
    * not. (b) occurrences of REPEATED fp values (count ≥ 2 — the only
    * ones that can pair) extract their ≤2 overlapping minWidth-char
    * context grams as TEXT, and candidate pairs are generated from
    * posting lists keyed on the exact gram — so a candidate pair
    * SHARES a real duplicated minWidth-gram by construction (no hash
    * or hot-fp false pairs survive to the quadratic stage), and the
    * pair-verify cost is proportional to the corpus's true duplicate
    * structure, the same bound the reference's global suffix array
    * pays. Miss-freedom is the sharpened winnowing guarantee (see
    * [[winnowCharsPos]]): every occurrence of a duplicated
    * minWidth-gram selects the same inside-gram k-gram, so the gram
    * text materializes at every occurrence.
    *
    * Remaining documented caveat: a gram duplicated across m documents
    * yields an m-id posting list → C(m,2) verify pairs (real
    * duplicates — the same hot-cluster caveat as MinHash banding). */
  private def crossChunkDups(chunked: DataFrame, minWidth: Int,
      crossSourceOnly: Boolean): DataFrame = {
    val spark = chunked.sparkSession
    import spark.implicits._
    val k = minWidth - 1
    val w = 2 // guarantee threshold k+w-1 = minWidth
    val fps = chunked
      .select($"__id", $"__chunk", $"__src", $"__t")
      .as[(String, Int, Int, String)]
      .flatMap { case (id, ch, src, t) =>
        winnowCharsPos(t, k, w).map { case (pos, fp) =>
          (id, ch, src, pos, fp) } }
      .toDF("__id", "__chunk", "__src", "pos", "fp")
    // fp values seen in fewer than two DISTINCT (id, chunk, src) units
    // can never pair — candidate pairs are keyed on those units, so a
    // fp repeated only within one chunk (self-repetitive doc) must not
    // count as hot: plain count(*) >= 2 would extract and shuffle its
    // gram text for nothing. Drop such occurrences before any text
    // ships (on a mostly-unique corpus this leaves only the true
    // duplicate structure).
    val hot = fps.groupBy($"fp")
      .agg(count_distinct(struct($"__id", $"__chunk", $"__src"))
        .as("__n"))
      .filter($"__n" >= 2).select($"fp")
    val hotOcc = fps.join(hot, "fp")
      .groupBy($"__id", $"__chunk", $"__src")
      .agg(collect_list($"pos").as("poss"))
    // exact context grams: every minWidth-gram containing the selected
    // k-gram (k = minWidth−1 ⇒ starts pos−1 and pos, clamped)
    val grams = hotOcc
      .join(chunked.select($"__id", $"__src", $"__t"), Seq("__id", "__src"))
      // pin the decode order: the join reorders to (keys, left, right)
      .select($"__id", $"__chunk", $"__src", $"poss", $"__t")
      .as[(String, Int, Int, Seq[Int], String)]
      .flatMap { case (id, ch, src, poss, t) =>
        val starts = scala.collection.mutable.SortedSet.empty[Int]
        poss.foreach { p =>
          var s0 = math.max(0, p - (minWidth - k))
          val s1 = math.min(p, t.length - minWidth)
          while (s0 <= s1) { starts += s0; s0 += 1 }
        }
        starts.iterator.map(s0 =>
          (id, ch, src, t.substring(s0, s0 + minWidth)))
      }
      .toDF("__id", "__chunk", "__src", "gram")
    val cand0 = PostingLists.candidatePairs(
        grams.select(struct($"__id", $"__chunk", $"__src").as("p"), $"gram"),
        "p", "gram", distinctIds = true)
      .filter($"a.__chunk" =!= $"b.__chunk") // same-chunk: pass 1 is exact
    // Join texts back on (id, src), not id alone: in pair mode the same
    // id may exist in BOTH sources, and an id-only join would attach the
    // wrong source's text and could emit a same-source match.
    val cand = (if (crossSourceOnly) cand0.filter($"a.__src" =!= $"b.__src")
      else cand0)
      .select($"a.__id".as("ida"), $"a.__src".as("sa"),
        $"b.__id".as("idb"), $"b.__src".as("sb"))
      .dropDuplicates("ida", "sa", "idb", "sb")
    val texts = chunked.select($"__id", $"__src", $"__t")
    cand
      .join(texts.select($"__id".as("ida"), $"__src".as("sa"),
        $"__t".as("ta")), Seq("ida", "sa"))
      .join(texts.select($"__id".as("idb"), $"__src".as("sb"),
        $"__t".as("tb")), Seq("idb", "sb"))
      .select($"ta", $"tb").as[(String, String)]
      .flatMap { case (a, b) => commonSubstringsPair(a, b, minWidth) }
      .toDF("dup_text")
  }

  /** resolve_duplicates (deduplicate.hpp:66): all substrings of at least
    * `minWidth` characters appearing more than once — CORPUS-complete
    * via the two-pass design (chunk-exact + winnowing-guaranteed
    * cross-chunk verify; see the object doc). `chunks` bounds
    * per-partition memory (suffix array is ~8 bytes/char, mirroring the
    * reference's 4x temp + 4x output note). Deterministic: chunk
    * assignment is a range partition on `idCol`. */
  def resolveDuplicates(df: DataFrame, idCol: String, textCol: String,
      minWidth: Int, chunks: Int = 0): DataFrame = {
    require(minWidth > 8, "min_width must be > 8 (deduplicate.hpp:62)")
    val spark = df.sparkSession
    import spark.implicits._
    // null text would reach StringBuilder.append as the literal
    // "null" (fabricated corpus content) — dropped inside chunk()
    val chunked = chunk(df, idCol, textCol, lit(0),
      resolveChunks(df, textCol, chunks))
    val local = chunked.select($"__t").as[String]
      .mapPartitions(it =>
        chunkDuplicates(it.map((_, 0)).toSeq, minWidth, crossSourceOnly = false))
      .toDF("dup_text")
    local.union(crossChunkDups(chunked, minWidth, crossSourceOnly = false))
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
      srcCol: String, minWidth: Int, chunks: Int = 0): DataFrame = {
    require(minWidth > 8, "min_width must be > 8 (deduplicate.hpp:90)")
    val spark = df.sparkSession
    import spark.implicits._
    // null text appends as "null"; a null src crashes the primitive
    // Int decoder mid-job — both are malformed input, dropped up front
    val chunked = chunk(df.filter(col(srcCol).isNotNull),
      idCol, textCol, col(srcCol), resolveChunks(df, textCol, chunks))
    val local = chunked.select($"__t", $"__src").as[(String, Int)]
      .mapPartitions(it =>
        chunkDuplicates(it.toSeq, minWidth, crossSourceOnly = true))
      .toDF("dup_text")
    local.union(crossChunkDups(chunked, minWidth, crossSourceOnly = true))
      .distinct()
  }

  /** resolve_duplicates_pair (deduplicate.hpp:95): substrings of at
    * least `minWidth` characters appearing in BOTH inputs (e.g.
    * train-set contamination of an eval set). Both sides are tagged,
    * co-range-partitioned on id, and scanned in one suffix array per
    * chunk; only cross-source adjacencies emit. */
  def resolveDuplicatesPair(df1: DataFrame, df2: DataFrame, idCol: String,
      textCol: String, minWidth: Int, chunks: Int = 0): DataFrame =
    resolveDuplicatesTagged(
      df1.select(col(idCol), col(textCol), lit(0).as("__src"))
        .union(df2.select(col(idCol), col(textCol), lit(1).as("__src"))),
      idCol, textCol, "__src", minWidth, chunks)

  /** Distributed GLOBAL suffix ranking, depth-truncated at `minWidth` —
    * the hot-duplicate-clique remedy (the reference's single-GPU global
    * suffix array, nvtext/deduplicate.hpp:40 build_suffix_array, pays
    * O(occurrences) where [[resolveDuplicates]]'s cross-chunk posting
    * lists pay C(m,2) verify pairs on a gram shared by m documents).
    *
    * Output: every duplicated minWidth-gram (each substring of EXACTLY
    * `minWidth` chars occurring at ≥ 2 positions corpus-wide, within-
    * doc repeats included) as `dup_text`, with its occurrence count.
    * This is the gram CANONICALIZATION of resolve_duplicates output —
    * the same projection the doc_substring_dups oracle gate uses, and
    * the two sets coincide (see [[substringDups]]' ⊇/⊆ argument): a
    * gram-level consumer (dedup weighting, contamination screens) loses
    * nothing, and no pair of occurrences is ever materialized.
    *
    * Algorithm — prefix doubling over DataFrames (Manber-Myers
    * formulated as log rounds of distributed re-ranking, the same
    * doubling the in-memory [[suffixArray]] runs per chunk):
    * every character position starts ranked by its packed 2-char code
    * (width-2 base case); each round keys positions on
    * (rank[p], rank[p+2^k]) — computed with a per-document `lead`
    * window, no self-join — and re-ranks the distinct key pairs. After ⌈log₂ w⌉ rounds (w = the largest power
    * of two ≤ minWidth) two positions share rank iff their first w
    * chars are equal; the final key (rank_w[p], rank_w[p+minWidth−w])
    * decides equality of the full minWidth-gram (the classic
    * overlapping-halves trick, valid because w ≥ minWidth − w). Ranks
    * only ever feed EQUALITY tests, so re-ranking uses order-free
    * injective ids (zipWithUniqueId — one distinct shuffle) instead of
    * a lexicographic global sort; a full SA would sort the final
    * (rank, rank₂) pairs once more.
    *
    * 100 TB shape: every stage is a linear shuffle of fixed-width rows
    * (~24 bytes/position vs the reference's 8-byte/char single-GPU
    * bound which caps it at 2 GB corpora); rounds are log₂(minWidth),
    * NOT log(corpus); a gram shared by m docs is ONE m-row group —
    * count + one representative, no pair fan-out (min/count are
    * map-side partial aggregates, so even the m-row group never
    * gathers on one reducer). Text ships exactly once per DISTINCT
    * duplicated gram (the representative substring fetch). The lead
    * windows are BLOCKED ([[leadByPos]]): positions range-partition
    * into fixed blocks with a width-sized halo, so per-task memory is
    * min(doc, block) positions — a multi-GB single document spreads
    * over len/block tasks instead of serializing into one (the former
    * SCALING.md caveat, closed round 15). Each round is lineage-cut
    * via Checkpoints.cut
    * (spark.graft.checkpointDir switches the cut to a reliable
    * checkpoint() for cluster fault tolerance): lineage stays
    * O(1) and the injective rank assignment is pinned against
    * recomputation. */
  def duplicatedGrams(df: DataFrame, idCol: String, textCol: String,
      minWidth: Int): DataFrame =
    gramGroups(
      df.select(col(idCol).cast("string").as("__d"),
          lit(0).as("__s"), col(textCol).as("__t")),
      minWidth)
      .filter(col("n_occurrences") >= 2)
      .select(col("dup_text"), col("n_occurrences"))

  /** Cross-corpus (pair-mode) global suffix ranking —
    * resolve_duplicates_pair (nvtext/deduplicate.hpp:95) at the same
    * O(occurrences) hot-clique bound as [[duplicatedGrams]]: every
    * minWidth-gram present in BOTH sources (srcCol ∈ {0, 1}), with the
    * exact per-source occurrence counts — a contamination screen whose
    * cost never touches train×eval pair space (the posting-list pair
    * path's C(n_train·n_eval) hot-gram caveat). One tagged scan; the
    * source tag rides each position row (doc-constant, 4 bytes) into
    * the final group's two conditional counts. Documents are keyed by
    * (src, id) internally so an id reused across sources can never
    * attach the wrong text. */
  def duplicatedGramsPair(df1: DataFrame, df2: DataFrame, idCol: String,
      textCol: String, minWidth: Int): DataFrame =
    gramGroups(
      df1.select(col(idCol), col(textCol), lit(0).as("__src"))
        .union(df2.select(col(idCol), col(textCol), lit(1).as("__src")))
        .select(concat(col("__src"), lit("#"), col(idCol).cast("string"))
            .as("__d"),
          col("__src").as("__s"), col(textCol).as("__t")),
      minWidth)
      .filter(col("n_src0") >= 1 && col("n_src1") >= 1)
      .select(col("dup_text"), col("n_src0"), col("n_src1"))

  /** Shared depth-truncated global ranking core: input is a tagged
    * (__d unique doc key, __s source tag, __t text) frame; output one
    * row per minWidth-gram occurring at ≥ 2 positions corpus-wide —
    * (dup_text, n_occurrences, n_src0, n_src1) — callers refine to
    * their policy (cross-source presence implies ≥ 2 occurrences, so
    * the pre-text-join singleton drop loses nothing in pair mode). */
  private def gramGroups(tagged: DataFrame, minWidth: Int): DataFrame = {
    val spark = tagged.sparkSession
    import spark.implicits._
    val (keyed, texts) = rankedKeyed(tagged, minWidth)
    // representative text fetch stays JVM-side (String.substring), the
    // same UTF-16 position space charAt indexed — mixing in Spark SQL
    // substring (code-point semantics) would shift grams on any
    // surrogate-pair content. Rows here = distinct candidate grams.
    // Output projection: a gram whose boundary splits a surrogate pair
    // carries a lone half, which the UTF-8 string layer renders as '?'
    // in dup_text — grouping and counts happen in UTF-16 rank space
    // and are exact regardless (DedupSpec halo-parity spec pins this).
    keyed.groupBy($"r", $"r2")
      .agg(count(lit(1)).as("n_occurrences"),
        sum(when($"__s" === 0, 1L).otherwise(0L)).as("n_src0"),
        sum(when($"__s" === 1, 1L).otherwise(0L)).as("n_src1"),
        min(struct($"__d", $"pos")).as("rep"))
      // singleton grams drop BEFORE any text ships (cross-source
      // presence implies >= 2 occurrences, so this is a pure superset
      // of both callers' policies)
      .filter($"n_occurrences" >= 2)
      .join(texts, col("rep.__d") === col("__d"))
      .select(col("rep.pos").as("__p"), col("__t"), col("n_occurrences"),
        col("n_src0"), col("n_src1"))
      .as[(Int, String, Long, Long, Long)]
      .map { case (p, t, n, n0, n1) =>
        (t.substring(p, p + minWidth), n, n0, n1) }
      .toDF("dup_text", "n_occurrences", "n_src0", "n_src1")
  }

  /** Shared depth-truncated ranking pipeline behind the gram-level
    * ([[gramGroups]]) and span-level ([[duplicatedSpans]] /
    * [[contaminatedSpans]]) surfaces: returns (`keyed`, `texts`) where
    * `keyed` has one row per FULL-gram lead position — (__d, __s, pos,
    * r, r2), (r, r2) the gram's injective group key — and `texts` is
    * the filtered tagged input for representative-text joins. */
  private def rankedKeyed(tagged: DataFrame, minWidth: Int)
      : (DataFrame, DataFrame) = {
    require(minWidth >= 2, "minWidth must be >= 2")
    val spark = tagged.sparkSession
    import spark.implicits._
    // largest power of two <= minWidth; w >= minWidth/2 guarantees the
    // overlapping-halves pairing covers the gram exactly
    val w = Integer.highestOneBit(minWidth)
    // Pre-filter note: Spark SQL length() counts CODE POINTS while the
    // whole pipeline (positions, packed ranks, substring extraction)
    // indexes UTF-16 units — a `length >= minWidth` filter would drop
    // a doc whose UTF-16 length qualifies via surrogate pairs (found
    // by the DedupSpec surrogate spec). UTF-16 length <= 2 * code
    // points, so `2 * length >= minWidth` is the safe superset; the
    // exact full-gram gate is the per-position __ok flag below.
    // position explode + initial rank pack are CPU-dense map work on
    // the raw scan: guard against unsplittable single-row-group inputs
    // serializing them (Spread scaladoc; measured doc_substring_dups
    // 1.42 s -> 1.11 s, hot-clique rows unchanged)
    val texts = Spread.spread(tagged
      .filter(col("__t").isNotNull && length(col("__t")) * 2 >= minWidth))
    // one row per character position; __ok marks positions that start
    // a FULL minWidth-gram (rank rounds keep every position — ranks of
    // tail positions feed earlier positions' keys — but only __ok rows
    // reach the final grouping). Initial ranks pack TWO UTF-16 units
    // into one Long — (c1 << 17) | (c2 << 1 | 1), low bit = "second
    // char exists" so a truncated doc-final pack can never collide
    // with a real 2-gram — which starts the doubling at width 2 and
    // saves one full re-rank round (distinct + join + checkpoint).
    // The initial position frame is EAGER-cut: leadByPos scans its
    // input twice (main + halo branches of the block union), so an
    // unmaterialized frame would run the per-char flatMap once per
    // branch (StageProfile on the hot-clique gate showed the 37 MB
    // position subtree executing 3x in round 1 before this cut).
    var cur = texts.select($"__d", $"__s", $"__t").as[(String, Int, String)]
      .flatMap { case (d, s, t) =>
        val lastOk = t.length - minWidth
        (0 until t.length).iterator.map { p =>
          val c2 = if (p + 1 < t.length)
            (t.charAt(p + 1).toLong << 1) | 1L else 0L
          (d, s, p, p <= lastOk, (t.charAt(p).toLong << 17) | c2)
        }
      }
      .toDF("__d", "__s", "pos", "__ok", "r")
      .transform(Checkpoints.cut)
    val block = math.max(spark.conf.getOption(BlockCharsKey)
      .map(_.toInt).getOrElse(DefaultBlockChars), w)
    var width = 2
    while (width < w) {
      // led is consumed TWICE — the rerank join's left side and
      // rerankIds' RDD pass (an RDD boundary, so exchange reuse can
      // never dedup it): cut it so each round's doc-window lead pass
      // computes once, not twice. Superseded round frames are freed as
      // soon as their successor is materialized (eager cuts).
      val led = leadByPos(cur, width, block).transform(Checkpoints.cut)
      // The rerank join's BOTH sides are corpus-positions-sized by
      // construction — never broadcastable. Pin sort-merge: a
      // LocalRelation-sourced corpus (unit probes; schema-default byte
      // estimates, 20 B/string) otherwise under-estimates `led` and
      // Spark attempts a multi-GiB broadcast of the position frame.
      val next = led.join(rerankIds(led).hint("merge"), Seq("r", "r2"))
        .select($"__d", $"__s", $"pos", $"__ok", $"__nr".as("r"))
        .transform(Checkpoints.cut)
      org.apache.spark.sql.graftshim.CheckpointUtil.free(led)
      org.apache.spark.sql.graftshim.CheckpointUtil.free(cur)
      cur = next
      width *= 2
    }
    val keyed = (if (minWidth == w) cur.withColumn("r2", $"r")
      else leadByPos(cur, minWidth - w, block))
      .filter($"__ok")
    (keyed, texts)
  }

  /** Maximal duplicated spans per document — the gram surface lifted
    * to RUNS (nvtext/deduplicate.hpp's removal use-case, and the
    * shape training-data dedup actually deletes): one row per maximal
    * [span_start, span_end) UTF-16 range whose every position is
    * covered by some minWidth-gram occurring ≥ 2 times corpus-wide.
    * Adjacent/overlapping gram intervals merge (the events_interval
    * _union sweep: a break only where a lead clears the running
    * covered peak), so each emitted span is as long as the duplicated
    * evidence supports and two spans never touch. Output: (idCol as
    * string, span_start, span_end, span_len). The sweep partitions by
    * document over DUPLICATED lead positions only — sparse for real
    * corpora; a pathological fully-duplicated multi-GB single doc
    * re-serializes its sweep into one task (gram counting itself
    * stays halo-blocked). */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      minWidth: Int): DataFrame = {
    val tagged = df.select(col(idCol).cast("string").as("__d"),
      lit(0).as("__s"), col(textCol).as("__t"))
    spansOf(tagged, minWidth, col("__n") >= 2)
      .withColumnRenamed("__d", idCol)
  }

  /** Cross-corpus contamination spans: maximal ranges of `df1`
    * documents covered by minWidth-grams that ALSO occur in `df2` —
    * the decontamination deletion list (cut these spans from the
    * training corpus and no minWidth-gram bridges into the eval set).
    * Same O(occurrences) ranking as [[duplicatedGramsPair]]. */
  def contaminatedSpans(df1: DataFrame, df2: DataFrame, idCol: String,
      textCol: String, minWidth: Int): DataFrame = {
    val tagged = df1.select(col(idCol), col(textCol), lit(0).as("__src"))
      .union(df2.select(col(idCol), col(textCol), lit(1).as("__src")))
      .select(concat(col("__src"), lit("#"), col(idCol).cast("string"))
          .as("__d"),
        col("__src").as("__s"), col(textCol).as("__t"))
    spansOf(tagged, minWidth,
        col("__s") === 0 && col("__n1") >= 1)
      .withColumn(idCol, expr("substring(__d, 3)"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("span_len"))
  }

  /** Span assembly shared by [[duplicatedSpans]] / [[contaminatedSpans]]:
    * per-gram-group occurrence counts ride a window over the ranked
    * lead positions (__n total, __n1 source-1), `keep` selects the
    * lead positions that count as duplicated evidence, and the
    * interval-union sweep merges their [pos, pos+minWidth) covers into
    * maximal spans. */
  private def spansOf(tagged: DataFrame, minWidth: Int,
      keep: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (keyed, _) = rankedKeyed(tagged, minWidth)
    val g = Window.partitionBy(col("r"), col("r2"))
    val leads = keyed
      .withColumn("__n", count(lit(1)).over(g))
      .withColumn("__n1",
        sum(when(col("__s") === 1, 1L).otherwise(0L)).over(g))
      .filter(keep)
      .select(col("__d"), col("pos"))
    val byDoc = Window.partitionBy(col("__d")).orderBy(col("pos"))
    val peak = max(col("pos") + minWidth)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    leads
      .withColumn("__new",
        when(peak.isNull || col("pos") > peak, 1).otherwise(0))
      .withColumn("__island", sum(col("__new"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__d"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + minWidth).as("span_end"))
      .select(col("__d"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
  }

  /** Conf key: positions per ranking block (UTF-16 units). Default 4 M
    * (the chunk-SA per-task bound); lower it only in tests. */
  val BlockCharsKey = "spark.graft.substring.blockChars"
  val DefaultBlockChars: Int = 1 << 22

  /** `r2(p) := r(p + width)` (−1 past doc end) WITHOUT a per-document
    * window: positions are range-partitioned into fixed blocks of
    * `block` units — window key (__d, pos div block) — and each block's
    * first `width` positions are ALSO copied to the previous block as a
    * read-only halo, so every in-block `lead` sees its +width neighbor.
    * Positions are dense per doc (the initial flatMap emits every
    * index and rank rounds keep all of them), so row-lead == position
    * -lead inside the contiguous main+halo span, and a missing lead
    * (doc end) is exactly the old per-doc window's null.
    *
    * A doc shorter than `block` occupies ONE block — identical frame,
    * empty halo, same plan shape as the old per-doc window. A multi-GB
    * document (which the reference's ≤2 GB single-device corpus cap
    * cannot even hold — nvtext/deduplicate.hpp:40) spreads over
    * len/block tasks instead of serializing into one; per-task memory
    * is block+width positions regardless of document size. Halo
    * overhead: width/block ≤ minWidth/4M extra rows per round. */
  private def leadByPos(cur: DataFrame, width: Int, block: Int)
      : DataFrame = {
    require(block >= width, s"block $block < width $width")
    val main = cur
      .withColumn("__blk", expr(s"CAST(pos DIV $block AS LONG)"))
      .withColumn("__keep", lit(true))
    val halo = cur.filter(col("pos") >= block && col("pos") % block < width)
      .withColumn("__blk", expr(s"CAST(pos DIV $block AS LONG) - 1"))
      .withColumn("__keep", lit(false))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__d"), col("__blk")).orderBy(col("pos"))
    main.unionByName(halo)
      .withColumn("r2", coalesce(lead(col("r"), width).over(win), lit(-1L)))
      .filter(col("__keep"))
      .drop("__blk", "__keep")
  }

  /** Order-free injective re-ranking for one doubling round: distinct
    * (r, r2) pairs get fresh Long ids via zipWithUniqueId (a
    * partition-strided assignment — injective with NO global sort,
    * which suffices because downstream only tests rank EQUALITY; ids
    * are arbitrary but consistent: the caller localCheckpoints the
    * joined result, pinning one assignment). */
  private def rerankIds(led: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val keys = led.select(col("r"), col("r2")).distinct()
    led.sparkSession.createDataFrame(
      keys.rdd.zipWithUniqueId().map { case (row, i) =>
        Row(row.getLong(0), row.getLong(1), i) },
      StructType(Seq(StructField("r", LongType, nullable = false),
        StructField("r2", LongType, nullable = false),
        StructField("__nr", LongType, nullable = false))))
  }
}
