package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / NLP column functions (SURVEY.md §2.11 — nvtext surface:
  * tokenize.hpp:51-293, generate_ngrams.hpp:49, minhash.hpp:62,
  * jaccard.hpp:63, normalize.hpp; plus the LLM-pipeline text-analysis
  * ops from the north star).
  *
  * Everything is composed from codegen'd built-ins (split / higher-order
  * lambdas / xxhash64), so these run inside WholeStageCodegen as a pure
  * map stage — no UDF boundary, no shuffle — and scale linearly with
  * input bytes. The minhash/simhash kernels use Spark's `xxhash64`
  * (the same hash family as the reference's xxhash_64, hashing.hpp:194).
  */
object TextFunctions {

  /** Whitespace tokenizer (nvtext/tokenize.hpp:51), lower-cased.
    * CONTRACT: an empty/whitespace-only string yields [""] — one empty
    * token — because split("", ...) does; the DuckDB oracle mirror
    * (string_split_regex) behaves identically, which is what keeps the
    * token-derived queries hash-equal. Callers needing nvtext's
    * count_tokens = 0 semantics filter empties explicitly. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Whitespace normalizer (nvtext/normalize.hpp normalize_spaces).
    * Squeeze runs FIRST, then trim: Spark's trim only strips spaces, so
    * trimming first would leave a trailing "\n" to become " "
    * (reference example: "  c  d\n" → "c d"). */
  def normalizeWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Unicode NFC composition (character_normalizer half,
    * normalize.hpp:51; DuckDB `nfc_normalize` is the oracle analog). */
  def nfc(c: Column): Column = graft.plans.UnicodeNormalize.nfc(c)

  /** HTML → text extraction (north star: the first stage of every
    * web-crawl pipeline — WET-style tag stripping, not a DOM parser):
    * drop comments and script/style subtrees, replace remaining tags
    * with a space (so `</p><p>` never glues words), decode the six
    * ubiquitous entities, squeeze whitespace. Pure codegen map, zero
    * shuffle, linear in bytes. Patterns avoid backreferences and
    * possessives so the identical regexes run under both java.util.regex
    * and RE2 (the DuckDB oracle). */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(
        regexp_replace(c, "(?s)<!--.*?-->", " "),
        "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&") // &amp; LAST
      .foldLeft(noTags) { case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) }
    normalizeWs(decoded)
  }

  /** Accent stripping: NFD-decompose then drop combining marks (Mn) —
    * the reference couples this with lower-casing (normalize.hpp:70). */
  def stripAccents(c: Column): Column =
    regexp_replace(graft.plans.UnicodeNormalize(c, "NFD"), "\\p{Mn}", "")

  /** Full character normalization for dedup/tokenize pipelines:
    * NFC → lower → de-accent → whitespace squeeze. The punctuation/CJK
    * padding variant is [[graft.plans.CharacterNormalize]]. */
  def normalizeText(c: Column): Column =
    normalizeWs(stripAccents(lower(nfc(c))))

  /** BPE-style pretokenizer (north star "BPE-ish regex"; the regex split
    * that precedes merge-table lookup in byte_pair_encoding.hpp): runs of
    * letters, runs of digits, or single non-space symbols. */
  def bpeRegexTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Token count (tokenize.hpp count_tokens). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Distinct-token (type) count. */
  def typeCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Bag-of-words document fingerprint: md5 over the sorted distinct
    * token set. Documents with identical token sets collide — the
    * classic "fingerprint dedup" key (nvtext/deduplicate.hpp analog at
    * document granularity). */
  def fingerprint(c: Column): Column =
    md5(array_join(sort_array(array_distinct(tokens(c))), " "))

  /** Character n-grams of a string column (generate_ngrams.hpp:115).
    * Takes a column NAME (used inside a SQL lambda). Strings shorter
    * than n yield an EMPTY array — without the guard, Spark's
    * sequence(1, 0) is the DESCENDING [1, 0] and position 0 emits a
    * bogus whole-string gram. */
  def charNgrams(strCol: String, n: Int): Column =
    expr(s"CASE WHEN length($strCol) >= $n THEN " +
      s"transform(sequence(1, length($strCol) - ${n - 1}), " +
      s"i -> substring($strCol, i, $n)) " +
      s"ELSE CAST(array() AS ARRAY<STRING>) END")

  /** Internal n-gram join delimiter: U+001F (unit separator), which
    * whitespace-split tokens essentially never contain -- an in-band
    * character like '_' made distinct docs collide ("a_b" vs "a b"
    * built the SAME shingle, and the exact verify then CONFIRMED the
    * false pair at jaccard 1.0). Oracles replay it as chr(31). */
  final val NgramSep: String = "\u001f"

  /** Token n-grams from a token-array column (generate_ngrams.hpp:49):
    * joins each sliding window of n tokens with [[NgramSep]]. Arrays
    * shorter than n yield an EMPTY array (same sequence(1, 0) guard as
    * charNgrams — slice(_, 0, _) would otherwise throw). */
  def tokenNgrams(toksCol: String, n: Int): Column =
    expr(s"CASE WHEN size($toksCol) >= $n THEN " +
      s"transform(sequence(1, size($toksCol) - ${n - 1}), " +
      s"i -> array_join(slice($toksCol, i, $n), '$NgramSep')) " +
      s"ELSE CAST(array() AS ARRAY<STRING>) END")

  /** MinHash signature (nvtext/minhash.hpp:62): k minimum xxhash64
    * values over the token array, one per seed. Returns array<long>
    * of length k. Engine-native compositional surface; the dedup
    * PIPELINE uses the fused portable-hash kernel
    * ([[minhashBandKeys]]), a different hash family. */
  def minhashSig(toksCol: String, k: Int): Column =
    minhashSigOf(col(toksCol), k)

  /** [[minhashSig]] over an arbitrary array-of-strings Column. */
  def minhashSigOf(toks: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(toks, t => xxhash64(t, i))))

  /** Word n-gram shingles for order-sensitive near-dup detection
    * (nvtext/minhash.hpp:156 minhash_ngrams operates on ngrams of
    * tokens). Documents shorter than n tokens fall back to one shingle
    * of the whole document, so no doc hashes to an empty set. */
  def shingles(toksCol: String, n: Int): Column =
    when(size(col(toksCol)) >= n, array_distinct(tokenNgrams(toksCol, n)))
      .otherwise(array(array_join(col(toksCol), NgramSep)))

  /** MinHash signature over word n-gram shingles (minhash_ngrams,
    * nvtext/minhash.hpp:156) — [[minhashSigOf]] composed over
    * [[shingles]], so the shingle definition lives in exactly one place.
    * Unlike [[minhashSig]] over the distinct token SET, this is
    * order-sensitive: permuted documents get different shingles, the
    * standard formulation for document near-dup detection. */
  def minhashNgramSig(toksCol: String, n: Int, k: Int): Column =
    minhashSigOf(shingles(toksCol, n), k)

  /** LSH band keys for a minhash signature column: hash of each band's
    * slice of the signature, tagged with the band index. Docs sharing
    * any band key are near-dup candidates. Compositional form kept for
    * the signature-API surface; the DEDUP PIPELINE uses the fused
    * [[minhashBandKeys]] (this form re-inlines the signature expression
    * into every band's slice after projection collapse). */
  def minhashBands(sigCol: String, bands: Int, rowsPerBand: Int): Column =
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"b -> concat(b, ':', xxhash64(array_join(" +
      s"slice($sigCol, b * $rowsPerBand + 1, $rowsPerBand), ','))))")

  /** Fused tokens → minhash signature → band keys, one kernel pass
    * (graft.plans.MinHashBandKeys) — the hot path of minhash LSH.
    * Portable MD5-60 + affine hashing: oracle-replayable in SQL. */
  def minhashBandKeys(toks: Column, numHashes: Int, bands: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    column(graft.plans.MinHashBandKeys(expression(toks), numHashes, bands))
  }

  /** 60-bit SimHash over the token array: per bit, sign of the sum of
    * ±1 votes from each token's portable MD5-60 hash bit — fused
    * one-pass kernel (graft.plans.SimHash60). Portable hashing makes
    * the signature — and the Hamming-LSH pairs built on it —
    * replayable in the DuckDB oracle. */
  def simhash60(toksCol: String): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    column(graft.plans.SimHash60(expression(col(toksCol))))
  }

  /** Hamming distance between two simhash columns. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Per-row Jaccard similarity of two token-array columns
    * (nvtext/jaccard.hpp:63), over distinct tokens. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(array_distinct(a)) + size(array_distinct(b)) - inter)
  }

  /** Greedy text wrap at `width` characters (strings/wrap.hpp:57):
    * whitespace at each wrap point becomes a newline, words are never
    * split. Pure regexp_replace → codegen'd, and the same pattern is
    * expressible in DuckDB for oracle checking. */
  def wrap(c: Column, width: Int): Column =
    rtrim(regexp_replace(c, s"(\\S.{0,${width - 1}})(\\s+|$$)", "$1\n"), "\n")

  /** Center-pad to `width` with `fill` (strings/padding.hpp:46 pad with
    * side_type::BOTH = Python str.center): the split keys on the
    * parity of WIDTH, not of the pad — "an odd width will
    * right-justify" (pad_impl.cuh), i.e. odd width puts the odd extra
    * fill char on the LEFT (right = ⌊pad/2⌋), even width on the RIGHT
    * (left = ⌊pad/2⌋); e.g. center("foxx", 7, '+') = "++foxx+".
    * Strings already ≥ width pass through unchanged. lpad/rpad take
    * the length as an EXPRESSION here (per-row left target), which the
    * typed functions API doesn't expose — call_function reaches the
    * same codegen'd StringLPad/StringRPad. */
  def padCenter(c: Column, width: Int, fill: String): Column = {
    require(fill.length == 1, "center pad takes a single fill char")
    val len = length(c)
    val pad = lit(width) - len
    val left =
      if (width % 2 == 1) (pad - floor(pad / 2)).cast("int")
      else floor(pad / 2).cast("int")
    when(len >= width, c).otherwise(
      call_function("rpad",
        call_function("lpad", c, (len + left).cast("int"), lit(fill)),
        lit(width), lit(fill)))
  }

  /** Positions of each target within the string (strings/find_multiple
    * .hpp:46): 0-based first occurrence, -1 if absent. */
  def findMultiple(c: Column, targets: Seq[String]): Column =
    array(targets.map(t => (instr(c, t) - 1).as(t)): _*)

  /** 3-way split on the FIRST occurrence of `sep` (cudf strings
    * partition, python/cudf str.partition): struct(head, sep, tail);
    * when `sep` is absent → (whole, "", ""); NULL input → NULL struct
    * (the reference null-propagates rather than fabricating fields). */
  def strPartition(c: Column, sep: String): Column = {
    require(sep.nonEmpty, "partition separator must be non-empty")
    val pos = instr(c, sep)
    when(c.isNotNull,
      when(pos > 0, struct(
          substring_index(c, sep, 1).as("head"),
          lit(sep).as("sep"),
          expr_substr_after(c, sep).as("tail")))
        .otherwise(struct(c.as("head"), lit("").as("sep"), lit("").as("tail"))))
  }
  private def expr_substr_after(c: Column, sep: String): Column =
    c.substr(instr(c, sep) + sep.codePointCount(0, sep.length), length(c))

  /** Seconds (non-negative BIGINT) → "D days HH:MM:SS" duration string
    * (strings/convert/convert_durations.hpp to_durations, %D days
    * %H:%M:%S format); the day component is omitted when zero, matching
    * the reference's %D day-first rendering convention. Pure built-in
    * composition → codegen'd, oracle-expressible. */
  def formatDuration(secs: Column): Column = {
    val d = floor(secs / 86400).cast("long")
    val hms = concat_ws(":",
      lpad(floor(secs % 86400 / 3600).cast("long").cast("string"), 2, "0"),
      lpad(floor(secs % 3600 / 60).cast("long").cast("string"), 2, "0"),
      lpad((secs % 60).cast("long").cast("string"), 2, "0"))
    when(d > 0, concat(d.cast("string"), lit(" days "), hms)).otherwise(hms)
  }

  /** Inverse of [[formatDuration]]: "D days HH:MM:SS" or "HH:MM:SS" →
    * total seconds BIGINT (convert_durations.hpp from_durations). */
  def parseDuration(s: Column): Column = {
    val days = when(s.contains(" days "),
      substring_index(s, " days ", 1).cast("long")).otherwise(lit(0L))
    val hms = when(s.contains(" days "), substring_index(s, " days ", -1))
      .otherwise(s)
    val p = split(hms, ":")
    days * 86400 + element_at(p, 1).cast("long") * 3600 +
      element_at(p, 2).cast("long") * 60 + element_at(p, 3).cast("long")
  }

  /** Fused tokenize → n-grams (nvtext/ngrams_tokenize.hpp:80): one call
    * from raw text to joined token n-grams. Guarded: Spark's sequence(1,
    * 0) DESCENDS, so short docs return an empty array explicitly. */
  def ngramsTokenize(c: Column, n: Int, sep: String = "_"): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), sep)))
      .otherwise(array().cast("array<string>"))
  }

  /** replace_tokens (nvtext/replace.hpp:23): whitespace-tokenize,
    * replace each token found in `replacements`, rejoin with single
    * spaces. The mapping ships as a plan-literal map (codegen'd
    * element_at lookup, no UDF); whitespace runs normalize to one
    * space — the curation-pipeline contract (tokens(), BPE, and the
    * dedup normalizers all tokenize the same way). */
  def replaceTokens(c: Column, replacements: Map[String, String]): Column = {
    val m = map(replacements.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    array_join(
      transform(split(trim(c), "\\s+"), t => coalesce(element_at(m, t), t)),
      " ")
  }

  /** filter_tokens (nvtext/replace.hpp:86): drop tokens shorter than
    * `minLen` characters (or substitute `repl` when non-empty), rejoin
    * with single spaces. Same normalize-whitespace contract as
    * [[replaceTokens]]. */
  def filterTokens(c: Column, minLen: Int, repl: String = ""): Column = {
    val toks = split(trim(c), "\\s+")
    if (repl.isEmpty)
      array_join(filter(toks, t => length(t) >= minLen), " ")
    else
      array_join(transform(toks,
        t => when(length(t) >= minLen, t).otherwise(lit(repl))), " ")
  }

  /** Named character-type predicates (strings/char_types/char_types.hpp
    * all_characters_of_type): whole-string class tests. Anchored \A..\z
    * patterns work identically in Java regex and DuckDB's RE2. */
  def isAlpha(c: Column): Column = c.rlike("\\A\\p{L}+\\z")
  def isDigit(c: Column): Column = c.rlike("\\A\\p{Nd}+\\z")
  def isAlnum(c: Column): Column = c.rlike("\\A[\\p{L}\\p{Nd}]+\\z")
  def isSpaceStr(c: Column): Column = c.rlike("\\A\\s+\\z")
  /** All cased characters upper/lower (cudf is_upper/is_lower). */
  def isUpperStr(c: Column): Column = c === upper(c)
  def isLowerStr(c: Column): Column = c === lower(c)

  /** Language-profile stopword sets for the n-gram-free heuristic
    * language identifier. Marker words are checked with multiplicity. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "join"),
    "es" -> Seq("el", "los", "y", "sort"),
    "de" -> Seq("der", "die", "und", "scan"),
    "fr" -> Seq("le", "la", "et", "merge"),
    "zh" -> Seq("的", "是", "filter"))

  /** Language-ID with CONFIDENCE: (lang, hits, margin) where margin is
    * top1 − top2 profile hit counts — the filterable signal langId's
    * bare argmax hides (margin 0 = a coin flip between profiles; docs
    * below a margin threshold go to a human / a heavier model). Integer
    * arithmetic end-to-end, engine-portable. */
  def langIdWithMargin(toks: Column): Column = {
    val scores = langProfiles.map { case (_, ws) => hitCount(toks, ws) }
    val sorted = sort_array(array(scores: _*), asc = false)
    struct(langId(toks).as("lang"),
      element_at(sorted, 1).as("hits"),
      (element_at(sorted, 1) - element_at(sorted, 2)).as("margin"))
  }

  /** Out-of-band sentence separator for [[sentences]] (ASCII RS). */
  val SentSep = "\u001E"

  /** Sentence segmentation: split after `.`/`!`/`?` followed by
    * whitespace — the pre-chunking step RAG and curation pipelines
    * need before windowing. A deliberate regex heuristic (abbreviations
    * like "Dr. Smith" over-split; the fix is model-based segmentation,
    * out of engine scope). Backreference-in-rewrite only — no
    * lookaround — so java.util.regex and RE2 agree; pure codegen map. */
  def sentences(c: Column): Column =
    split(regexp_replace(c, "([.!?])\\s+", "$1" + SentSep), SentSep)

  /** 3-way split on the LAST occurrence of `sep`
    * (strings/split/partition.hpp:100 rpartition, the companion of
    * [[strPartition]]): struct(head, sep, tail); `sep` absent →
    * ("", "", whole); NULL input → NULL struct (null-propagating like
    * the reference). Last-occurrence position from one reversed instr;
    * a single codegen map, no iteration. The separator is reversed by
    * CODE POINTS (Spark's reverse() is code-point-wise, so a UTF-16
    * char reverse would split surrogate pairs and never match a
    * non-BMP separator). */
  def strRpartition(c: Column, sep: String): Column = {
    require(sep.nonEmpty, "rpartition separator must be non-empty")
    val rp = instr(reverse(c), reverseCodePoints(sep))
    // sep length in CODE POINTS: Spark's length()/substr() are
    // code-point-wise, java's String.length is UTF-16 units
    val sepLen = sep.codePointCount(0, sep.length)
    val p = length(c) - rp - lit(sepLen) + 2 // 1-based start, last hit
    when(c.isNotNull,
      when(rp > 0, struct(
          c.substr(lit(1), p - 1).as("head"),
          lit(sep).as("sep"),
          c.substr(p + lit(sepLen), length(c)).as("tail")))
        .otherwise(struct(lit("").as("head"), lit("").as("sep"), c.as("tail"))))
  }

  /** Reverse a string by Unicode code points (surrogate pairs kept
    * intact) — the literal-side twin of Spark's code-point reverse(). */
  private def reverseCodePoints(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = s.length
    while (i > 0) {
      val cp = s.codePointBefore(i)
      sb.appendCodePoint(cp)
      i -= Character.charCount(cp)
    }
    sb.toString
  }

  /** Count of tokens that hit a word set (with multiplicity). */
  def hitCount(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Heuristic language id: argmax profile hit count, ties broken in
    * profile order. */
  def langId(toks: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> hitCount(toks, ws) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((l, s), i), elseCol) =>
        val rest = scores.drop(i + 1).map(_._2)
        val hi = if (rest.size == 1) rest.head else greatest(rest: _*)
        when(s >= hi, l).otherwise(elseCol)
    }
  }

  /** Composite quality score in [0,1]: type/token ratio, non-stopword
    * ratio, and a capped mean token length, equally weighted-ish.
    * Deterministic double arithmetic (no engine-divergent ops). */
  def qualityScore(toksCol: String): Column = {
    val toks = col(toksCol)
    val nTok = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio = hitCount(toks, Seq("the", "a", "and", "of")).cast("double") / nTok
    val avgLen = expr(s"aggregate($toksCol, 0, (acc, x) -> acc + length(x))")
      .cast("double") / nTok
    lit(0.4) * ttr + lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(avgLen / 10.0, lit(1.0))
  }

  /** Unicode script ranges for [[scriptCount]]/[[dominantScript]] — the
    * step BEFORE language id in a web-corpus pipeline (script gates
    * which langid profiles even apply). Explicit BMP code-point ranges,
    * written as literal characters so the IDENTICAL class works in both
    * Spark's Java regex and DuckDB's RE2 (no \p{...} dialect
    * divergence). Order is the deterministic tie-break priority. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-zÀ-ɏ",
    "cyrillic" -> "Ѐ-ӿ",
    "greek" -> "Ͱ-Ͽ",
    "arabic" -> "؀-ۿ",
    "cjk" -> "⺀-鿿぀-ヿ가-힯",
    "digit" -> "0-9")

  /** Characters of `c` inside the code-point class (count via strip of
    * the complement — pure codegen map expression). */
  def scriptCount(c: Column, range: String): Column =
    length(regexp_replace(c, s"[^$range]", ""))

  /** List → string representation (strings/convert/convert_lists.hpp
    * format_list_column): "[e1,e2,...]", null elements rendered as
    * `nullToken` (the reference's na_rep). Codegen'd built-ins —
    * array_join carries the null replacement natively. */
  def listRepr(c: Column, nullToken: String = "NULL"): Column =
    concat(lit("["),
      array_join(c.cast("array<string>"), ",", nullToken), lit("]"))

  /** Nested (depth-2) list → string: "[[..],[..]]" — each inner list
    * renders via [[listRepr]] rules (convert_lists.hpp handles
    * arbitrary nesting; depth-2 covers the common shape, deeper nests
    * compose the same transform). */
  def listReprNested(c: Column, nullToken: String = "NULL"): Column =
    concat(lit("["),
      // outer null replacement too: a NULL inner list renders as the
      // nullToken (the reference emits na_rep at every depth), not
      // silently dropped.
      array_join(transform(c, inner => listRepr(inner, nullToken)), ",",
        nullToken),
      lit("]"))

  /** Dominant script label: argmax over [[ScriptRanges]] counts, ties
    * resolved by range order; "other" when no listed script matches. */
  def dominantScript(c: Column): Column = {
    val counts = ScriptRanges.map { case (l, r) => l -> scriptCount(c, r) }
    counts.zipWithIndex.foldRight(lit("other"): Column) {
      case (((label, cnt), i), elseCol) =>
        val rest = counts.drop(i + 1).map(_._2)
        val beatsRest =
          if (rest.isEmpty) cnt > 0
          else {
            val hi = if (rest.size == 1) rest.head else greatest(rest: _*)
            cnt > 0 && cnt >= hi
          }
        when(beatsRest, label).otherwise(elseCol)
    }
  }
}
