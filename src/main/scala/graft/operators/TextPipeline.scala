package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for training-data pipelines (north star:
  * text analysis at 100 TB). Everything is groupBy/join plans — shuffle
  * volume is token-vocabulary- or doc-count-bounded, never pair-shaped.
  */
object TextPipeline {

  /** Per-(doc, term) TF-IDF. One explode → one (doc,term) groupBy →
    * one term-keyed join against document frequencies; the corpus size
    * joins in as a broadcast 1-row aggregate (no driver action).
    *
    * `logIdf = false` uses the rational idf N/df(t) — exact integer/
    * double arithmetic, DuckDB-oracle-safe. `true` uses the standard
    * ln(N/df(t)) (libm: excluded from oracles by policy, unit-tested
    * against math.log instead). */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
      logIdf: Boolean = true): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_t")) // tf rows are distinct (doc,term)
    val n = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val idf =
      if (logIdf) log(col("n_docs").cast("double") / col("df_t"))
      else col("n_docs").cast("double") / col("df_t")
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc"), col("term"), col("tf"), col("df_t"),
        (col("tf") * idf).as("tfidf"))
  }

  /** Per-(doc, term) Okapi BM25 — the relevance/selection score behind
    * retrieval-based data curation (and the lexical half of hybrid
    * search). Same shuffle budget as [[tfidf]] plus one per-doc length
    * column: tokenize ONCE, fold to (doc, term, tf) carrying the doc
    * length through the groupBy key (dl is functionally dependent on
    * doc, so the extra key adds no groups), join term document
    * frequencies, broadcast the 1-row corpus aggregate (N, avgdl).
    * Nothing driver-side; vocabulary-bounded shuffles only.
    *
    * `logIdf = false` uses the rational Robertson idf
    * (N − df + 0.5)/(df + 0.5) — exact IEEE arithmetic, DuckDB-oracle-
    * safe. `true` is the standard ln(1 + that) (libm: excluded from
    * oracles by policy, unit-tested against math.log). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    val toks = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("_t"))
      .withColumn("dl", size(col("_t")))
    val tf = toks
      .select(col("doc"), col("dl"), explode(col("_t")).as("term"))
      .groupBy(col("doc"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_t")) // tf rows are distinct (doc,term)
    val corpus = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("_dl_sum"))
    val rawIdf = (col("n_docs").cast("double") - col("df_t") + lit(0.5)) /
      (col("df_t") + lit(0.5))
    val idf = if (logIdf) log(rawIdf + lit(1.0)) else rawIdf
    val avgdl = col("_dl_sum").cast("double") / col("n_docs")
    val tfSat = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc"), col("term"), col("tf"), col("dl"), col("df_t"),
        (idf * tfSat).as("bm25"))
  }

  /** Corpus n-gram diversity per group (north star: the distinct-n /
    * mode-collapse metric for synthetic-data QA — a generator stuck in
    * loops shows collapsing distinct-ratios at higher n): for each
    * (group, n ≤ maxN), total n-grams, distinct n-grams, and their
    * ratio. ONE tokenize pass — every order's grams are tagged (n, gram)
    * in-row and exploded together; counting is two-phase (gram-keyed
    * partial, then group-keyed fold), so no countDistinct expand and the
    * shuffle is vocabulary-bounded. */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1, "need maxN >= 1")
    val toks = df.select(col(groupCol), tokens(col(textCol)).as("_t"))
    val tagged = (1 to maxN).map { n =>
      val grams =
        if (n == 1) col("_t")
        else graft.functions.TextFunctions.tokenNgrams("_t", n)
      transform(grams, g => struct(lit(n).as("n"), g.as("gram")))
    }
    toks.select(col(groupCol), explode(concat(tagged: _*)).as("ng"))
      .select(col(groupCol), col("ng.n").as("n"), col("ng.gram").as("gram"))
      .groupBy(col(groupCol), col("n"), col("gram"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(groupCol), col("n"))
      .agg(sum(col("_c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("distinct_ratio",
        col("distinct_ngrams").cast("double") / col("total_ngrams"))
  }

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-`vocabSize` tokens — tokenizer-coverage diagnostics (which
    * documents a fixed vocab serves badly; rising corpus OOV over crawls
    * signals domain drift). Vocabulary selection is a distributed
    * partial top-k (TakeOrderedAndProject on (count, token) — no global
    * sort), broadcast back over the exploded corpus; one token-keyed
    * count shuffle + one doc-keyed fold. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val base = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = base.groupBy(col("tok")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("_in"))
    base.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1).otherwise(0)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Split documents into fixed-size token windows with overlap — the
    * standard pre-tokenization chunking step for LLM training data.
    * Stride = chunkSize − overlap; the tail chunk may be short but is
    * never empty; docs shorter than chunkSize yield one chunk. Pure map
    * + explode: zero shuffle, linear in corpus bytes. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    // Tokenize ONCE per document, then explode the start positions and
    // slice per chunk. Building chunk_text inside a transform() lambda
    // would re-split the whole document per window (HigherOrderFunctions
    // are interpreted, not codegen'd) — O(windows × doc_len) instead of
    // O(doc_len + chunks × chunkSize).
    //
    // start positions 1, 1+stride, ... covering every token once;
    // last window starts at or before (size - chunkSize) + stride
    val starts = sequence(lit(1),
      greatest(col("_toks_sz") - chunkSize, lit(0)) + lit(stride),
      lit(stride))
    df.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .withColumn("_toks_sz", size(col("_toks")))
      .select(col(idCol), col("_toks"),
        posexplode(starts).as(Seq("chunk_idx", "_start")))
      .withColumn("chunk_text",
        array_join(slice(col("_toks"), col("_start"), lit(chunkSize)), " "))
      // empty/whitespace-only docs keep their chunk_idx-0 row (the
      // documented "docs shorter than chunkSize yield one chunk"
      // contract — a doc must never vanish from the chunk output);
      // only TRAILING empty windows drop
      .filter(col("chunk_text") =!= "" || col("chunk_idx") === 0)
      .withColumn("n_tokens",
        when(col("chunk_text") === "", lit(0))
          .otherwise(size(split(col("chunk_text"), " "))))
      .drop("_toks", "_start")
  }

  /** Per-document n-gram repetition metrics — the Gopher-style
    * repetitiousness filters (Rae et al. 2021 §A1.1): fraction of
    * duplicate n-grams and the share of the most frequent n-gram.
    * Boilerplate and degenerate generations score high on both.
    *
    * Shape: explode → count per (doc, gram) → fold to per-doc stats —
    * two shuffles, both keyed on doc (+gram), never pair-shaped, so it
    * scales like word-count. Docs shorter than n tokens keep a row with
    * zero counts (left join back to the id spine). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    // tokenNgrams takes a column NAME usable in a SQL lambda; alias the
    // tokenized text first so the expression sees a real column. Guard
    // docs with < n tokens: Spark's sequence(1, 0) is the DESCENDING
    // [1, 0] and slice(_, 0, _) throws, so short docs must short-circuit
    // to an empty gram list (explode then drops them; the spine join
    // below restores the row with zero counts).
    val grams = df
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        explode(when(size(col("_toks")) >= n,
            graft.functions.TextFunctions.tokenNgrams("_toks", n))
          .otherwise(array().cast("array<string>")))
          .as("gram"))
    val perGram = grams
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val perDoc = perGram.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("total_ngrams"),
      count(lit(1)).as("distinct_ngrams"),
      max(col("cnt")).as("top_cnt"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total_ngrams"), lit(0L)).as("total_ngrams"),
        coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
      .withColumn("dup_frac",
        when(col("total_ngrams") > 0,
          lit(1.0) - col("distinct_ngrams").cast("double") /
            col("total_ngrams").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("top_frac",
        when(col("total_ngrams") > 0,
          col("top_cnt").cast("double") / col("total_ngrams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Character-distribution quality signals per document: total and
    * distinct character counts plus Shannon entropy (nats) of the
    * character frequency distribution — the classic gibberish /
    * binary-noise detector (natural text sits near 2.5-3.3 nats;
    * uniform noise near ln(alphabet)).
    *
    * CROSS-ENGINE DETERMINISM: a naive sum(p·ln p) aggregates doubles
    * in partition order and can never hash-match an oracle. Here the
    * per-char counts are collected and SORTED BY CHARACTER, and the
    * fold runs over that sorted list left-to-right — the oracle runs
    * the identical ordered fold, so both engines execute the same IEEE
    * additions in the same order. The log is [[graft.plans.LnLibm]]
    * (Math.log), NOT Spark's `ln`: Spark math expressions ride
    * StrictMath (fdlibm), 1 ulp off the libm other engines link on some
    * inputs; Math.log matches libm (checked over the corpus by the gate
    * itself). Cost shape: the
    * per-doc char histogram is bounded by the alphabet, so the
    * collect_list is small regardless of document length — this is a
    * histogram fold, not a collect of the document. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col(idCol))
      .agg(
        expr("transform(sort_array(collect_list(struct(ch, n))), x -> x.n)")
          .as("ns"),
        sum(col("n")).as("n_chars"),
        count(lit(1)).as("distinct_chars"))
      .select(col(idCol), col("n_chars"), col("distinct_chars"), {
        def p(c: Column) = c.cast("double") / col("n_chars").cast("double")
        (-aggregate(col("ns"), lit(0.0),
          (acc, c) => acc + p(c) * graft.plans.GraftExpressions.lnLibm(p(c))))
          .as("entropy")
      })
    // id-spine restore (same contract as repetitionStats): an empty or
    // null-text doc gets a zero-stats row instead of silently vanishing
    // from the quality-signal family's output
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("distinct_chars"), lit(0L)).as("distinct_chars"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    * 2003 — the MOSS local fingerprinting algorithm): hash every
    * k-token gram, slide a w-gram window, keep each window's MINIMUM
    * hash, emit the distinct selected hashes per document. Guarantees:
    * any shared run of k+w−1 tokens between two documents shares at
    * least one fingerprint (detection), and selected density is
    * ~2/(w+1) of grams (bounded index size — the property that lets a
    * 100 TB corpus keep its plagiarism/contamination index a small
    * fraction of itself; pair candidates then come from a
    * PostingLists-style equi-join on fp, never a doc×doc compare).
    *
    * Hashes are the engine-portable md5-60 pipeline
    * ([[graft.plans.PortableHash]] contract), so the fingerprint SET —
    * not just its size — is DuckDB-oracle-checkable. The per-doc window
    * is document-bounded (same cost envelope as the win_* family);
    * docs with fewer than k+w−1 tokens emit nothing. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize + per-gram MD5 are the CPU-dense stage and run BEFORE
    // the per-doc window exchange: guard against unsplittable
    // single-row-group inputs serializing them (Spread scaladoc)
    val grams = Spread.spread(df)
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(1, greatest(size(t) - ${k - 1}, 0)),
            i -> concat_ws(' ', slice(t, i, $k)))"""))
        .as(Seq("i", "gram")))
      .withColumn("h",
        graft.plans.PortableHash.md5_60Col(col("gram")).cast("long"))
    val byDoc = Window.partitionBy(col(idCol))
    val ordered = byDoc.orderBy(col("i"))
    grams
      .withColumn("fp", min(col("h")).over(ordered.rowsBetween(0, w - 1)))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("ng", count(lit(1)).over(byDoc))
      .filter(col("rn") <= col("ng") - (w - 1)) // full windows only
      .select(col(idCol), col("fp")).distinct()
  }

  /** Per-position bigram structs of a token array, empty for docs with
    * < 2 tokens (sequence(1, 0) would be the DESCENDING [1, 0] — same
    * guard as repetitionStats). */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** CCNet-style n-gram language-model quality score: train an add-k
    * smoothed bigram model on `ref`, score every `df` document by its
    * mean per-bigram probability `(c(w1,w2)+k) / (c(w1)+k·V)` plus its
    * out-of-vocabulary token rate. Low score / high OOV = text unlike
    * the reference corpus — the standard perplexity-bucket filter for
    * training-data curation, with counts instead of a neural LM.
    *
    * `logProb = false` (default) keeps the score as the mean
    * probability — rational arithmetic end-to-end, decimal-exact
    * summation, so the result is engine-portable and DuckDB-oracle-
    * checkable. `true` scores mean ln p (the conventional log form;
    * libm ln is excluded from oracles by policy, unit-tested instead).
    *
    * Scale shape: model training is two token-keyed groupBys over the
    * reference (vocabulary-bounded output); scoring joins the doc
    * bigram stream against the model tables (AQE broadcasts them when
    * the vocab is small) and regroups per doc. No driver-side model
    * materialization — the "model" stays a DataFrame pair, so a 100 TB
    * reference corpus trains with the same plan. */
  def ngramLmScore(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, k: Double = 1.0,
      logProb: Boolean = false): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val refToks = ref.select(explode(tokens(col(refTextCol))).as("w1"))
    val uni = refToks.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v_size"))
    val refBig = ref
      .select(explode(bigrams(tokens(col(refTextCol)))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val docBig = df
      .select(col(idCol), explode(bigrams(tokens(col(textCol)))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val p = (coalesce(col("c2"), lit(0L)) + lit(k)) /
      (coalesce(col("c1"), lit(0L)) + lit(k) * col("v_size"))
    val scored = docBig
      .join(refBig, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        // decimal-exact sum → mean: partial-agg order can't perturb the
        // double result (same contract as QueryPack.dsum)
        (sum((if (logProb) log(p) else p)
            .cast(org.apache.spark.sql.types.DecimalType(18, 12)))
          .cast("double") / count(lit(1)).cast("double")).as("lm_score"))
    val oov = df
      .select(col(idCol), explode(tokens(col(textCol))).as("w1"))
      .join(uni, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(oov, Seq(idCol), "left")
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("oov_rate"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
  }

  /** PII patterns scrubbed by [[redactPii]], applied in this order.
    * Deliberately dialect-portable regex (no lookarounds, no \b) so the
    * DuckDB oracle applies the IDENTICAL patterns. */
  private[graft] val PiiPatterns: Seq[(String, String)] = Seq(
    // emails before phones: an email's digits must not half-match
    raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}" -> "<EMAIL>",
    raw"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}" -> "<IP>",
    raw"\+?[0-9][0-9()\-\. ]{7,}[0-9]" -> "<PHONE>")

  /** PII redaction — the standard scrub pass of a training-data
    * pipeline: emails, IPv4s, and phone-shaped digit runs are replaced
    * with typed placeholders. Pure chained regexp_replace map stage
    * (codegen, zero shuffle, linear in corpus bytes). Pattern-based
    * redaction is a floor, not a guarantee — compose with domain
    * filters for anything regulated. */
  def redactPii(df: DataFrame, textCol: String,
      outCol: String = "redacted"): DataFrame = {
    val scrubbed = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
    df.withColumn(outCol, scrubbed)
  }

  /** Fused BERT-style encode: normalize → WordPiece → vocab ids →
    * truncate to maxLen−2 → wrap in [CLS]/[SEP] → pad with [PAD] to a
    * fixed maxLen, plus the matching attention mask — the whole
    * model-input prep (the reference composes normalize.hpp +
    * wordpiece_tokenize.hpp the same way) in ONE map stage. Ids are
    * vocab positions, so "[CLS]"/"[SEP]"/"[PAD]"/"[UNK]" must appear in
    * `vocab` exactly like a BERT vocab file. Pure per-row expressions:
    * no shuffle, no UDF boundary beyond the tokenizer expression. */
  def bertEncode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxLen: Int): DataFrame = {
    val specials = Seq("[CLS]", "[SEP]", "[PAD]", "[UNK]")
    val missing = specials.filterNot(vocab.contains)
    require(missing.isEmpty, s"vocab lacks special tokens: $missing")
    require(maxLen >= 2, "maxLen must fit [CLS] and [SEP]")
    val Seq(cls, sep, pad, unk) = specials.map(vocab.indexOf)
    val pieces = graft.plans.WordPieceTokenize(
      graft.plans.CharacterNormalize(col(textCol)), vocab)
    val body = slice(
      graft.operators.VocabTokenize.idsFor(pieces, vocab, defaultId = unk),
      1, maxLen - 2)
    val ids = concat(array(lit(cls)), body, array(lit(sep)))
    val n = size(ids)
    df.select(col(idCol),
        ids.as("__ids"), n.as("__n"))
      .select(col(idCol),
        concat(col("__ids"),
          array_repeat(lit(pad), lit(maxLen) - col("__n"))).as("input_ids"),
        concat(array_repeat(lit(1), col("__n")),
          array_repeat(lit(0), lit(maxLen) - col("__n")))
          .as("attention_mask"))
  }

  /** Sequence packing: assign fixed-order documents to token-budget
    * bins — the batching step that turns a deduped corpus into training
    * sequences. Bin id = floor(tokens-before-this-doc / budget) within
    * a hash-derived pack group, i.e. documents may straddle a budget
    * boundary and the straddle is accounted to the earlier bin (the
    * standard streaming-packing formulation; exact first-fit is
    * inherently sequential and would serialize the corpus).
    *
    * Scale: one window per pack group — groups are hash buckets
    * (`doc_id % groups`), so the sort parallelizes across groups and no
    * global single-partition window exists. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, groups: Int = 32): DataFrame =
    packByTokens(
      df.select(col(idCol), size(tokens(col(textCol))).as("n_tokens")),
      idCol, "n_tokens", budgetTokens, groups)
      .select(col(idCol), col("pack_group"), col("bin"), col("n_tokens"),
        col("tokens_before"))

  /** [[packSequences]] over a PRECOMPUTED token-count column — the
    * composable core (extra input columns carry through), adding
    * pack_group / tokens_before / bin. */
  def packByTokens(df: DataFrame, idCol: String, nTokensCol: String,
      budgetTokens: Int, groups: Int = 32): DataFrame = {
    require(budgetTokens > 0 && groups > 0, "need positive budget/groups")
    // pmod on a non-numeric id would cast to null and collapse the whole
    // corpus into ONE null pack group (a single global window partition)
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packByTokens id $idCol must be numeric, got " +
        df.schema(idCol).dataType)
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
    df.withColumn("pack_group", pmod(col(idCol), lit(groups)))
      .withColumn("tokens_before",
        coalesce(sum(col(nTokensCol))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin",
        floor(col("tokens_before").cast("double") / budgetTokens).cast("long"))
  }
}
