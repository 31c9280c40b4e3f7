package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the join form of the reference's
  * pairwise edit distance (cpp/include/nvtext/edit_distance.hpp:57),
  * which only scores aligned row pairs; joining two tables on
  * "distance ≤ k" needs candidate generation, not a cross join.
  *
  * Method: SymSpell-style deletion neighborhoods (Garbe 2012, public
  * algorithm). Two strings within Levenshtein distance k share at least
  * one common string in their ≤k-character-deletion neighborhoods
  * (delete the unmatched alignment positions from each side), so an
  * equi-join on exploded deletion variants is a lossless candidate
  * filter; an exact `levenshtein` verify then removes false positives —
  * recall 1, precision 1.
  *
  * Scale design (100 TB): variant generation is a pure map stage
  * (≤ len+1 variants per string at k=1); the candidate join shuffles on
  * the variant VALUE — content-distributed, posting-list shaped, never
  * pair-shaped — and the verify is a codegen'd per-row filter. A cross
  * join appears nowhere. Candidate duplicates (pairs sharing several
  * variants) are deduped per pair BEFORE the verify so levenshtein runs
  * once per candidate pair.
  */
object FuzzyJoin {

  /** All strings obtainable by deleting exactly one character: for i in
    * 1..len, prefix(i−1) ++ suffix(i+1). Empty input yields [""]. */
  private def deletes1(s: Column): Column =
    transform(sequence(lit(1), greatest(length(s), lit(1))),
      i => concat(s.substr(lit(1), i - 1),
        s.substr(i + 1, greatest(length(s) - i, lit(0)))))

  /** Deletion neighborhood of radius k (k ∈ {1, 2}): the string plus
    * all distinct strings at ≤k deletions. */
  private[operators] def neighborhood(s: Column, k: Int): Column = {
    require(k == 1 || k == 2, "deletion-neighborhood join supports k in {1, 2}")
    val n1 = array_distinct(concat(array(s), deletes1(s)))
    if (k == 1) n1
    else array_distinct(flatten(transform(n1, v =>
      concat(array(v), deletes1(v)))))
  }

  /** Join `left` and `right` on Levenshtein(leftKey, rightKey) ≤ k.
    * Returns (leftId, rightId, leftKey, rightKey, dist) — one row per
    * matching pair. Ids must be unique per side.
    *
    * Candidates join on `xxhash64(variant)` rather than the variant
    * string: equal variants always collide (recall unchanged), unequal
    * variants that collide produce spurious candidates the exact verify
    * removes — so correctness is hash-independent, and the candidate
    * shuffle carries 8 bytes per variant instead of the key text
    * (long keys at corpus scale would otherwise dominate the wire). */
  def editDistanceJoin(left: DataFrame, leftId: String, leftKey: String,
      right: DataFrame, rightId: String, rightKey: String,
      k: Int): DataFrame = {
    // Variant generation is the CPU-dense stage; an unsplittable input
    // (single parquet row group) would otherwise serialize it onto one
    // core (Spread scaladoc — no-op on well-split inputs).
    val lv = Spread.spread(left)
      .select(col(leftId).as("__lid"), col(leftKey).as("__lkey"),
        explode(neighborhood(col(leftKey), k)).as("__vs"))
      .select(col("__lid"), col("__lkey"), xxhash64(col("__vs")).as("__v"))
    val rv = Spread.spread(right)
      .select(col(rightId).as("__rid"), col(rightKey).as("__rkey"),
        explode(neighborhood(col(rightKey), k)).as("__vs"))
      .select(col("__rid"), col("__rkey"), xxhash64(col("__vs")).as("__v"))
    // Same-schema inputs (the natural dedup/linkage call) would yield
    // DUPLICATE output column names and make every by-name reference
    // ambiguous downstream — disambiguate on collision only, so
    // distinct-named callers keep their documented contract.
    val (outLid, outRid) =
      if (leftId == rightId) (s"${leftId}_l", s"${rightId}_r")
      else (leftId, rightId)
    val (outLkey, outRkey) =
      if (leftKey == rightKey) (s"${leftKey}_l", s"${rightKey}_r")
      else (leftKey, rightKey)
    lv.join(rv, Seq("__v"))
      .select(col("__lid"), col("__lkey"), col("__rid"), col("__rkey"))
      .distinct()                       // one verify per candidate pair
      .withColumn("dist", levenshtein(col("__lkey"), col("__rkey")))
      .filter(col("dist") <= k)
      .select(col("__lid").as(outLid), col("__rid").as(outRid),
        col("__lkey").as(outLkey), col("__rkey").as(outRkey), col("dist"))
  }

  /** Dictionary correction (spell-check shape): for every `df` row, the
    * single closest `dict` entry within distance ≤ k (ties broken by
    * (dist, dictKey) for determinism); rows with no match are kept with
    * null correction. Same candidate plan as [[editDistanceJoin]] plus
    * one min_by per input row. */
  def closestMatch(df: DataFrame, idCol: String, keyCol: String,
      dict: DataFrame, dictKeyCol: String, k: Int): DataFrame = {
    val matches = editDistanceJoin(
        df, idCol, keyCol,
        dict.select(col(dictKeyCol).as("__dk")).distinct()
          .withColumn("__did", col("__dk")), "__did", "__dk", k)
      .groupBy(col(idCol))
      .agg(min_by(struct(col("__dk").as("suggestion"), col("dist")),
        struct(col("dist"), col("__dk"))).as("m"))
      .select(col(idCol), col("m.suggestion").as("suggestion"),
        col("m.dist").as("dist"))
    df.select(col(idCol), col(keyCol))
      .join(matches, Seq(idCol), "left")
  }

  /** Streaming twin of [[editDistanceJoin]]: admit only micro-batch
    * rows whose `keyCol` has NO corpus entry within Levenshtein ≤ k —
    * the near-name / typo-variant ingest gate (a spam corpus screen:
    * "paypa1.com" is rejected because "paypal.com" is indexed).
    *
    * The corpus-side deletion-neighborhood index — the explode + hash
    * kernel over every corpus key — is built and PERSISTED once here,
    * outside the returned closure: foreachBatch replans the static side
    * each micro-batch, so an unindexed corpus would re-run variant
    * generation every few seconds. Each batch explodes only its own
    * neighborhoods, equi-joins the 8-byte variant hashes, verifies with
    * exact levenshtein (recall 1 / precision 1 inside the radius, same
    * contract as the batch join), and anti-joins the matched keys out.
    * Call [[IngestScreen.close]] when rebuilding over a refreshed
    * corpus. */
  def fuzzyScreenBatch(corpus: DataFrame, keyCol: String, k: Int)
      : IngestScreen = {
    val cVars = corpus.select(col(keyCol).as("__ckey")).distinct()
      .select(col("__ckey"),
        explode(neighborhood(col("__ckey"), k)).as("__vs"))
      .select(col("__ckey"), xxhash64(col("__vs")).as("__v"))
      .persist()
    new IngestScreen(batch => {
      val bVars = batch.select(col(keyCol)).distinct()
        .select(col(keyCol), explode(neighborhood(col(keyCol), k)).as("__vs"))
        .select(col(keyCol), xxhash64(col("__vs")).as("__v"))
      val matched = bVars.join(cVars, Seq("__v"))
        .select(col(keyCol), col("__ckey")).distinct()
        .filter(levenshtein(col(keyCol), col("__ckey")) <= k)
        .select(col(keyCol)).distinct()
      batch.join(matched, Seq(keyCol), "left_anti")
    }, () => { cVars.unpersist(); () })
  }

  /** Block-then-verify Jaro-Winkler similarity self-join: all distinct
    * `keyCol` value pairs sharing a blocking key, verified with the
    * codegen [[graft.plans.JaroWinkler]] expression at `threshold`.
    * Returns (a, b, jw) with a < b.
    *
    * This is the classic record-linkage shape (Fellegi-Sunter blocking
    * + Winkler comparator). RECALL CONTRACT: pairs whose blocking keys
    * differ are NEVER compared — the key must encode the error model
    * (Winkler's observation that first-position errors are rare is why
    * first-letter / first-token / phonetic keys are the standard
    * choices; compose with [[graft.plans.Metaphone]] or soundex for a
    * phonetic block). Unlike [[editDistanceJoin]] (deletion
    * neighborhoods make recall exact for Levenshtein ≤ k), JW has no
    * finite candidate-generating neighborhood, so blocked recall < 1 is
    * inherent; callers wanting tighter recall union the pair sets of
    * several independent blocking passes.
    *
    * Scale shape: pair generation goes through
    * [[PostingLists.candidatePairs]] — ONE shuffle (groupBy block key),
    * the key-derivation subtree evaluated once, per-task memory bounded
    * by the largest block (ids only). A skewed block of n names still
    * implies n²/2 verifies — same cost model as every blocking scheme —
    * so block-key cardinality must grow with the data (first token →
    * token + length bucket, etc.). */
  def jaroWinklerBlockedJoin(df: DataFrame, keyCol: String,
      blockKey: Column => Column, threshold: Double): DataFrame = {
    val keyed = df.select(col(keyCol).as("a")).distinct()
      .select(col("a"), blockKey(col("a")).as("__blk"))
    PostingLists.candidatePairs(keyed, "a", "__blk")
      .select(col("a"), col("b"),
        graft.plans.GraftExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
      .filter(col("jw") >= lit(threshold))
  }

  /** Record-linkage RESOLUTION on top of the blocked comparator: for
    * every distinct `keyCol` value, the single best `dict` entry —
    * highest Jaro-Winkler within the shared block at `threshold`, ties
    * broken by dictionary key ascending for determinism. Returns
    * (keyCol, match, jw); inputs with no in-block candidate above
    * threshold produce no row (linkage leaves them unmatched — callers
    * left-join the result back when they need the full spine).
    *
    * This is the full Fellegi-Sunter shape: block (equi-join on the
    * blocking key — the only shuffle, content-distributed), compare
    * (codegen JW per candidate), resolve (min_by per left key — a
    * partial-aggregatable argmax, never a per-key sort window). Same
    * recall contract as [[jaroWinklerBlockedJoin]]: cross-block
    * matches are unreachable by construction. */
  def jaroWinklerBestMatch(df: DataFrame, keyCol: String,
      dict: DataFrame, dictKeyCol: String,
      blockKey: Column => Column, threshold: Double,
      excludeExact: Boolean = false): DataFrame = {
    val l = df.select(col(keyCol)).distinct()
      .withColumn("__blk", blockKey(col(keyCol)))
    val r = dict.select(col(dictKeyCol).as("__dk")).distinct()
      .withColumn("__blk", blockKey(col("__dk")))
    l.join(r, Seq("__blk"))
      // excludeExact is for SELF-linkage (df == dict), where every key
      // would otherwise trivially match itself at jw = 1.0. In the
      // bipartite df-vs-dict resolution the DEFAULT keeps exact hits —
      // a key literally present in the dictionary must resolve to it,
      // not to the second-best candidate.
      .filter(if (excludeExact) col(keyCol) =!= col("__dk") else lit(true))
      .withColumn("jw",
        graft.plans.GraftExpressions.jaroWinkler(col(keyCol), col("__dk")))
      .filter(col("jw") >= lit(threshold))
      .groupBy(col(keyCol))
      .agg(min_by(struct(col("__dk").as("match"), col("jw")),
        struct(negate(col("jw")), col("__dk"))).as("m"))
      .select(col(keyCol), col("m.match").as("match"), col("m.jw").as("jw"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    * complement of key blocking for record linkage: sort the records
    * by a key, slide a window of `w`, compare only neighbors. Catches
    * the near-miss pairs hash blocking splits across blocks (e.g.
    * prefix typos sort adjacent under a reversed or phonetic sort key)
    * at linear candidate cost (w−1 per record vs per-block n²/2).
    *
    * Distributed form: Spark's range-partitioned global sort would
    * still need a windowed self-comparison ACROSS partition
    * boundaries; a no-partition window is the classic single-task
    * scale trap. Instead the sort space is sharded by a key PREFIX
    * (the blocks sort contiguously inside each shard), and the window
    * runs per shard — the standard practice trade: pairs whose sort
    * keys differ in the first `prefixLen` chars are unreachable, the
    * same documented-recall contract as every blocking scheme here.
    * Neighbors come from w−1 lead() columns (fixed small w), so pair
    * generation is one sort + one window pass, no self-join. */
  def sortedNeighborhoodPairs(df: DataFrame, keyCol: String,
      w: Int, prefixLen: Int, threshold: Double): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val keyed = df.select(col(keyCol).as("a")).distinct()
      .withColumn("__shard", substring(col("a"), 1, prefixLen))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("a"))
    val withLeads = (1 until w).foldLeft(keyed) { (d, k) =>
      d.withColumn(s"__n$k", lead(col("a"), k).over(win))
    }
    val neighbors = array((1 until w).map(k => col(s"__n$k")): _*)
    withLeads
      .select(col("a"), explode(neighbors).as("b"))
      .filter(col("b").isNotNull)
      .select(col("a"), col("b"),
        graft.plans.GraftExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
      .filter(col("jw") >= lit(threshold))
  }
}
