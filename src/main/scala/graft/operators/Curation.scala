package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines (north star:
  * the sampling / splitting / survivor-selection stages that sit between
  * dedup and sequence packing at 100 TB).
  *
  * Every decision here is a pure function of (seed, key) — no RNG state,
  * no driver action — so results are reproducible across runs, engines,
  * and cluster sizes, and every stage is a codegen'd map or a single
  * keyed shuffle. Extends the reference's surface (rapidsai/cudf ships
  * `sample`, cpp/include/cudf/copying.hpp, but no seeded split/mixture
  * machinery); semantics follow standard corpus-curation practice.
  */
object Curation {

  /** Exact interpolated percentile built from Column objects rather
    * than a spliced SQL string, so column names needing backticks
    * (spaces, dots, hyphens) resolve like everywhere else in the API. */
  private def pctl(valueCol: String, p: Double): Column =
    call_function("percentile", col(valueCol), lit(p))

  /** Deterministic unit-interval weight in [0,1) from (seed, key): the
    * first 15 hex chars of md5("seed|key") read as a 60-bit integer,
    * divided by 2^60. A pure per-row map (codegen, zero shuffle) that is
    * engine-portable — DuckDB computes the identical double as
    * `('0x' || substring(md5(seed || '|' || key), 1, 15))::BIGINT
    * / 9.223372036854776e18`-style arithmetic — unlike xxhash64/rand,
    * so sampling decisions can be oracle-checked and survive re-runs. */
  def hashUnit(key: Column, seed: String): Column =
    graft.plans.PortableHash
      .md5_60Col(concat_ws("|", lit(seed), key.cast("string")))
      .cast("double") / lit(1152921504606846976.0) // 2^60

  /** Deterministic train/val/test split: label each row by where its
    * [[hashUnit]] falls among cumulative upper bounds, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)`. Rows hash to
    * the same split on every run and on any cluster layout — the
    * property that keeps eval sets uncontaminated when the corpus is
    * rebuilt. Zero shuffle. */
  /** Shared cut-validation + label-builder for the two split variants —
    * ONE definition so row-level and group-level splitting can never
    * silently diverge on boundary semantics. */
  private def splitLabel(u: Column, cuts: Seq[(String, Double)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 >= 1.0,
      "cuts must be cumulative upper bounds ending at >= 1.0")
    cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, upper), rest) => when(u < upper, name).otherwise(rest)
    }
  }

  def assignSplit(df: DataFrame, idCol: String, seed: String,
      cuts: Seq[(String, Double)], outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitLabel(hashUnit(col(idCol), seed), cuts))

  /** [[assignSplit]] with GROUP atomicity: every row sharing a
    * `groupCol` value lands in the same split, decided by the group
    * REPRESENTATIVE (min `idCol` in the group), not the row id. This is
    * the leakage-free split: with row-level hashing, a duplicated or
    * near-duplicated document can sit in train while its twin sits in
    * eval — the classic benchmark-contamination leak. Pass a content
    * digest, a near-dup cluster id ([[Dedup.nearDupClusters]] roots),
    * or a source/domain key as the group. Cost: one group-keyed
    * aggregation for the representative + one join back (broadcast-able
    * when groups ≪ rows); the split decision itself stays the zero-
    * shuffle portable [[hashUnit]]. */
  def assignSplitByGroup(df: DataFrame, groupCol: String, idCol: String,
      seed: String, cuts: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    val reps = df.groupBy(col(groupCol))
      .agg(min(col(idCol)).as("__rep"))
    // NULL-SAFE join: a plain equality join would silently DELETE every
    // row whose group key is null (null never equals null) — e.g. a
    // null-text document in the digest-grouped leakage-free split. The
    // contract is "label each row"; the null group's representative is
    // its min id like any other group's.
    df.join(reps, df(groupCol) <=> reps(groupCol))
      .drop(reps(groupCol))
      .withColumn(outCol, splitLabel(hashUnit(col("__rep"), seed), cuts))
      .drop("__rep")
  }

  /** Content-level leakage-free split: group = md5(textCol) — exact
    * duplicates always share a split. */
  def assignSplitLeakFree(df: DataFrame, idCol: String, textCol: String,
      seed: String, cuts: Seq[(String, Double)],
      outCol: String = "split"): DataFrame =
    assignSplitByGroup(df.withColumn("__dig", md5(col(textCol))),
      "__dig", idCol, seed, cuts, outCol).drop("__dig")

  /** At most `k` rows per group, chosen deterministically (by
    * [[hashUnit]] of the id, id as tie-break) — the domain-balancing /
    * per-source-quota stage. One shuffle keyed on the group column;
    * group sizes bound partition memory, skewed groups stream through
    * the window's running row_number without buffering. */
  def sampleByGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashUnit(col(idCol), seed), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Cumulative Poisson(lambda) CDF values F(0), F(1), … up to the
    * first K with tail mass below 1e-12 — the shared threshold grid
    * [[bootstrapSample]] and its DuckDB oracle both compare the
    * portable hash against (literal-for-literal, so the two engines
    * can never disagree on a multiplicity). */
  def poissonCdfs(lambda: Double): Seq[Double] = {
    require(lambda > 0 && lambda <= 8, "need 0 < lambda <= 8")
    val out = Seq.newBuilder[Double]
    var pmf = math.exp(-lambda); var cdf = pmf; var k = 0
    out += cdf
    while (1.0 - cdf > 1e-12 && k < 64) {
      k += 1; pmf *= lambda / k; cdf += pmf; out += cdf
    }
    out.result()
  }

  /** Bootstrap (with-replacement) resampling: per (row, draw) the
    * multiplicity m is drawn from Poisson(lambda) by inverting the CDF
    * on the portable [[hashUnit]] — the Poisson bootstrap, the
    * distributed-scale stand-in for multinomial n-out-of-n resampling
    * (the reference's sample(replace=True); every other sampler here
    * is without-replacement). A row can therefore appear SEVERAL times
    * within one resample (copy_idx distinguishes the copies), which is
    * what gives per-draw statistics genuine bootstrap variance — a
    * Bernoulli keep/drop per draw would cap multiplicity at 1 and
    * yield the narrower m-out-of-n subsampling distribution instead.
    * Each (row, draw) hashes (seed | draw#id), so the resample set is
    * deterministic, engine-replayable, and invariant to partitioning
    * and cluster layout; the per-row explode is a map stage — zero
    * shuffle — and draw_idx keeps the `draws` resamples
    * distinguishable downstream (per-draw aggregation = the bootstrap
    * distribution). E[copies per draw] = lambda; lambda = 1 is the
    * classic full-size bootstrap, lambda < 1 a Poissonized
    * m-out-of-n. */
  def bootstrapSample(df: DataFrame, idCol: String, draws: Int,
      lambda: Double, seed: String): DataFrame = {
    require(draws > 0, "need draws > 0")
    val cdfs = poissonCdfs(lambda)
    val withDraw = df.withColumn("draw_idx",
      explode(sequence(lit(0), lit(draws - 1))))
    val u = hashUnit(concat_ws("#", col("draw_idx"), col(idCol)), seed)
    val mult = cdfs.map(t => when(u >= lit(t), 1).otherwise(0))
      .reduce(_ + _)
    withDraw.withColumn("__mult", mult)
      .filter(col("__mult") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("__mult"))))
      .drop("__mult")
  }

  /** Weighted mixture sampling: keep a row iff its [[hashUnit]] is below
    * the weight of its source, e.g. `Map("en" -> 0.9, "zh" -> 0.25)` —
    * the corpus-mixing stage that rebalances sources before training.
    * Unlisted sources default to `defaultWeight`. Zero shuffle; expected
    * kept fraction per source equals its weight. */
  def mixCorpora(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], seed: String,
      defaultWeight: Double = 0.0): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight): Column) {
      case (rest, (name, frac)) =>
        when(col(sourceCol) === name, lit(frac)).otherwise(rest)
    }
    df.filter(hashUnit(col(idCol), seed) < w)
  }

  /** Null-safe broadcast join of a per-group 1-row-per-group table
    * back onto the corpus: a plain equi-join on the group column
    * SILENTLY DROPS rows whose group is NULL (null ≠ null), and a
    * sampler/calibrator must never lose rows that way — the NULL group
    * is a group like any other (groupBy already aggregates it). */
  private def joinGroupStats(df: DataFrame, stats: DataFrame,
      groupCol: String): DataFrame = {
    val g = "__grp_" + groupCol
    df.join(broadcast(stats.withColumnRenamed(groupCol, g)),
        col(groupCol) <=> col(g))
      .drop(g)
  }

  /** Keep the top `frac` of rows per group by `scoreCol` — the
    * per-source quality gate ("top 30% by quality within each
    * language"), which a single global threshold can't express without
    * letting the highest-scoring source crowd out the rest. The cut is
    * each group's exact (1−frac) percentile — a group-keyed 1-row-per-
    * group aggregate joined back (broadcastable: group-cardinality
    * rows) into a codegen filter. No window over the corpus, no global
    * sort; ties at the cut are kept (>= comparison, deterministic). */
  def filterTopFracByGroup(df: DataFrame, groupCol: String,
      scoreCol: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "need 0 < frac <= 1")
    val cuts = df.groupBy(col(groupCol))
      .agg(pctl(scoreCol, 1.0 - frac).as("_cut"))
    joinGroupStats(df, cuts, groupCol)
      .filter(col(scoreCol).cast("double") >= col("_cut"))
      .drop("_cut")
  }

  /** Per-group z-score standardization of a numeric column — score
    * calibration across sources whose raw scales differ (a perplexity
    * of 80 means different things for code and prose). Mean and
    * population std are decimal-exact (order-independent sums, engine-
    * portable); the z map is one codegen stage over a broadcast join.
    * Groups with zero variance (or a single row) get z = 0.0 rather
    * than NULL/Inf — a constant column is "perfectly average", and a
    * downstream threshold must not drop it by accident. NULL inputs
    * stay NULL in every group (consistent with [[modifiedZByGroup]] /
    * [[quantileNormalizeByGroup]]): a missing score has no z, even in
    * a degenerate group. */
  def standardizeByGroup(df: DataFrame, groupCol: String,
      valueCol: String, zCol: String = "z"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol)).agg(
      (sum(v.cast(dec)).cast("double") / count(v)).as("_mean"),
      (sum((v * v).cast(dec)).cast("double") / count(v)).as("_m2"),
      count(v).as("_n"))
    val varPop = col("_m2") - col("_mean") * col("_mean")
    joinGroupStats(df, stats, groupCol)
      .withColumn(zCol,
        when(v.isNull, lit(null).cast("double"))
          .when(col("_n") <= 1 || varPop <= 0.0, lit(0.0))
          .otherwise((v - col("_mean")) / sqrt(varPop)))
      .drop("_mean", "_m2", "_n")
  }

  /** Deterministic source-interleaved training order: rows sort by
    * (per-source sequence, source), so the output cycles
    * src1, src2, …, srcK, src1, … — no long single-source runs, which
    * de-correlates gradient batches after a mixture stage (the
    * round-robin analog of [[shuffleKey]]'s uniform shuffle; order
    * within each source is itself the seeded hash shuffle). Cost: one
    * per-source window + the global range sort every write-ordering op
    * ends with (writing training shards in a defined order IS a total
    * sort; range partitioning keeps it distributed). Sources of unequal
    * size simply drop out of the cycle when exhausted. */
  def interleaveBySource(df: DataFrame, sourceCol: String, idCol: String,
      seed: String, seqCol: Option[String] = None): DataFrame = {
    val sc = seqCol.getOrElse("_seq")
    val out = df.withColumn(sc, row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(hashUnit(col(idCol), seed), col(idCol))))
      .orderBy(col(sc), col(sourceCol))
    if (seqCol.isDefined) out else out.drop(sc)
  }

  /** Remove train documents that share ≥ `minShared` winnowing
    * fingerprints with ANY eval document — cross-dataset n-gram
    * decontamination (the benchmark-leak scrub run before training;
    * complements [[assignSplitLeakFree]], which prevents leaks only
    * within one corpus). Winnowing gives the guarantee: any shared
    * token run of ≥ k+w−1 tokens yields a shared fingerprint
    * ([[graft.operators.TextPipeline.winnowFingerprints]], MOSS). At
    * scale: fingerprint sets shuffle 8-byte keys; the eval side
    * reduces to a distinct-fp table (benchmark-sized — broadcastable);
    * one join + one per-doc count + one anti-join. */
  def decontaminate(train: DataFrame, evalDf: DataFrame, idCol: String,
      textCol: String, minShared: Int = 3, k: Int = 3,
      w: Int = 4): DataFrame = {
    require(minShared >= 1, "need minShared >= 1")
    val tf = graft.operators.TextPipeline
      .winnowFingerprints(train, idCol, textCol, k, w)
    val ef = graft.operators.TextPipeline
      .winnowFingerprints(evalDf, idCol, textCol, k, w)
      .select(col("fp")).distinct()
    val contaminated = tf.join(broadcast(ef), "fp")
      .groupBy(col(idCol)).agg(count(lit(1)).as("_shared"))
      .filter(col("_shared") >= minShared)
      .select(col(idCol))
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-group modified z-score (Iglewicz–Hoaglin): 0.6745·(v − med) /
    * MAD, the robust outlier rule that survives the outliers it hunts
    * (mean/std get dragged by them; median/MAD don't). Per-group
    * median + MAD are two exact-percentile group aggregates, each
    * null-safe-broadcast back; zero-MAD groups (>50% identical values)
    * get z = 0 rather than ±Inf. Flag |mz| > 3.5 downstream. */
  def modifiedZByGroup(df: DataFrame, groupCol: String, valueCol: String,
      zCol: String = "mz"): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol)).agg(pctl(valueCol, 0.5).as("_med"))
    val dev = joinGroupStats(df, med, groupCol)
      .withColumn("_dev", abs(v - col("_med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(call_function("percentile", col("_dev"), lit(0.5)).as("_mad"))
    joinGroupStats(dev, mad, groupCol)
      .withColumn(zCol,
        when(v.isNull, lit(null).cast("double"))
          .when(col("_mad") <= 0.0, lit(0.0))
          .otherwise(lit(0.6745) * (v - col("_med")) / col("_mad")))
      .drop("_med", "_dev", "_mad")
  }

  /** Per-group quantile (rank) normalization to [0, 1] — percent_rank
    * within each group; the rank analog of [[standardizeByGroup]] for
    * non-Gaussian score distributions (perplexities, lengths). Ties
    * share a value, single-row groups get 0.0 — both engine-portable.
    * One group-keyed sort window; group sizes bound partition memory. */
  def quantileNormalizeByGroup(df: DataFrame, groupCol: String,
      valueCol: String, outCol: String = "qnorm"): DataFrame = {
    // NULL scores get NULL qnorm and are EXCLUDED from the ranking
    // denominator (same contract as curriculumBuckets). Ranking them
    // instead would be engine-divergent anyway: Spark default-orders
    // nulls FIRST, DuckDB LAST, so a null would claim rank 0 on one
    // engine and 1 on the other.
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn(outCol, percent_rank().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(valueCol).cast("double"))))
    val nulls = df.filter(col(valueCol).isNull)
      .withColumn(outCol, lit(null).cast("double"))
    ranked.unionByName(nulls)
  }

  /** Snapshot diff between two corpus versions keyed by `idCol` — the
    * dataset-versioning primitive (what changed between crawl N and
    * crawl N+1 before re-running downstream curation): `added` (id only
    * in the new version), `removed` (only in the old), `changed`
    * (content digest differs), optionally `unchanged`. One id-keyed
    * full outer join of md5 digests — content never shuffles, only
    * (id, 32-byte digest); at 100 TB the cost is two scans plus one
    * join on the id key. Compose with [[graft.operators.Dedup]]'s
    * delta passes to re-curate only the `added`/`changed` slice. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, includeUnchanged: Boolean = false): DataFrame = {
    // NULL text must digest to a sentinel, not NULL: md5(null) = null
    // would make a null-text doc present in BOTH versions look "added"
    // (its old digest is null ⇒ first branch fires). The sentinel can't
    // collide with a real digest (md5 hex is 32 chars).
    def dig(c: Column) = coalesce(md5(c), lit("<null-text>"))
    val o = oldDf.select(col(idCol).as("_id"), dig(col(textCol)).as("_od"))
    val n = newDf.select(col(idCol).as("_id"), dig(col(textCol)).as("_nd"))
    val st = when(col("_od").isNull, lit("added"))
      .when(col("_nd").isNull, lit("removed"))
      .when(col("_od") =!= col("_nd"), lit("changed"))
      .otherwise(lit("unchanged"))
    val joined = o.join(n, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol), st.as("status"))
    if (includeUnchanged) joined
    else joined.filter(col("status") =!= "unchanged")
  }

  /** Temperature-balanced mixture (the multilingual p ∝ n^α resampling
    * rule of XLM/mT5, Conneau & Lample 2019 §3.1): group g with n_g rows
    * gets target share p_g = n_g^α / Σ_h n_h^α of a `budget`-row output,
    * realized as a deterministic keep-rate r_g = min(1, budget·p_g/n_g)
    * over [[hashUnit]]. α = 1 preserves natural proportions, α → 0
    * approaches uniform-over-groups — small sources are upsampled
    * relative to their natural share, capped at keeping all their rows
    * (this is sampling WITHOUT replacement; rates never exceed 1).
    *
    * Plan shape: one group-keyed count (tiny — group-cardinality rows),
    * its 1-row Σ n^α aggregate broadcast back over it, and the rate
    * table broadcast-joined into a codegen filter — at 100 TB the corpus
    * is touched by exactly one count pass and one filter pass, nothing
    * pair-shaped, nothing driver-side.
    *
    * α = 0.5 computes n^α as sqrt(n) — IEEE-exact and engine-portable
    * (oracle-checkable); other α use pow (libm, rows-only by policy). */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, budget: Long, seed: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "need 0 < alpha <= 1")
    require(budget > 0, "need budget > 0")
    def pw(c: Column): Column =
      if (alpha == 0.5) sqrt(c.cast("double"))
      else if (alpha == 1.0) c.cast("double")
      else pow(c.cast("double"), lit(alpha))
    val cnts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n_g"))
    // Σ n^α in exact decimal (order-independent): a double sum's value
    // depends on partial-aggregate order, and every keep-rate — hence
    // every sampling decision — derives from this one scalar.
    val tot = cnts.agg(
      sum(pw(col("_n_g")).cast(org.apache.spark.sql.types.DecimalType(28, 8)))
        .cast("double").as("_w_sum"))
    val rates = cnts.crossJoin(broadcast(tot))
      .select(col(groupCol),
        least(lit(1.0), lit(budget.toDouble) * (pw(col("_n_g")) /
          col("_w_sum")) / col("_n_g")).as("_rate"))
    joinGroupStats(df, rates, groupCol)
      .filter(hashUnit(col(idCol), seed) < col("_rate"))
      .drop("_rate")
  }

  /** Curriculum buckets: assign each row to one of `nBuckets` score
    * bands split at the exact corpus percentiles — the
    * easy-to-hard ordering stage of curriculum training. Unlike
    * `ntile() OVER (ORDER BY score)` — whose unpartitioned window
    * funnels the whole corpus through ONE reducer — the cutoffs are a
    * 1-row exact-percentile aggregate broadcast into a codegen band
    * lookup: one scan to rank, one map to label, no global sort.
    * Ties share a bucket (deterministic; band populations may then be
    * uneven — the price of a sort-free plan, documented). Buckets are
    * 1-based; NULL scores get NULL. */
  def curriculumBuckets(df: DataFrame, scoreCol: String, nBuckets: Int,
      bucketCol: String = "bucket"): DataFrame = {
    require(nBuckets >= 2, "need nBuckets >= 2")
    val cutNames = (1 until nBuckets).map(i => s"__cut_$i")
    val cuts = df.agg(
      pctl(scoreCol, 1.0 / nBuckets).as(cutNames.head),
      (2 until nBuckets).map(i =>
        pctl(scoreCol, i.toDouble / nBuckets).as(s"__cut_$i")): _*)
    val v = col(scoreCol).cast("double")
    val band = cutNames.zipWithIndex.foldRight(lit(nBuckets): Column) {
      case ((cut, i), rest) => when(v <= col(cut), lit(i + 1)).otherwise(rest)
    }
    df.crossJoin(broadcast(cuts))
      .withColumn(bucketCol, when(v.isNull, lit(null)).otherwise(band))
      .drop(cutNames: _*)
  }

  /** Weighted sampling WITHOUT replacement via priority sampling
    * (sequential Poisson — Ohlsson 1998; Duffield–Lund–Thorup 2005):
    * each row gets priority q = u / w with u = [[hashUnit]](seed, id)
    * and w its weight; the sample is the k smallest priorities.
    * Inclusion probability grows with weight (∝ w for k ≪ n), the
    * scheme is MERGEABLE (the k smallest of a union are among the
    * per-partition k smallest — why TakeOrderedAndProject's partial
    * top-k is exact), and because u is the portable hash and q one
    * IEEE-exact division, the selected set is deterministic across
    * runs, partitionings, and engines — oracle-checkable, unlike
    * rand()-based A-ES implementations.
    *
    * Plan shape: codegen priority map + TakeOrderedAndProject (per-
    * partition top-k, driver merges k·partitions rows) — no global
    * sort, no shuffle; the 100 TB cost is one scan. Rows with NULL or
    * non-positive weight are EXCLUDED (w = 0 can never be drawn; a
    * negative weight would sort FIRST and always win — meaningless). */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val w = col(weightCol).cast("double")
    df.filter(w > 0.0)
      .withColumn("__q", hashUnit(col(idCol), seed) / w)
      .orderBy(col("__q"), col(idCol))
      .limit(k)
      .drop("__q")
  }

  /** [[sampleWeighted]] per group: the k smallest priorities WITHIN
    * each `groupCol` value — the weighted per-source quota stage
    * (sampleByGroup's uniform draw, but length/quality-weighted). One
    * group-keyed shuffle; the running row_number streams through
    * skewed groups without buffering them. */
  def sampleWeightedByGroup(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val wgt = col(weightCol).cast("double")
    val win = Window.partitionBy(col(groupCol))
      .orderBy(hashUnit(col(idCol), seed) / wgt, col(idCol))
    df.filter(wgt > 0.0)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Contrastive NEGATIVE sampling: k pseudo-random partner ids per
    * anchor, uniform over the corpus, never the anchor itself — the
    * in-batch-negatives / hard-negative-candidate stage of
    * contrastive-embedding data prep, made deterministic (a pure
    * function of (seed, id, j)) so pairs are reproducible across runs
    * and engines.
    *
    * Construction: ids get a dense index 0..n−1 by sorted order
    * (range-sort + zipWithIndex — the two-pass distributed dense rank;
    * no single-partition window), then negative j of anchor i is
    * index (i + 1 + (h(seed,id,j) mod (n−1))) mod n — the offset is
    * in 1..n−1, so a negative can never equal its anchor, and the
    * 60-bit hash makes the mod-(n−1) bias ≤ n/2^60. Cost: one sort of
    * the ID COLUMN only, one explode(k), one index-keyed join.
    * Returns (idCol, neg_rank, neg_<idCol>). Ids must be integral. */
  def sampleNegatives(df: DataFrame, idCol: String, k: Int,
      seed: String): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as(idCol)).distinct()
    val n = ids.count()
    require(n >= 2, "need at least 2 distinct ids")
    val indexed = ids.orderBy(col(idCol)).rdd
      .zipWithIndex.map { case (row, i) => (row.getLong(0), i) }
      .toDF(idCol, "__idx")
      .persist()
    val h = graft.plans.PortableHash.md5_60Col(concat_ws("|", lit(seed),
      col(idCol).cast("string"), col("__j").cast("string"))).cast("long")
    val negs = indexed
      .withColumn("__j", explode(array((0 until k).map(lit(_)): _*)))
      .withColumn("__nidx",
        pmod(col("__idx") + lit(1L) + pmod(h, lit(n - 1)), lit(n)))
      .join(indexed.select(col("__idx").as("__nidx"),
        col(idCol).as(s"neg_$idCol")), "__nidx")
      .select(col(idCol), col("__j").as("neg_rank"), col(s"neg_$idCol"))
    // materialize (n·k small rows) so `indexed` can be released NOW
    // rather than leaking cache for the life of the session; the
    // eager cut also spares callers the double zipWithIndex job the
    // persist existed to avoid
    val out = negs.localCheckpoint()
    indexed.unpersist()
    out
  }

  /** Quality-ranked dedup survivor selection: within each duplicate
    * group (`keyCol`), keep the row with the highest score (lowest id on
    * ties) — "keep the best copy", vs Dedup.exactSurvivors' "keep the
    * first". One shuffle keyed on the digest; same single-window shape
    * as the other survivor ops. */
  def survivorsByScore(df: DataFrame, keyCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Deterministic global shuffle: a stable pseudo-random sort key per
    * row. Writing `df.orderBy("shuffle_key", idCol)` range-partitions on
    * the key (Spark samples split points), so the "shuffle" is a single
    * distributed sort — the standard way to randomize example order for
    * training without a driver-side permutation. */
  def shuffleKey(df: DataFrame, idCol: String, seed: String,
      outCol: String = "shuffle_key"): DataFrame =
    df.withColumn(outCol, hashUnit(col(idCol), seed))

  /** Robust (IQR) outlier filter — the standard length/score fence of a
    * curation pipeline: keep rows with
    * `q1 − k·IQR ≤ value ≤ q3 + k·IQR` (k = 1.5 is Tukey's fence).
    * Exact interpolated percentiles (deterministic, engine-portable —
    * same contract as agg_percentiles), computed in ONE 1-row aggregate
    * that broadcasts into a codegen'd filter: no sort, no window, one
    * aggregation pass + one map pass over the data.
    *
    * Rows with a NULL value are dropped (they are excluded from the
    * percentiles and fail the fence comparison) — SQL filter semantics,
    * same as the oracle; fillna first to keep them. */
  def filterOutliersIqr(df: DataFrame, valueCol: String,
      k: Double = 1.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val bounds = df.agg(
      pctl(valueCol, 0.25).as("__q1"),
      pctl(valueCol, 0.75).as("__q3"))
    df.crossJoin(broadcast(bounds))
      .filter(v >= col("__q1") - lit(k) * (col("__q3") - col("__q1")) &&
        v <= col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      .drop("__q1", "__q3")
  }

  /** Median absolute deviation — the robust scale estimate behind
    * modified-z-score outlier rules (|x − median| / MAD > 3.5): exact
    * median, then exact median of absolute deviations. Two percentile
    * aggregates (the first broadcast into the deviation map stage),
    * both deterministic and engine-portable. Returns one row
    * (median, mad). */
  def mad(df: DataFrame, valueCol: String): DataFrame = {
    val med = df.agg(pctl(valueCol, 0.5).as("median"))
    df.crossJoin(broadcast(med))
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("median")))
      .agg(first(col("median")).as("median"),
        expr("percentile(__dev, 0.5)").as("mad"))
  }

  /** Distribution-drift report: per-group Kolmogorov–Smirnov statistic
    * and binned total-variation distance of an integer metric against a
    * designated reference group (the "did source X's length/quality
    * distribution move vs the trusted corpus?" monitor that gates
    * retraining-data refreshes).
    *
    * Both statistics are computed as EXACT integer-numerator rationals —
    * `KS = max_v |C_ref(v)·n_g − C_g(v)·n_ref| / (n_ref·n_g)` and
    * `TVD = Σ_bins |c_g,b·n_ref − c_ref,b·n_g| / (2·n_ref·n_g)` — so no
    * transcendental (the PSI's ln) and no order-dependent float sum ever
    * enters; the one double division of two exactly-represented operands
    * is IEEE-correctly-rounded in every engine, making the report
    * bit-reproducible and DuckDB-oracle-checkable.
    *
    * Scale shape: ONE map-side-combined aggregation reduces the corpus
    * to per-(group, value) counts — everything downstream (value grid ×
    * group cross, cumulative windows, per-bin folds) runs on that
    * histogram-sized summary, never on rows. Counts multiply into
    * DECIMAL(38,0) so n_ref·n_g stays exact past 2^63 (10^11-row groups). */
  def driftReport(df: DataFrame, groupCol: String, valueCol: String,
      refGroup: String, binWidth: Long = 8): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def dec(c: Column) = c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val nRef = totals.filter(col("g") === refGroup)
      .select(col("n").as("n_ref"))
    // A typo'd reference group must fail LOUDLY: the crossJoin below
    // would otherwise annihilate every group and a drift monitor that
    // gates retraining refreshes would read "no drift" forever. One
    // 1-row action on the histogram-sized totals frame — negligible.
    require(!nRef.isEmpty,
      s"driftReport: reference group '$refGroup' has no non-null rows " +
        s"in $groupCol/$valueCol — refusing to emit an empty report")
    val refCounts = counts.filter(col("g") === refGroup)
      .select(col("v"), col("c").as("cr"))
    val others = totals.filter(col("g") =!= refGroup)
      .select(col("g"), col("n").as("n_g"))
    // Full value grid per group: removes the outer-join asymmetry so one
    // cumulative window serves both CDFs. Histogram-sized by construction.
    val grid = others.crossJoin(broadcast(counts.select(col("v")).distinct()))
    val cgSide = counts.select(col("g").as("__cg_g"), col("v").as("__cg_v"),
      col("c").as("cg"))
    val rSide = refCounts.select(col("v").as("__rv"), col("cr"))
    val joined = grid
      .join(cgSide,
        col("g") === col("__cg_g") && col("v") === col("__cg_v"), "left")
      .drop("__cg_g", "__cg_v")
      .join(broadcast(rSide), col("v") === col("__rv"), "left")
      .drop("__rv")
      .na.fill(0L, Seq("cg", "cr"))
      .crossJoin(broadcast(nRef))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val cum = joined
      .withColumn("Cg", sum(col("cg")).over(w))
      .withColumn("Cr", sum(col("cr")).over(w))
    val ks = cum.groupBy(col("g"), col("n_g"), col("n_ref"))
      .agg(max(abs(dec(col("Cr")) * dec(col("n_g")) -
        dec(col("Cg")) * dec(col("n_ref")))).as("ks_num"))
    val tvd = joined
      .groupBy(col("g"), expr(Resample.floorDivExpr("v", binWidth)).as("bin"))
      .agg(sum(col("cg")).as("bg"), sum(col("cr")).as("br"),
        first(col("n_g")).as("n_g"), first(col("n_ref")).as("n_ref"))
      .groupBy(col("g"))
      .agg(sum(abs(dec(col("bg")) * dec(col("n_ref")) -
        dec(col("br")) * dec(col("n_g")))).as("tvd_num"))
    val den = dec(col("n_g")) * dec(col("n_ref"))
    ks.join(tvd, "g")
      .select(col("g").as(groupCol), col("n_g").cast("long").as("n_rows"),
        (col("ks_num").cast("double") / den.cast("double")).as("ks"),
        (col("tvd_num").cast("double") /
          (den * lit(2)).cast("double")).as("tvd"))
  }

  /** Winsorize: CLAMP values to the [lo, hi] quantiles instead of
    * dropping rows (the alternative to [[filterOutliersIqr]] when row
    * count must be preserved). Same shape: one exact-percentile 1-row
    * aggregate broadcast into a codegen clamp. NULL values stay NULL —
    * least/greatest skip nulls, so without the guard a missing datum
    * would be fabricated as the upper bound. */
  def winsorize(df: DataFrame, valueCol: String, lo: Double = 0.01,
      hi: Double = 0.99, outCol: String = "winsorized"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val bounds = df.agg(
      pctl(valueCol, lo).as("__lo"),
      pctl(valueCol, hi).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(greatest(
            least(col(valueCol).cast("double"), col("__hi")), col("__lo"))))
      .drop("__lo", "__hi")
  }
}
