package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-column statistics in ONE aggregation pass (cudf DataFrame.corr,
  * python/cudf dataframe.py corr; the reference computes per-pair
  * reductions — here all k(k+1)/2 moment sums ride in a single
  * partial-aggregate, so the data is read once regardless of how many
  * column pairs are requested).
  *
  * Determinism: every sum runs in exact decimal (the QueryPack.dsum
  * contract) and per-row products are IEEE doubles, so the derived
  * Pearson coefficients are bit-identical across runs, partitionings,
  * and engines — the corr matrix is DuckDB-oracle-checkable.
  */
object Stats {

  // precision 38 (the max): per-row products square the input
  // magnitude, and a narrower cast would overflow to NULL under
  // non-ANSI Spark and be silently DROPPED from the moment sums while
  // count(*) still counts the row — garbage correlations, no error.
  // 38,6 holds products up to 1e32. Profiled: decimal precision does
  // not change aggregation cost (the decimal path itself is ~10× a
  // plain double sum either way — that is the exact-mode price).
  // fast_decimal ≡ cast(DecimalType) bit for bit (FastDoubleToDecimal
  // proof, FastDecimalSpec) without the per-row Double.toString/
  // BigDecimal churn — the moment sums were ~400 ns/row/agg, dominated
  // by the cast, not the decimal add (guide §4).
  private def dsum(c: org.apache.spark.sql.Column, scale: Int) =
    sum(graft.plans.GraftExpressions.fastDecimal(c, 38, scale)).cast("double")

  /** Pairwise Pearson correlation of `cols` as rows (col_a, col_b, corr)
    * for col_a < col_b, from one aggregation over the input.
    *
    * Columns must be non-null: `n` is count(*), so a null in any column
    * would bias that column's moments (drop or impute first — cudf's
    * corr makes the same pairwise-complete assumption only row-wise).
    * A constant column yields NaN correlations (zero variance), same as
    * the reference.
    *
    * `exact = true` (default, the oracle contract) runs the moment sums
    * in exact decimal — bit-identical across runs/engines but ~10× the
    * aggregation cost of plain double sums (measured ~400 ns/row/agg).
    * `exact = false` sums doubles: same one-pass plan, full speed,
    * reproducible only up to partial-aggregation order (last-ulp).
    *
    * Exact-mode range: products quantize at 6 decimal places, so
    * columns whose pairwise products fall below ~1e-5 should be
    * rescaled first (cov(i,i) could quantize to ≤ 0 → NaN); the upper
    * bound is 1e32 per product. */
  def corrMatrix(df: DataFrame, cols: Seq[String],
      exact: Boolean = true,
      inputScale: Option[Int] = None): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size,
      "columns must be distinct (duplicate names would collide in the " +
        "__s_/__p_ aggregate aliases)")
    // inputScale (exact mode): when the data is NATIVELY fixed-point
    // (money at 2 decimals), quantize the INPUTS to DECIMAL(18,scale)
    // — lossless at the data's own scale, and every product is then an
    // exact decimal. Without it, products round in double at 0.5 ulp,
    // and for |product| > 2^(52-20) that rounding can cross DuckDB's
    // scale-in-double-space .5 boundary, flipping the last decimal
    // digit between engines (caught by the 5× stress on ds_regression's
    // syy moment). None keeps the generic quantize-products-at-6dp
    // contract for data that isn't fixed-point.
    def msum(c: org.apache.spark.sql.Column) =
      if (exact) dsum(c, 6) else sum(c.cast("double"))
    val n = count(lit(1)).cast("double").as("__n")
    // products multiply in DOUBLE, not the columns' native type: an
    // int*int product would wrap silently at 2^31 under non-ANSI Spark
    // BEFORE reaching the decimal cast (for the gated double columns
    // the cast is a no-op, so oracle arithmetic is unchanged)
    val (sums, prods) = inputScale match {
      case Some(sc) if exact =>
        // fast_decimal ≡ cast (FastDoubleToDecimal proof); the product
        // itself stays a compact-decimal multiply, the per-row
        // toString/BigDecimal parse of BOTH factors is what this removes
        def q(c: String) = graft.plans.GraftExpressions.fastDecimal(
          col(c).cast("double"), 18, sc)
        (cols.map(c => sum(q(c)).cast("double").as(s"__s_$c")),
          for { i <- cols.indices; j <- i until cols.size }
            yield sum(q(cols(i)) * q(cols(j))).cast("double")
              .as(s"__p_${i}_$j"))
      case _ =>
        (cols.map(c => msum(col(c).cast("double")).as(s"__s_$c")),
          for { i <- cols.indices; j <- i until cols.size }
            yield msum(col(cols(i)).cast("double") * col(cols(j)).cast("double"))
              .as(s"__p_${i}_$j"))
    }
    // the k(k+1)/2 exact-decimal product sums are heavy per-row CPU
    // (BigDecimal multiplies) in the PARTIAL aggregate, which runs on
    // the scan's splits: guard against a single-row-group input
    // serializing it onto one core (Spread scaladoc)
    val m = Spread.spread(df).agg(n, (sums ++ prods): _*)
    def cov(i: Int, j: Int) = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      col("__n") * col(s"__p_${a}_$b") -
        col(s"__s_${cols(i)}") * col(s"__s_${cols(j)}")
    }
    val rows = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
      (cov(i, j) / (sqrt(cov(i, i)) * sqrt(cov(j, j)))).as("corr"))
    m.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a").as("col_a"), col("r.col_b").as("col_b"),
        col("r.corr").as("corr"))
  }

  /** Per-group WEIGHTED percentiles (type-1 / lower step function):
    * for each requested p = num/den, the smallest value v such that
    * the summed weight of rows with value ≤ v reaches p of the group's
    * total weight. Spark has no weighted percentile (`percentile`
    * takes a frequency argument only for integral exact counts at the
    * aggregate level, not per-group thresholds across engines), and
    * neither does the reference (quantiles.hpp interpolates unweighted
    * row ranks) — this is the survey-weighting / importance-weighted
    * quantile every curation pipeline ends up hand-rolling.
    *
    * Weights must be positive (zero/negative weights would make the
    * running cumulative sum non-monotone and every threshold silently
    * wrong — they are rejected here, not dropped) and are rounded
    * HALF_UP to integers (pre-scale fractional weights for more
    * resolution; both Spark `round` and the oracle's `round()` agree
    * on positive halves, unlike `cast(long)` which truncates while
    * DuckDB's CAST rounds). Each threshold test is then
    * `den·cum ≥ num·total` — pure integer
    * arithmetic, so no float rounding can flip a boundary row on
    * either engine: results are deterministic and oracle-checkable.
    *
    * Plan: (group, value) pre-aggregation collapses the data to
    * distinct values FIRST (the running sum then costs |distinct|,
    * not |rows|, and equal values can never straddle a threshold —
    * RANGE-frame semantics by construction), one running-sum window
    * on the group key (same partitioning as the pre-aggregate: no
    * second shuffle), one conditional-min final aggregate. All
    * requested percentiles ride in the single pass. */
  /** Contingency table with exact independence diagnostics for two
    * categorical columns — the "is lang independent of source?"
    * dependence audit run before stratified sampling trusts a single
    * stratification key.
    *
    * Per (a, b) cell: observed count `o`, row/col totals `r`/`c`, grand
    * total `n`, and two EXACT integer quantities — `e_num = r·c` (the
    * expected count's numerator over denominator n) and
    * `resid_num = n·o − r·c` (the χ² residual's numerator; its sign is
    * the over/under-representation direction and `resid_num = 0` iff
    * the cell is exactly independent). No division ever happens, so
    * every column is engine-exact; consumers derive e = e_num/n and
    * χ² terms as resid_num²/(n·r·c) at whatever precision they need.
    *
    * Scale shape: one (a, b)-keyed map-side-combined count over the
    * corpus; the margins are two aggregations OF THAT summary plus two
    * broadcast joins — everything after the first pass is
    * |domain(a)|×|domain(b)|-sized. */
  def contingency(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val cols0 = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    cells
      .join(broadcast(rows), "a")
      .join(broadcast(cols0), "b")
      .crossJoin(broadcast(tot))
      .select(col("a").as(aCol), col("b").as(bCol), col("o"), col("r"),
        col("c"), col("n"),
        (dec(col("r")) * dec(col("c"))).as("e_num"),
        (dec(col("n")) * dec(col("o")) - dec(col("r")) * dec(col("c")))
          .as("resid_num"))
  }

  /** Mann-Whitney U rank-sum test between two groups of an integral
    * value column — the nonparametric "did the quality-score
    * distribution shift between these two sources?" check that needs no
    * normality assumption (pairs with the parametric z-scores of
    * standardizeByGroup and the distributional KS/TVD drift report).
    *
    * Formulation is count-based, NOT rank-based: ranking every row
    * needs a global sort, but U only depends on per-VALUE counts —
    * `U_a = Σ_v cA(v)·(#B below v) + ½·cA(v)·cB(v)`. So the corpus
    * collapses to one map-side-combined (value → cA, cB) aggregate
    * first, and the running "#B strictly below" window runs over
    * |distinct values| rows (summary-sized by assumption — scores,
    * grades, quantities; the single-partition window is deliberate and
    * cheap there). Doubled U values (`u2_*`) and the tie-correction
    * Σ(t³−t) stay pure integers, so both engines agree bit-for-bit;
    * the normal-approximation z is derived from those exact integers
    * with a fixed IEEE expression tree (identical on both engines).
    * Checks: u2_a + u2_b = 2·n_a·n_b always holds. */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      labelA: String, labelB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val perValue = df
      .filter(col(groupCol).isin(labelA, labelB) && col(valueCol).isNotNull)
      .groupBy(v.as("__v"))
      .agg(sum(when(col(groupCol) === labelA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === labelB, 1L).otherwise(0L)).as("cb"))
    val below = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("ca") + col("cb")
    val agg = perValue
      .withColumn("cb_below", coalesce(sum(col("cb")).over(below), lit(0L)))
      .withColumn("ca_below", coalesce(sum(col("ca")).over(below), lit(0L)))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca") * (col("cb_below") * 2 + col("cb"))).as("u2_a"),
        sum(col("cb") * (col("ca_below") * 2 + col("ca"))).as("u2_b"),
        sum((t * t * t - t).cast(DecimalType(38, 0))).as("tie_cubes"))
    val n = col("n_a") + col("n_b")
    val varNum = (col("n_a") * col("n_b")).cast("double") *
      ((n + 1).cast("double") -
        col("tie_cubes").cast("double") / (n * (n - 1)).cast("double")) / 12.0
    agg.select(col("n_a"), col("n_b"), col("u2_a"), col("u2_b"),
      col("tie_cubes").cast("long").as("tie_cubes"),
      ((col("u2_a") - col("n_a") * col("n_b")).cast("double") /
        (sqrt(varNum) * 2.0)).as("z"))
  }

  def weightedPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String,
      ps: Seq[(String, Long, Long)]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    ps.foreach { case (name, num, den) =>
      require(den > 0 && num >= 0 && num <= den,
        s"$name: need 0 <= num <= den, den > 0 (got $num/$den)")
    }
    import org.apache.spark.sql.expressions.Window
    val wLong = round(col(weightCol).cast("double")).cast("long")
    val byValue = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .withColumn("__w1", wLong)
      .withColumn("__w1", when(col("__w1") > 0, col("__w1")).otherwise(
        raise_error(concat(lit(s"weightedPercentiles: non-positive weight in $weightCol: "),
          col(weightCol).cast("string")))))
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col("__w1")).as("__w"))
    val run = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    val aggs = ps.map { case (name, num, den) =>
      min(when(col("__cum") * den >= col("__tot") * num, col(valueCol)))
        .as(name)
    }
    byValue
      .withColumn("__cum", sum(col("__w")).over(run))
      .withColumn("__tot", sum(col("__w")).over(whole))
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group winsorization: clamp `valueCol` to the group's type-1
    * [lo, hi] quantile cuts (lo = smallest v whose cumulative count
    * reaches loNum/loDen of the group, ditto hi) — the outlier-capping
    * step of a feature/curation pipeline (reference analog: the
    * clamp/clip scalar of copying.hpp:39 with data-derived bounds).
    *
    * Scale shape: the rank math runs over PER-(group, value) COUNTS
    * (one row per distinct value — the same pre-aggregation as
    * [[weightedPercentiles]]), never a raw-row sort; the cuts frame is
    * |groups| rows and broadcast-joins back onto the fact. Type-1
    * (select an actual data value, integer threshold arithmetic) keeps
    * the cut engine-portable — no interpolation mode to disagree on.
    * Returns `df` + `lo_cut`, `hi_cut`, and `<valueCol>_w` (clamped). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Long, loDen: Long, hiNum: Long, hiDen: Long): DataFrame = {
    require(loDen > 0 && hiDen > 0 && loNum >= 0 && hiNum >= 0 &&
      loNum <= loDen && hiNum <= hiDen && loNum * hiDen <= hiNum * loDen,
      s"need 0 <= lo <= hi <= 1 (got $loNum/$loDen, $hiNum/$hiDen)")
    import org.apache.spark.sql.expressions.Window
    val byValue = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__w"))
    val run = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    val cuts = byValue
      .withColumn("__cum", sum(col("__w")).over(run))
      .withColumn("__tot", sum(col("__w")).over(whole))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__cum") * loDen >= col("__tot") * loNum,
          col(valueCol))).as("lo_cut"),
        min(when(col("__cum") * hiDen >= col("__tot") * hiNum,
          col(valueCol))).as("hi_cut"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        // NULL stays NULL: Spark's least/greatest SKIP nulls, so the
        // unguarded clamp would fabricate lo_cut for a missing datum.
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("lo_cut")), col("hi_cut"))))
  }

  /** Table rows at quantile positions (quantiles.hpp:89 `quantiles` —
    * gathers WHOLE ROWS of the input at quantile indices of its
    * multi-column sort order), with the reference's non-arithmetic
    * interpolation strategies — LOWER / HIGHER / NEAREST only, exactly
    * as quantiles.cu:72 enforces for row gathering.
    *
    * Index rule ported from quantiles_util.hpp:73-88: val = q·(n−1),
    * lower = ⌊val⌋, higher = ⌈val⌉, nearest = nearbyint(val) — i.e.
    * HALF-TO-EVEN. Quantiles enter as exact rationals (num, den) and
    * all three indices derive in pure INTEGER arithmetic
    * (a = num·(n−1); a div/mod den; tie ⇔ 2·rem = den resolves to the
    * even neighbor), so any engine replays them exactly; for dyadic
    * fractions this equals the reference's double computation
    * bit-for-bit.
    *
    * Scale shape: one count, one distributed range sort feeding
    * zipWithIndex (the sampleNegatives dense-rank pattern — never a
    * single-partition window), then a filter keeps the ≤|q| wanted
    * indices; only the |q| result rows ever reach the driver (the
    * output IS |q|-sized — same class as Similarity.collectModel).
    * `sortCols` must be a TOTAL order (include a unique tiebreaker)
    * or the gathered rows are nondeterministic — same caveat as the
    * reference's unstable sorted_order. */
  def rowsAtQuantiles(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
      qs: Seq[(Long, Long)], interp: String): DataFrame =
    rowsAtQuantilesMulti(df, sortCols, qs, Seq(interp))

  /** Multi-strategy form: every (q, interp) pair from ONE count and ONE
    * distributed sort — the three-strategy gate would otherwise pay the
    * range sort once per interpolation. */
  def rowsAtQuantilesMulti(df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      qs: Seq[(Long, Long)], interps: Seq[String]): DataFrame = {
    interps.foreach(i => require(Seq("lower", "higher", "nearest").contains(i),
      s"row quantiles need a non-arithmetic interpolation, got $i"))
    // the gather appends these internal/output names; a clash would
    // make the join ambiguous — fail loudly instead
    val reserved = Seq("__idx", "q_num", "q_den", "interp")
    val clash = df.schema.fieldNames.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns clash with reserved quantile-gather names: $clash")
    val spark = df.sparkSession
    val n = df.count()
    if (n == 0) {
      // reference parity: cudf::quantiles of an empty table is an
      // empty table (quantiles.hpp:89), not an error — return the
      // output schema ((q_num, q_den, interp) ++ input fields) empty
      val outSchema = org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("q_num",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("q_den",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("interp",
              org.apache.spark.sql.types.StringType, nullable = true)) ++
          df.schema.fields)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    }
    def idxOf(num: Long, den: Long, interp: String): Long = {
      require(den > 0 && num >= 0 && num <= den, s"bad quantile $num/$den")
      if (n < 2) 0L
      else {
        val a = num * (n - 1)
        val lo = a / den
        val rem = a % den
        interp match {
          case "lower" => lo
          case "higher" => if (rem > 0) lo + 1 else lo
          case "nearest" =>
            if (2 * rem < den) lo
            else if (2 * rem > den) lo + 1
            else lo + (lo % 2) // exact tie: round to the even index
        }
      }
    }
    val targets = for {
      interp <- interps
      (num, den) <- qs
    } yield (num, den, interp, idxOf(num, den, interp))
    val wanted = targets.map(_._4).toSet
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema
    // persist the sorted rows: zipWithIndex launches its own
    // partition-size job before the filtering job, and without the
    // cache BOTH would re-execute the range sort
    val srdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hits = spark.createDataFrame(
      srdd.zipWithIndex.collect {
        case (row, i) if wanted(i) =>
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
      },
      schema.add("__idx", "long"))
    import spark.implicits._
    val qFrame = targets.toDF("q_num", "q_den", "interp", "__idx")
    val out = qFrame.join(broadcast(hits), "__idx")
      .drop("__idx")
      .localCheckpoint() // |q|-sized; lets the sort cache free NOW
    srdd.unpersist()
    out
  }
}
