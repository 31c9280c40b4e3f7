package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north star: ANN over Array[Float]
  * columns). Brute-force cosine top-k is the exact baseline; the
  * LSH-bucketed variant (random-hyperplane signs) is the scale path.
  *
  * All vector math is double-cast element-wise lambdas inside codegen —
  * float inputs are widened before multiply/accumulate so results are
  * exact, deterministic doubles.
  */
object Similarity {

  /** Dot product of two array<float/double> columns in double space
    * (sequential left fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each query vector, brute force:
    * broadcast the (small) query set against the corpus, compute cosine,
    * take k per query via a window. At cluster scale the corpus stays
    * partitioned; per-partition work is queries × rows — embarrassingly
    * parallel, one shuffle for the final per-query top-k. */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Random-hyperplane sign-bit bucket id: `bits` pseudo-hyperplanes
    * whose components are derived from xxhash64(bit, dim) — deterministic,
    * no stored model. Vectors in the same bucket are ANN candidates. */
  def lshBucket(vecCol: String, bits: Int): Column =
    expr(s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, b) ->
      acc | CASE WHEN aggregate(zip_with($vecCol,
            transform(sequence(1, size($vecCol)),
              i -> CAST(xxhash64(b, i) % 1000 AS DOUBLE) / 1000.0),
            (x, h) -> CAST(x AS DOUBLE) * h),
          CAST(0.0 AS DOUBLE), (a2, v) -> a2 + v) > 0
        THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)""")

  /** Lloyd k-means coarse quantizer trainer. Centroids are the MODEL —
    * k×dim doubles, driver-sized by definition (exactly what the
    * reference's IVF training produces); each iteration is one broadcast
    * assignment map stage + one groupBy whose partial buffers are
    * (sum-vector, count) per cell per partition (VectorAvgAgg), so
    * shuffle volume is k×dim×partitions, never the corpus. Deterministic:
    * seeds are the nCells corpus rows with the smallest xxhash64(id) —
    * no count(), no RNG. Returns (cell_id, c_vec). */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // cache: the seed pass plus every Lloyd iteration re-reads this
    val vecs = corpus.select(col(idCol).as("n_id"),
      transform(col(vecCol), _.cast("double")).as("n_vec")).cache()
    var centroids = vecs
      .orderBy(xxhash64(col("n_id")), col("n_id")).limit(nCells)
      .select(col("n_vec").as("c_vec"))
      .collect().map(_.getSeq[Double](0)).zipWithIndex
    val vecAvg = udaf(graft.functions.Udfs.VectorAvgAgg)
    var i = 0
    while (i < iters) {
      val cDf = broadcast(centroids.toSeq
        .toDF("c_vec", "cell_id").select(col("cell_id"), col("c_vec")))
      val assignW = Window.partitionBy(col("n_id"))
        .orderBy(col("c_sim").desc, col("cell_id"))
      val updated = vecs.crossJoin(cDf)
        .withColumn("c_sim", cosine(col("n_vec"), col("c_vec")))
        .withColumn("c_rank", row_number().over(assignW))
        .filter(col("c_rank") === 1)
        .groupBy(col("cell_id"))
        .agg(vecAvg(col("n_vec")).as("c_vec"))
        .collect().map(r => (r.getSeq[Double](1), r.getInt(0)))
      // keep unmoved seeds for cells that lost all members
      val byCell = updated.map { case (v, id) => id -> v }.toMap
      centroids = centroids.map { case (v, id) => (byCell.getOrElse(id, v), id) }
      i += 1
    }
    vecs.unpersist()
    centroids.toSeq.toDF("c_vec", "cell_id")
      .select(col("cell_id"), col("c_vec"))
  }

  /** IVF-style ANN: centroids partition the corpus into cells
    * (assignment = argmax cosine to centroid); queries probe their
    * `nprobe` nearest cells and brute-force within them — the
    * inverted-file architecture (coarse quantizer + posting lists).
    * Default quantizer: the nCells corpus vectors with smallest
    * xxhash64(id) (deterministic, single limit pass, no count()); pass
    * `centroids = Some(kmeansCentroids(...))` for trained cells.
    *
    * Scale: cell assignment is a broadcast map stage; the probe join
    * shuffles on cell id, so cost ∝ cell occupancy × queries, not
    * corpus². Recall grows with nprobe. */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int,
      nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroids0: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val centroids = centroids0.getOrElse(
      corpus.orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCells)
        .select(col(idCol).as("cell_id"), col(vecCol).as("c_vec")))
    // corpus rows → single nearest cell
    val assignW = Window.partitionBy(col("n_id"))
      .orderBy(col("c_sim").desc, col("cell_id"))
    val assigned = c.crossJoin(broadcast(centroids))
      .withColumn("c_sim", cosine(col("n_vec"), col("c_vec")))
      .withColumn("c_rank", row_number().over(assignW))
      .filter(col("c_rank") === 1)
      .select(col("cell_id"), col("n_id"), col("n_vec"))
    // queries → nprobe nearest cells
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("cell_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("cell_id"), col("q_id"), col("q_vec"))
    val scored = assigned.join(probes, "cell_id")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Approximate top-k: candidates restricted to same LSH bucket, then
    * exact cosine + per-query top-k. Shuffle key is the bucket id, so
    * cost scales with bucket occupancy, not corpus². Recall depends on
    * bits (fewer bits → bigger buckets → higher recall, more compute). */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("bucket", lshBucket("q_vec", bits))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("bucket", lshBucket("n_vec", bits))
    val scored = c.join(q, "bucket")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Sign-LSH bucket for multi-TABLE hashing: table `tableCol`'s bucket
    * uses hyperplanes `tableCol*bits .. tableCol*bits + bits-1`, so each
    * table is an independent `bits`-bit hash of the same vector. */
  private def lshBucketAt(vecCol: String, tableCol: String, bits: Int): Column =
    expr(s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, b) ->
      acc | CASE WHEN aggregate(zip_with($vecCol,
            transform(sequence(1, size($vecCol)),
              i -> CAST(xxhash64($tableCol * $bits + b, i) % 1000 AS DOUBLE) / 1000.0),
            (x, h) -> CAST(x AS DOUBLE) * h),
          CAST(0.0 AS DOUBLE), (a2, v) -> a2 + v) > 0
        THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)""")

  /** Embedding-cosine near-dup PAIRS, exact: every (id_a < id_b) pair
    * with cosine ≥ threshold, by all-pairs comparison. Quadratic in the
    * input — the oracle ground truth for [[cosineNearDupPairs]], only
    * for bounded inputs (same positioning as Dedup.jaccardPairsExact). */
  def cosineNearDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding-cosine near-dup pairs at scale: multi-table sign-LSH
    * candidates (a pair is a candidate if ANY of `tables` independent
    * `bits`-bit hashes collide — OR-amplification lifts recall, e.g.
    * p=0.87/bit at sim 0.9 gives 1-(1-0.87³)¹² ≈ 0.9998), then exact
    * cosine verification, so precision is 1.0 by construction.
    *
    * Same 100 TB shape as Dedup.minhashPairs: the bucket self-join
    * shuffles (id, table, bucket) triples only — never vectors — and
    * the explicit repartition gives both join sides one canonical
    * exchange for AQE stage reuse. Verification joins vectors back per
    * candidate, ∝ candidate count, not corpus². */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 3, tables: Int = 12): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val banded = vecs
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket", lshBucketAt("vec", "t", bits))
      .select(col("id"), struct(col("t"), col("bucket")).as("tb"))
      .repartition(col("tb"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.tb") === col("b.tb") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
