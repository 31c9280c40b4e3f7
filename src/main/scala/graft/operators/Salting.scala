package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §2.13 / §7 step 9).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one join key dominates so heavily that
  * even split partitions hot-spot (the classic power-law key at 100 TB).
  * The skewed side gets a random-but-deterministic salt in [0, n); the
  * other side is replicated n× via explode so every salted key finds its
  * match. Replication cost is n× the SMALLER side — choose n ≈ the skew
  * factor, keep the replicated side the dimension.
  */
object Salting {

  /** Inner equi-join of a skewed fact to a dimension with an n-way salt.
    * The salt is a DETERMINISTIC hash of the fact row's own columns:
    * spark_partition_id/monotonically_increasing_id are not stable
    * under task recomputation, so a fetch-failure retry after a partial
    * shuffle-map stage would re-salt recomputed rows differently and
    * lose/duplicate join output (the SPARK-23207 class of bug). Caveat:
    * byte-identical duplicate rows of a hot key share a salt — salting
    * spreads a hot KEY, not identical-row multiplicity (AQE skew-join
    * splitting handles that case). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(n)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
