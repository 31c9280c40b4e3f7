package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
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
    val toks = tokens(col(textCol))
    // start positions 1, 1+stride, ... covering every token once;
    // last window starts at or before (size - chunkSize) + stride
    val starts = sequence(lit(1),
      greatest(size(toks) - chunkSize, lit(0)) + lit(stride), lit(stride))
    df.select(col(idCol),
        posexplode(transform(starts,
          s => array_join(slice(toks, s, lit(chunkSize)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .filter(col("chunk_text") =!= "")
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")))
  }
}
