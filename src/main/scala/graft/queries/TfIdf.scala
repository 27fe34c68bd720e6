package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** ONE definition of the TF-IDF cosine contract, shared by
  * `e4_tfidf_cosine` (sparse pairwise similarity, `TextOps`) and
  * `e3_hybrid_rrf` (the sparse retriever of the hybrid fusion,
  * `VectorOps`) — the same convention as `VectorOps.assignCte`: queries
  * that must agree on a rule share its single definition, so the rule
  * cannot drift apart between them.
  *
  * The contract: whitespace tokens ([[TextFunctions.tokens]]), smoothed
  * idf `ln((N+1)/(df+1)) + 1`, and per-term contributions (w², wa·wb)
  * quantized to integer MICROS before summing, so dot and norm are exact
  * integer math — independent of partitioning and engine summation order
  * (the e4_unigram_logprob carrier). idf > 0 keeps every norm positive.
  * [[oracleCtes]] is the DuckDB rendering of the same chain; both engines
  * replay it term for term.
  */
private[queries] object TfIdf {

  /** `(doc_id, t, w)` smoothed-idf TF-IDF weights over `bounded`
    * (`doc_id`, `text`). tf/df partial-aggregate map-side; the corpus size
    * is a broadcast 1-row aggregate. */
  def weights(bounded: DataFrame): DataFrame = {
    val toks = bounded
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = bounded.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "t").crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") *
        (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
  }

  /** Micro-quantized L2 norm per doc over a [[weights]] table. */
  def norms(w: DataFrame): DataFrame =
    w.groupBy("doc_id")
      .agg(sqrt(sum(round(col("w") * col("w") * 1e6, 0).cast("long"))
        .cast("double") / 1e6).as("nrm"))

  /** Micro-quantized dot aggregate (use inside an `agg` over the pair's
    * shared terms). */
  def quantizedDot(aw: Column, bw: Column): Column =
    sum(round(aw * bw * 1e6, 0).cast("long")).cast("double") / 1e6

  /** DuckDB twin of the chain above over `documents WHERE doc_id < bound`:
    * CTEs `tok`, `tf`, `dfreq`, `n`, `w` (doc_id, t, w) and `tn`
    * (doc_id, nrm). Splice after `WITH `. */
  def oracleCtes(bound: Int): String =
    s"""tok AS (SELECT doc_id, unnest(${TextFunctions.tokensSql}) AS t
          FROM documents WHERE doc_id < $bound),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < $bound),
        w AS (SELECT doc_id, t,
            tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w
          FROM tf JOIN dfreq USING (t) CROSS JOIN n),
        tn AS (SELECT doc_id, sqrt(CAST(sum(CAST(round(w * w * 1000000)
            AS BIGINT)) AS DOUBLE) / 1000000) AS nrm
          FROM w GROUP BY doc_id)"""

  /** DuckDB rendering of [[quantizedDot]]. */
  def oracleQuantizedDot(aw: String, bw: String): String =
    s"CAST(sum(CAST(round($aw * $bw * 1000000) AS BIGINT)) AS DOUBLE) / 1000000"
}
