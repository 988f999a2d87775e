package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyword relevance ranking over a document corpus — the retrieval half of a
 * training-data curation stack (score documents against a topic/query term
 * list; select or weight by relevance).
 *
 * BM25 with the Lucene/ATIRE idf form: idf(t) = ln((N - df + 0.5)/(df + 0.5)
 * + 1), contribution(t, d) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
 *
 * Scale shape (100 TB): one explode+groupBy for term frequencies (the only
 * wide shuffle, keyed by doc id), document-frequency and corpus stats are
 * tiny aggregates broadcast back — the corpus is touched exactly once and
 * never collected.
 */
object Ranking {

  /**
   * BM25 score per document for a bag-of-terms query. Only documents
   * containing at least one query term appear (score > 0 by construction).
   *
   * @return (doc_id, n_terms, score) — n_terms = distinct query terms hit
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("w"))
    val docLens = base.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val global = docLens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    val tf = base
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    tf.join(broadcast(df), "tok")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(global))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib")).as("score"))
  }

  /**
   * The k most frequent tokens corpus-wide (ties broken by token text) —
   * vocabulary inspection / stopword discovery. Explode + groupBy + a
   * TakeOrderedAndProject top-k: no global sort materializes.
   */
  def topTerms(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(k)
}
