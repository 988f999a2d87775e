package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram language-model scoring — the perplexity quality filter of a
 * CCNet-style curation stack: train a smoothed unigram model on a reference
 * corpus (the "clean" text), score every candidate document by mean
 * negative log-likelihood per token, and let the pipeline drop or re-weight
 * the high-perplexity (out-of-domain / garbage) tail.
 *
 * Model: add-one smoothing — p(w) = (c(w)+1)/(N+V); unseen tokens take
 * 1/(N+V). (KenLM-grade n-gram models are out of sandbox scope; unigram is
 * the standard cheap tier and exercises the same pipeline shape.)
 *
 * Exactness stance: matches the BM25 convention — ln() over identical
 * doubles, averaged per document and published as `round(avg·1e6)`; summands
 * are O(1)-magnitude so engine sum-order drift (~1e-13 relative) sits far
 * below the rounding radius.
 *
 * Scale shape (100 TB): the vocabulary aggregates from the reference with
 * map-side combine (bounded by reference volume, not corpus volume); corpus
 * tokens join the vocab on the token — an equality join AQE broadcasts when
 * the vocab is small and shuffles by token otherwise; one groupBy(doc) ends
 * the pipeline. Nothing is collected.
 */
object Perplexity {

  /**
   * Score `docs` against the unigram model of `reference`.
   *
   * @return (idCol, n_tokens, n_oov, mean_nll_micro) — n_oov counts tokens
   *         absent from the reference vocabulary
   */
  def unigramScore(docs: DataFrame, reference: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val vocab = reference
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val stats = vocab.agg(sum(col("c")).as("n_ref"),
      count(lit(1)).as("v_ref"))
    val docToks = docs.select(col(idCol), explode(
      TextFunctions.tokens(col(textCol))).as("tok"))
    docToks
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("c"),
        (-log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_ref") + col("v_ref")))).as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(avg(col("nll")) * 1000000).cast("long").as("mean_nll_micro"))
  }
}
