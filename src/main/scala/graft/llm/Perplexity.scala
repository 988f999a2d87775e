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
 * Models: unigram add-one smoothing — p(w) = (c(w)+1)/(N+V), unseen tokens
 * take 1/(N+V) — and the bigram tier p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V).
 * (KenLM-grade interpolated/backoff models are out of sandbox scope; these
 * are the standard cheap tiers and exercise the same pipeline shape.)
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

  /**
   * Bigram tier of the same filter: p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V) —
   * add-one smoothing over the reference's bigram counts, backed by the
   * unigram context count (an unseen context takes c(w1)=0, so the whole
   * row degrades to 1/V — the standard conditional add-one form). Docs
   * with fewer than two tokens emit no row (they have no bigram to score);
   * a pipeline stacks this under [[unigramScore]], which covers them.
   *
   * Scale shape: identical to unigram — two reference aggregations (bigram
   * and context counts, both map-side combined and bounded by reference
   * volume), the corpus's exploded bigrams join both on equality (AQE
   * broadcasts small models), one groupBy(doc). Nothing collected.
   *
   * @return (idCol, n_bigrams, n_unseen, mean_nll_micro) — n_unseen counts
   *         bigrams absent from the reference
   */
  def bigramScore(docs: DataFrame, reference: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val refW = reference.select(TextFunctions.tokens(col(textCol)).as("w"))
    val refBg = refW.filter(size(col("w")) >= 2)
      .select(explode(graft.functions.AllShinglesFromTokens(col("w"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val refCtx = refW.select(explode(col("w")).as("w1"))
      .filter(col("w1") =!= "") // an empty doc tokenizes to [""]
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vref = refCtx.agg(count(lit(1)).as("v_ref"))
    val docBg = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol),
        explode(graft.functions.AllShinglesFromTokens(col("w"), 2)).as("bg"))
      // tokens are whitespace-split, so the first space splits the bigram
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    docBg
      .join(refBg, Seq("bg"), "left")
      .join(refCtx, Seq("w1"), "left")
      .crossJoin(broadcast(vref))
      .select(col(idCol), col("c2"),
        (-log((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v_ref")))).as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_unseen"),
        round(avg(col("nll")) * 1000000).cast("long").as("mean_nll_micro"))
  }
}
