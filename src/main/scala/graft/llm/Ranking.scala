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
 * Scale shape (100 TB): the corpus is tokenized ONCE into a single
 * groupBy(doc) pass that yields both the document length and one tf column
 * per query term (the query is small and static, so per-term columns beat
 * per-term rows). Corpus statistics (N, avgdl, per-term df) aggregate the
 * SAME exchange — Spark's exchange reuse executes the scan once — and come
 * back as one broadcast row. Nothing is collected.
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
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val qs = terms.distinct
    def tfc(t: String) = s"tf_${qs.indexOf(t)}"
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("tok"))
    // one shuffle keyed by doc: per-doc length + per-term counts
    val perDoc = toks.groupBy(col("doc_id"))
      // dl is constant per doc; max (not first) keeps the aggregate
      // deterministic so the stats branch can reuse this exchange
      .agg(max(col("dl")).as("dl"),
        qs.map(t => sum(when(col("tok") === t, 1L).otherwise(0L)).as(tfc(t))): _*)
    // corpus stats over the same exchange, one broadcast row
    val statCols = count(lit(1)).as("n_docs") +: avg(col("dl")).as("avgdl") +:
      qs.map(t => sum(when(col(tfc(t)) > 0, 1L).otherwise(0L)).as(s"df_${tfc(t)}"))
    val global = perDoc.agg(statCols.head, statCols.tail: _*)

    def contrib(t: String) = {
      val tf = col(tfc(t))
      val df = col(s"df_${tfc(t)}")
      val idf = log((col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
      when(tf > 0,
        idf * (tf * (k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(global))
      .select(col("doc_id"),
        qs.map(t => when(col(tfc(t)) > 0, 1L).otherwise(0L)).reduce(_ + _).as("n_terms"),
        qs.map(contrib).reduce(_ + _).as("score"))
      .filter(col("n_terms") > 0)
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

  /**
   * Reciprocal-rank fusion of ranked lists — the standard hybrid-retrieval
   * combiner (keyword BM25 list ⊕ vector ANN list): score(id) =
   * Σ_lists 1/(k + rank_list(id)), items missing from a list contribute 0.
   *
   * Exactness: each list's contribution is published as the integer
   * `round(1e6/(k+rank))` and the integers are summed — no cross-engine
   * double drift. (1e6/(k+rank) is a ratio of small exact integers; its
   * double is identical in any IEEE engine, as is the round.)
   *
   * Scale shape: a union of the (already small, top-k) ranked lists and one
   * groupBy on the id — the corpus itself is never touched here; ranking
   * lists are the inputs.
   *
   * @param rankings each (id, rank) with rank ≥ 1
   * @return (id, n_lists, rrf_micro)
   */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val u = rankings.map(_.select(col("id"), col("rank"))).reduce(_ unionByName _)
    u.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"),
        sum(round(lit(1000000.0) / (col("rank") + kConst)).cast("long")).as("rrf_micro"))
  }
}
