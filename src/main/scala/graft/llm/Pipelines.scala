package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Composed training-data pipelines: the individual operators (quality gate,
 * exact dedup, near-dup removal) chained the way a real corpus-cleaning job
 * runs them. Kept as library code — the composition order and the survivor
 * rules ARE semantics (e.g. near-dup pairs are computed among exact-dedup
 * survivors, not raw documents), so they belong behind one tested surface.
 */
object Pipelines {

  /**
   * The canonical cleaning pass:
   *
   *  1. rule-based quality gate ([[TextFunctions.qualityFlag]]);
   *  2. exact dedup — one survivor (min id) per content hash, via a
   *     window over the hash (ONE shuffle, no groupBy+join-back);
   *  3. near-dup removal — MinHash-LSH candidates verified by exact
   *     Jaccard ([[Dedup.nearDuplicates]]); of every verified pair the
   *     higher id drops, i.e. a document survives iff it has no
   *     smaller-id near-duplicate among the step-2 survivors.
   *
   * Scale shape: one window shuffle (step 2), the LSH banded self-join
   * (step 3, no all-pairs), and a left-anti join against the (small)
   * dropped-id set. Nothing quadratic, nothing collected.
   *
   * @param cache persist the LSH intermediates (forwarded to
   *        [[Dedup.nearDuplicates]]). Leave true for one-shot jobs; pass
   *        false when sweeping many corpora in one session, or the pinned
   *        shingle/signature relations accumulate until executor memory
   *        pressure (see the nearDuplicates scaladoc).
   * @return the surviving rows of `docs`, original columns preserved
   */
  def cleanCorpus(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  nearDupThreshold: Double = 0.9,
                  bands: Int = 16, rowsPerBand: Int = 4,
                  cache: Boolean = true): DataFrame = {
    val text: Column = col(textCol)
    val quality = docs.filter(TextFunctions.qualityFlag(text))
    val uniq0 = quality
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(text)).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // uniq feeds BOTH the LSH candidate generation and the final anti-join:
    // without pinning it, the quality gate + dedup window re-run as a second
    // full corpus pass for the join's left side.
    val uniq = if (cache)
      uniq0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else uniq0
    val dropped = Dedup.nearDuplicates(uniq, idCol, textCol,
      bands = bands, rowsPerBand = rowsPerBand, threshold = nearDupThreshold,
      cache = cache)
      .select(col("doc_b").as(idCol))
      .distinct()
    uniq.join(dropped, Seq(idCol), "left_anti")
  }

  /**
   * Benchmark decontamination: count, per corpus document, the distinct
   * word `shingleN`-grams it shares with ANY benchmark document, and flag
   * documents at or above `minShared` — the standard eval-contamination
   * check a training corpus runs before release (n-gram overlap against
   * held-out benchmarks).
   *
   * Scale shape: the benchmark side collapses to a DISTINCT shingle set
   * (its size is bounded by benchmark text volume, not corpus volume) and
   * the probe is a bucketed equality join on the shingle — no cross join;
   * with a small benchmark Spark broadcasts it. Corpus docs sharing nothing
   * keep `n_hits = 0` via the left join.
   *
   * @return `docs`' id column + `n_hits` (distinct shared shingles) +
   *         `contaminated` boolean
   */
  /**
   * N-gram novelty score — the inverse of [[decontaminate]]'s overlap
   * count, per document: the fraction of a doc's DISTINCT word n-grams
   * that do NOT appear anywhere in a reference corpus. The standard
   * freshness/redundancy signal when growing a training set: novelty ~ 0
   * means the doc restates what the reference already covers (candidates
   * for dropping or down-weighting); novelty ~ 1e6 means new content.
   *
   * Same scale shape as [[decontaminate]]: shingles materialize behind a
   * per-doc exchange, the reference side is collapsed to distinct
   * shingles, and the overlap is a bucketed equality join — per-doc
   * counts come from ONE aggregation over the joined frame (n_total from
   * the left rows, n_hits from the match marker), never a second scan.
   *
   * @return one row per `docs` row: id, `n_total` (distinct shingles),
   *         `n_hits` (of those, how many the reference contains),
   *         `novelty_micro` = 1e6 * (n_total - n_hits) / n_total
   */
  def noveltyScore(docs: DataFrame, reference: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   shingleN: Int = 8): DataFrame = {
    val corpusShingles = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .hint("rebalance", idCol)
      .select(col(idCol),
        explode(graft.functions.DistinctShinglesFromTokens(col("w"), shingleN)).as("s"))
    val refShingles = reference
      .select(TextFunctions.tokens(col(textCol)).as("w"))
      .hint("rebalance", "w")
      .select(explode(graft.functions.DistinctShinglesFromTokens(col("w"), shingleN)).as("s"))
      .distinct()
      .withColumn("__hit", lit(1))
    corpusShingles.join(refShingles, Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_total"), count(col("__hit")).as("n_hits"))
      .withColumn("novelty_micro",
        round((col("n_total") - col("n_hits")).cast("double")
          / col("n_total") * 1000000).cast("long"))
  }

  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 8, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    // Tokenize BEFORE an exchange so the shingle lambda reads a
    // materialized array O(1) per element — wordShingles() inline would
    // re-split the text once per element access (the interpreted-HOF
    // O(tokens²) trap; see Dedup.nearDuplicates / shinglesFromTokens docs).
    val corpusShingles = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .hint("rebalance", idCol)
      .select(col(idCol),
        explode(graft.functions.DistinctShinglesFromTokens(col("w"), shingleN)).as("s"))
    val benchShingles = benchmark
      .select(TextFunctions.tokens(col(textCol)).as("w"))
      .hint("rebalance", "w") // tiny side: the exchange materializes w
      .select(explode(graft.functions.DistinctShinglesFromTokens(col("w"), shingleN)).as("s"))
      .distinct()
    val hits = corpusShingles.join(benchShingles, "s")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minShared)
  }
}
