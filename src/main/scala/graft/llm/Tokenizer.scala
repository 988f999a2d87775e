package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tokenizer-training primitives: the frequency-counting round at the heart
 * of byte-pair-encoding vocabulary induction — count adjacent symbol pairs
 * within words across the corpus and surface the top merge candidates.
 * (Full BPE training iterates this round, re-segmenting after each merge;
 * the corpus-wide counting step is the distributed-scale part — the merge
 * table itself is tiny, driver-side state.)
 *
 * Scale shape (100 TB): explode to one row per adjacent position, ONE
 * map-side-combined groupBy on the (symbol, symbol) pair, top-k via
 * TakeOrderedAndProject — no global sort, nothing collected.
 *
 * Character indexing is BMP-scoped, like [[TextFunctions.rollingFingerprint]]:
 * `substr` counts UTF-16 units in the JVM and code points in engines that
 * index by code point, so astral-plane corpora would disagree by position.
 */
object Tokenizer {

  /**
   * Top-`topK` adjacent character pairs within whitespace words, ordered by
   * (count desc, pair) — the first-round BPE merge ranking.
   */
  def mergeCandidates(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2) // sequence(1, 0) would count DOWN, not empty
    val pairs = words.select(explode(transform(
      sequence(lit(1), length(col("w")) - 1),
      i => struct(col("w").substr(i, lit(1)).as("a"),
        col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
    pairs.groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(topK)
  }
}
