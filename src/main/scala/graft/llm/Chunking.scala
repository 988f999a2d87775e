package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Token-window document chunking — the context-window prep step of a
 * training / RAG pipeline: split every document into fixed-token windows
 * with a configurable overlap (stride = chunk − overlap), so long documents
 * become model-sized passages and short ones pass through whole.
 *
 * Coverage contract: chunk starts are 0, stride, 2·stride, …; the window
 * count is chosen so the final window reaches the end of the document
 * (`(nChunks−1)·stride + chunk ≥ nTokens`) and still starts inside it
 * (`(nChunks−1)·stride < nTokens`) — every token lands in ≥1 chunk, and
 * consecutive chunks share exactly `overlap` tokens (except a possibly
 * deeper overlap of the final, right-aligned-capped window).
 *
 * Scale shape (100 TB): a pure per-row projection + explode — no shuffle,
 * no window, no state; chunking parallelizes with the scan. Tokens are
 * materialized once per document (`w`) before the per-chunk slices read
 * them, keeping the slice lambdas O(chunk) per output row.
 */
object Chunking {

  /**
   * One output row per (document, window): `(idCol, chunk_idx, start_tok,
   * n_tok, chunk_text)`. `chunk_idx` counts from 0 per document;
   * `start_tok` is the 0-based token offset; `n_tok ≤ chunkTokens` (shorter
   * only for the final window of a document that is not stride-aligned, or
   * for a document shorter than one chunk).
   */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val base = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
    val nTok = size(col("w"))
    val nChunks = when(nTok <= chunkTokens, lit(1)).otherwise(
      ceil((nTok - chunkTokens) / lit(stride.toDouble)).cast("int") + 1)
    val start = col("chunk_idx") * stride
    base
      .select(col(idCol), col("w"), nTok.as("nt"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        start.cast("long").as("start_tok"),
        least(lit(chunkTokens), col("nt") - start).cast("long").as("n_tok"),
        array_join(slice(col("w"), start + 1, lit(chunkTokens)), " ").as("chunk_text"))
  }
}
