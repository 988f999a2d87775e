package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter join pruning: build a compact bit-set over the (small) build
 * side's join keys, broadcast it, and pre-filter the (huge) probe side
 * BEFORE its shuffle — the classic runtime-filter trick for cutting a
 * 100 TB shuffle down to the rows that can possibly match. False positives
 * only (never a miss), rate set by bits-per-key and hash count.
 *
 * Determinism/portability: the hash family is the 32-bit prefix of
 * `md5(j || ':' || key)` (engine-independent — same construction as the
 * sampling operators; xxhash64 deliberately avoided, DuckDB lacks it), and
 * words hold 63 bits so no shift ever reaches a long's sign bit in any
 * engine. The filter an oracle rebuilds from the same keys is therefore
 * bit-identical — false positives and all.
 */
object Bloom {

  /** Bits per word: 63 keeps `1L << (p mod 63)` positive everywhere. */
  val WordBits = 63

  /** Hash j of a key: first 8 md5 nibbles (32 bits) of "j:key", mod m.
    * (`private[graft]`: [[graft.engine.BloomIndex]] builds per-file filters
    * with the same family, and its driver-side planner re-derives these
    * positions in JVM code — BloomIndexSpec locks the two in step.) */
  private[graft] def position(key: Column, j: Int, numBits: Int): Column =
    pmod(conv(substring(md5(concat(lit(j.toString), lit(":"),
      key.cast("string"))), 1, 8), 16, 10).cast("long"), lit(numBits.toLong))

  private[graft] def wordOf(p: Column): Column = (p / WordBits).cast("long")

  private[graft] def maskOf(p: Column): Column =
    call_function("shiftleft", lit(1L), pmod(p, lit(WordBits.toLong)).cast("int"))

  /**
   * Build the filter over `df`'s `keyCol`: a ONE-ROW DataFrame with
   * `bloom_words: array<long>` (`numBits / 63` words) — broadcast it and
   * probe with [[mightContain]].
   *
   * Shape: explode k positions per key, bit_or per word (map-side
   * combined), densify against the word range, assemble the array in a
   * final single-row aggregate — the only single-point step touches
   * `numBits/63` rows, not the build relation.
   */
  def build(df: DataFrame, keyCol: String, numBits: Int,
            numHashes: Int): DataFrame = {
    require(numBits > 0 && numBits % WordBits == 0,
      s"numBits must be a positive multiple of $WordBits: $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")
    val nWords = numBits / WordBits
    val positions = df.select(explode(array(
      (0 until numHashes).map(j => position(col(keyCol), j, numBits)): _*)).as("p"))
    val words = positions
      .select(wordOf(col("p")).as("word"), maskOf(col("p")).as("m"))
      .groupBy(col("word")).agg(expr("bit_or(m)").as("bits"))
    df.sparkSession.range(nWords).select(col("id").as("word"))
      .join(words, Seq("word"), "left")
      .select(col("word"), coalesce(col("bits"), lit(0L)).as("bits"))
      .groupBy()
      .agg(collect_list(struct(col("word"), col("bits"))).as("wb"))
      .select(expr("transform(array_sort(wb), x -> x.bits)").as("bloom_words"))
  }

  /** Membership test: true iff every hash's bit is set. `bloomWords` is the
    * `bloom_words` column of [[build]]'s result (cross-joined/broadcast). */
  def mightContain(bloomWords: Column, key: Column, numBits: Int,
                   numHashes: Int): Column =
    (0 until numHashes).map { j =>
      val p = position(key, j, numBits)
      element_at(bloomWords, (wordOf(p) + 1).cast("int"))
        .bitwiseAND(maskOf(p)) =!= 0
    }.reduce(_ && _)
}
