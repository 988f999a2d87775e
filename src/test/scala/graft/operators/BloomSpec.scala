package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {

  private val m = 63 * 8 // 504 bits
  private val k = 3

  test("no false negatives: every build key passes its own filter") {
    import spark.implicits._
    val keys = (0L until 100L).toDF("key")
    val bloom = Bloom.build(keys, "key", m, k)
    val pass = keys.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom_words"), col("key"), m, k))
      .count()
    assert(pass === 100L)
  }

  test("false positives exist but are bounded; result is deterministic") {
    import spark.implicits._
    val keys = (0L until 100L).toDF("key")
    val bloom = Bloom.build(keys, "key", m, k)
    val probes = (1000L until 3000L).toDF("key")
    val fp1 = probes.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom_words"), col("key"), m, k))
      .count()
    val fp2 = probes.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom_words"), col("key"), m, k))
      .count()
    assert(fp1 === fp2) // same filter, same probes → same false positives
    // 100 keys * 3 hashes in 504 bits → fill ≈ 45%, fp ≈ 0.45^3 ≈ 9%;
    // allow a wide band — the point is "prunes most, misses none"
    assert(fp1 > 0 && fp1 < 600, s"fp=$fp1 of 2000")
  }

  test("word array has numBits/63 words and untouched words are zero") {
    import spark.implicits._
    val bloom = Bloom.build(Seq(1L).toDF("key"), "key", m, k).collect()(0)
    val words = bloom.getSeq[Long](0)
    assert(words.length === m / 63)
    // one key, 3 hashes → at most 3 words non-zero
    assert(words.count(_ != 0L) <= 3)
    assert(words.count(_ != 0L) >= 1)
  }
}
