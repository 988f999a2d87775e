package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PerplexitySpec extends SparkSpec {

  test("unigramScore matches the hand-computed add-one model") {
    import spark.implicits._
    // reference: N=4 tokens {a:2, b:1, c:1}, V=3 → denom = 7
    val ref = Seq((100L, "a a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "a b"),   // in-vocab: nll = (−ln(3/7) − ln(2/7)) / 2
      (1L, "z z")    // all OOV:  nll = −ln(1/7)
    ).toDF("doc_id", "text")
    val out = Perplexity.unigramScore(docs, ref, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d0 = math.round((-math.log(3.0 / 7) - math.log(2.0 / 7)) / 2 * 1e6)
    val d1 = math.round(-math.log(1.0 / 7) * 1e6)
    assert(out === Array((0L, 2L, 0L, d0), (1L, 2L, 2L, d1)))
  }

  test("out-of-domain text scores strictly higher than in-domain text") {
    import spark.implicits._
    val ref = (0L until 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (100L, "the quick brown fox"),
      (101L, "der schnelle braune fuchs")
    ).toDF("doc_id", "text")
    val out = Perplexity.unigramScore(docs, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(101L) > out(100L))
  }
}
