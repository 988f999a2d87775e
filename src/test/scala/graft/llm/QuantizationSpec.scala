package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizationSpec extends SparkSpec {

  private val dims = 4
  private val m = 2 // two 2-dim subspaces

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  test("encode picks the nearest codeword per subspace, ties to smaller code") {
    import spark.implicits._
    // training/seed vectors (ids 0,1 → codes 0,1):
    //   seed0 = [0,0 | 10,10], seed1 = [4,4 | 0,0]
    val train = Seq(
      (0L, vec(0, 0, 10, 10)), (1L, vec(4, 4, 0, 0))
    ).toDF("id", "vec")
    val cb = Quantization.codebooks(train, dims, m, ksub = 2)
    assert(cb.count() === 4) // 2 codes × 2 subspaces

    // candidate [1,1 | 1,1]: sub0 nearer seed0's [0,0]; sub1 nearer seed1's [0,0]
    val cands = Seq((7L, vec(1, 1, 1, 1))).toDF("id", "vec")
    val codes = Quantization.encode(cands, cb, dims, m)
      .orderBy(col("sub")).collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(codes === Array((0, 0L), (1, 1L)))
  }

  test("adcTopK: a seed vector queries to ADC 0 against its own codes") {
    import spark.implicits._
    val train = Seq(
      (10L, vec(0, 0, 10, 10)), (11L, vec(4, 4, 0, 0)), (12L, vec(9, 9, 9, 9))
    ).toDF("id", "vec")
    val cb = Quantization.codebooks(train, dims, m, ksub = 3)
    val codes = Quantization.encode(train, cb, dims, m)
    val queries = Seq((0L, vec(0, 0, 10, 10))).toDF("id", "vec") // = seed 10
    val top = Quantization.adcTopK(queries, codes, cb, dims, m, k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    // candidate 10 IS the query: every subspace distance is exactly 0
    assert(top.head === ((10L, 0L)))
    // every candidate contributes m subspace integers — no dropped rows
    assert(top.length === 3)
  }

  test("ADC ranking agrees with exact ranking when vectors equal their codes") {
    import spark.implicits._
    // all candidates are seeds → quantization is lossless → ADC = exact d²
    val train = (0L until 6L).map(i =>
      (i + 10L, vec(i, 2 * i, 30 - i, i))).toDF("id", "vec")
    val cb = Quantization.codebooks(train, dims, m, ksub = 6)
    val codes = Quantization.encode(train, cb, dims, m)
    val queries = Seq((0L, vec(2.5, 5.5, 27.0, 3.0))).toDF("id", "vec")
    val adc = Quantization.adcTopK(queries, codes, cb, dims, m, k = 6)
      .orderBy(col("rank")).collect().map(_.getLong(2))
    val exact = train.select(col("id"),
        (Similarity.dot(col("vec"), col("vec")) +
          lit(2.5 * 2.5 + 5.5 * 5.5 + 27.0 * 27.0 + 3.0 * 3.0) -
          lit(2.0) * Similarity.dot(col("vec"),
            lit(Array(2.5, 5.5, 27.0, 3.0)))).as("d2"))
      .orderBy(col("d2"), col("id")).collect().map(_.getLong(0))
    assert(adc === exact)
  }
}
