package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  private def chunksOf(text: String, chunk: Int, overlap: Int) = {
    import spark.implicits._
    Chunking.tokenChunks(Seq((7L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunk, overlap)
      .orderBy(col("chunk_idx"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
  }

  test("short document passes through as one whole chunk") {
    val text = "a b c"
    assert(chunksOf(text, 8, 2) === Array((0L, 0L, 3L, "a b c")))
  }

  test("windows advance by stride and share exactly `overlap` tokens") {
    // 10 tokens, chunk 4, overlap 1 → stride 3: starts 0,3,6 cover 0..9
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 4, 1)
    assert(got === Array(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10")))
  }

  test("non-aligned tail yields a shorter final window; every token covered") {
    // 11 tokens, chunk 4, overlap 0 → starts 0,4,8; final n_tok = 3
    val text = (1 to 11).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 4, 0)
    assert(got.map(_._2) === Array(0L, 4L, 8L))
    assert(got.last._3 === 3L)
    val covered = got.flatMap { case (_, s, n, _) => s until (s + n) }.toSet
    assert(covered === (0L until 11L).toSet)
  }

  test("coverage + overlap invariants hold across a parameter sweep") {
    val text = (1 to 53).map(i => s"w$i").mkString(" ")
    for (chunk <- Seq(3, 8, 16); overlap <- Seq(0, 1, chunk / 2)) {
      val got = chunksOf(text, chunk, overlap)
      val stride = chunk - overlap
      // starts are exactly 0, stride, 2*stride, ...
      assert(got.map(_._2) === got.indices.map(i => i.toLong * stride).toArray,
        s"chunk=$chunk overlap=$overlap")
      // last window starts inside the doc and reaches its end
      assert(got.last._2 < 53 && got.last._2 + got.last._3 === 53)
      // n_tok full except possibly the last
      assert(got.dropRight(1).forall(_._3 == chunk))
    }
  }

  test("chunking is a pure projection: no exchange in the plan") {
    import spark.implicits._
    val df = Chunking.tokenChunks(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
