package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {

  test("bm25 matches a direct per-document computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana banana"),
      (3L, "cherry date elderberry fig grape"),
      (4L, "apple")
    ).toDF("doc_id", "text")
    val terms = Seq("apple", "banana")
    val out = Ranking.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Double]("score")))).toMap

    // independent re-derivation
    val lens = Map(1L -> 4.0, 2L -> 3.0, 3L -> 5.0, 4L -> 1.0)
    val avgdl = lens.values.sum / 4
    val dfs = Map("apple" -> 2.0, "banana" -> 2.0)
    val tfs = Map((1L, "apple") -> 2.0, (1L, "banana") -> 1.0,
      (2L, "banana") -> 3.0, (4L, "apple") -> 1.0)
    def contrib(d: Long, t: String): Double = {
      val idf = math.log((4 - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
      val tf = tfs((d, t))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * lens(d) / avgdl))
    }
    assert(out.keySet == Set(1L, 2L, 4L)) // doc 3 hits no term
    assert(out(1L)._1 == 2L && out(2L)._1 == 1L && out(4L)._1 == 1L)
    assert(math.abs(out(1L)._2 - (contrib(1L, "apple") + contrib(1L, "banana"))) < 1e-9)
    assert(math.abs(out(2L)._2 - contrib(2L, "banana")) < 1e-9)
    assert(math.abs(out(4L)._2 - contrib(4L, "apple")) < 1e-9)
  }

  test("bm25 ranks a term-dense short doc above a sparse long one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark " + Seq.fill(50)("filler").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(out(1L) > out(2L))
  }

  test("bm25 executes exactly one corpus scan (stats ride the reused exchange)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = Ranking.bm25(docs, "doc_id", "text", Seq("join", "spark"))
    df.collect() // materialize THIS query execution so AQE settles its final plan
    // the per-doc aggregate and the corpus-stats aggregate must share one
    // FileScan via exchange reuse — a second scan would re-tokenize the
    // corpus and break the documented single-pass shape
    // the AQE dump appends the pre-reuse "Initial Plan" — assert on the
    // final plan section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"corpus stats must reuse the per-doc exchange:\n$plan")
  }

  test("topTerms orders by count desc then token, and bounds at k") {
    import spark.implicits._
    val docs = Seq((1L, "b a b c a b"), (2L, "c a d")).toDF("doc_id", "text")
    val out = Ranking.topTerms(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a=3 b=3 c=2 d=1 → ties a/b break on token text
    assert(out.toSeq == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("rrfFuse sums per-list reciprocal ranks; missing lists contribute 0") {
    import spark.implicits._
    val listA = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val listB = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = Ranking.rrfFuse(Seq(listA, listB), kConst = 60)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def c(rank: Long) = math.round(1000000.0 / (60 + rank))
    assert(out === Array(
      (10L, 1L, c(1)),
      (20L, 2L, c(2) + c(1)), // in both lists — contributions add
      (30L, 1L, c(3)),
      (40L, 1L, c(2))))
    // the item ranked highly in BOTH lists must out-score single-list items
    val best = out.maxBy(_._3)
    assert(best._1 === 20L)
  }
}
