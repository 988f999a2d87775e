package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  private def pointsDf(pts: Seq[(Long, Seq[Double])]) =
    pts.map { case (id, v) => (id, v.toArray) }.toDF("id", "vec")

  test("assignNearest picks the closest centroid, ties to the lowest cid") {
    val points = pointsDf(Seq(
      1L -> Seq(0.0, 0.0),   // at centroid 10
      2L -> Seq(6.0, 0.0),   // closer to centroid 11 at (8,0)
      3L -> Seq(4.0, 0.0)))  // exactly between → lower cid wins
    val centroids = Seq((10L, Array(0.0, 0.0)), (11L, Array(8.0, 0.0)))
      .toDF("cid", "cvec")
    val out = Clustering.assignNearest(points, centroids)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Long]("d2_micro")))).toMap
    assert(out(1L) == ((10L, 0L)))
    assert(out(2L) == ((11L, 4000000L)))
    assert(out(3L) == ((10L, 16000000L)))
  }

  test("lloyd separates two blobs and converges to their means") {
    // blob A around (0,0), blob B around (10,10); the deterministic seeds
    // (two lowest ids) land one per blob, so Lloyd reaches the global
    // optimum and the assignment must match blob membership exactly
    val blobA = Seq(1L -> Seq(0.0, 0.1), 3L -> Seq(0.1, 0.0),
      4L -> Seq(-0.1, 0.0), 5L -> Seq(0.0, -0.1))
    val blobB = Seq(2L -> Seq(10.0, 10.1), 6L -> Seq(10.1, 10.0),
      7L -> Seq(9.9, 10.0), 8L -> Seq(10.0, 9.9))
    val out = Clustering.lloyd(pointsDf(blobA ++ blobB), k = 2, iters = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(Set(1L, 3L, 4L, 5L).map(out) == Set(1L))
    assert(Set(2L, 6L, 7L, 8L).map(out) == Set(2L))
  }

  test("assignNearest broadcasts the centroids and partial-aggregates the scores") {
    val points = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .selectExpr("vec_id AS id", "embedding AS vec")
    val centroids = points.filter(col("id") < 8)
      .selectExpr("id AS cid", "vec AS cvec")
    val plan = Clustering.assignNearest(points, centroids)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroids must broadcast:\n$plan")
    // the n*k scored rows must collapse via map-side partial aggregation
    // (partial_min before the exchange), not a ranking window shuffle
    assert(plan.contains("partial_min"), s"expected partial aggregation:\n$plan")
    assert(!plan.contains("Window"), s"no window shuffle expected:\n$plan")
  }

  test("lloyd keeps empty clusters alive on their previous centroid") {
    // k=3 over two tight blobs: one centroid ends up owning nothing and
    // must survive the update without NaNs or dropped rows
    val pts = pointsDf(Seq(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.1, 0.0), 3L -> Seq(0.0, 0.1),
      9L -> Seq(50.0, 50.0), 10L -> Seq(50.1, 50.0)))
    val out = Clustering.lloyd(pts, k = 3, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(out.size == 5)
    assert(out(9L) == out(10L))
    assert(out(1L) != out(9L))
  }
}
