package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)],
                 nodes: Option[Seq[Long]] = None): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b",
        nodes = nodes.map(_.toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum (multi-hop propagation)") {
    // diameter-9 path: strictly more hops than rounds-without-halving would
    // finish in if the implementation only looked one hop out per round
    val chain = (0L until 9L).map(i => i -> (i + 1))
    assert(cc(chain) == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("disjoint components keep distinct minima") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L, 21L -> 22L)
    val out = cc(edges)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star, cycles, self-loops, duplicate and reversed edges") {
    val edges = Seq(5L -> 1L, 5L -> 2L, 5L -> 3L, 3L -> 5L, 3L -> 3L,
      5L -> 1L, 1L -> 2L, 2L -> 1L)
    val out = cc(edges)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("a node whose only edge is a self-loop keeps a singleton component") {
    assert(cc(Seq(7L -> 7L, 1L -> 2L)) == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("node universe adds singleton components; edge-only nodes unaffected") {
    val out = cc(Seq(1L -> 2L), nodes = Some(Seq(1L, 2L, 7L, 8L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 8L))
  }

  test("empty edge set with a universe yields all singletons") {
    val out = cc(Seq.empty, nodes = Some(Seq(3L, 4L)))
    assert(out == Map(3L -> 3L, 4L -> 4L))
  }

  test("triangleCounts: K4 gives 3 per node, attached path contributes none") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant path 4-5-6
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq(4L -> 5L, 5L -> 6L)).toDF("a", "b")
    val out = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: reversed/duplicate edges do not double-count") {
    import spark.implicits._
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 3L).toDF("a", "b")
    val out = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("pageRank: symmetric star concentrates rank on the hub; mass conserved") {
    import spark.implicits._
    val spokes = (2L to 6L)
    val edges = (spokes.map(1L -> _) ++ spokes.map(_ -> 1L)).toDF("a", "b")
    val out = Graph.pageRank(edges, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 6)
    val hub = out(1L)
    spokes.foreach(sp => assert(hub > out(sp) * 2, s"hub $hub vs spoke ${out(sp)}"))
    // symmetric graph has no dangling nodes → total mass stays 1
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // spokes are symmetric: identical rank
    assert(spokes.map(out).distinct.size == 1)
  }

  test("pageRank: directed dangling node leaks mass, as documented") {
    import spark.implicits._
    // 1 → 2 with nothing out of 2: node 2 accumulates rank it never
    // redistributes — total mass drops below 1 (the simplified
    // formulation the scaladoc commits to) and the sink outranks the source
    val out = Graph.pageRank(Seq(1L -> 2L).toDF("a", "b"), "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 2)
    assert(out(2L) > out(1L))
    assert(out.values.sum < 1.0 - 1e-6)
  }

  test("random graphs match a union-find model (seeded, 3 shapes)") {
    val rng = new scala.util.Random(42)
    // sparse (forest-ish), medium, and dense-enough-to-collapse regimes
    for ((nodes, nEdges) <- Seq((120, 40), (200, 180), (80, 300))) {
      val edges = Seq.fill(nEdges)(
        (rng.nextInt(nodes).toLong, rng.nextInt(nodes).toLong))
      // reference model: classic union-find with path compression
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // model cluster = min node of the component
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = touched.groupBy(n => find(n.toInt))
      val model = byRoot.values.flatMap { ms =>
        val m = ms.min; ms.map(_ -> m)
      }.toMap
      assert(cc(edges) == model, s"mismatch at ($nodes, $nEdges)")
    }
  }

  test("keepBestPerCluster composes with connectedComponents: max quality wins, ties by id") {
    import spark.implicits._
    // components {1,2,3} (a chain — 1~3 never paired directly), {4,5}, {6}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 1L), (5L, 1L), (6L, 3L))
      .toDF("id", "quality")
    val clusters = Graph.connectedComponents(edges, "a", "b",
      nodes = Some(docs.select($"id")))
    val kept = graft.llm.Dedup.keepBestPerCluster(clusters, docs, "id", $"quality")
      .select($"cluster", $"id", $"csize").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // chain cluster: id 2 wins on quality though 1 is the min id;
    // {4,5}: quality tie → min id 4; singleton keeps itself
    assert(kept == Map(1L -> ((2L, 3L)), 4L -> ((4L, 2L)), 6L -> ((6L, 1L))))
  }

  test("two long chains joined at the far end merge into one component") {
    // worst-ish case for label flow: the bridge is discovered only after
    // both chains have partially collapsed
    val a = (0L until 8L).map(i => i -> (i + 1))          // 0..8
    val b = (20L until 28L).map(i => i -> (i + 1))        // 20..28
    val out = cc(a ++ b :+ (8L -> 28L))
    assert(out.values.toSet == Set(0L))
    assert(out.keySet == ((0L to 8L) ++ (20L to 28L)).toSet)
  }
}
