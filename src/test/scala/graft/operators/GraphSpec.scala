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
