package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components — the clustering step a dedup pipeline
 * needs after candidate-pair generation: LSH/simhash emit near-duplicate
 * PAIRS, but "keep one document per duplicate group" requires the transitive
 * closure of those pairs (A~B, B~C ⇒ {A,B,C} is one group even when A~C was
 * never emitted).
 *
 * Reference behavior: mofka has no graph operator (dedup is the north-star
 * extension surface); the algorithm is the standard min-label propagation
 * with path halving (cf. Kiveris et al., "Connected Components in MapReduce
 * and Beyond", SoCC'14 — the two-phase star operations there; path halving
 * gives the same O(log d) round bound for the monotone-min variant used
 * here).
 *
 * Scale shape (100 TB): every round is two key-equality shuffles (one join
 * edges⋈labels on src, one min-aggregate on node) plus one self-join of the
 * label table for the pointer jump — no cross join, no driver-side data.
 * Labels only ever DECREASE toward the component minimum, so the pointer
 * jump L(v) ← min(L(v), L(L(v))) is safe (every label value is itself a
 * node id of the same component) and halves label-chain depth each round:
 * convergence in O(log diameter) rounds rather than O(diameter). Each round
 * is `localCheckpoint`ed so the plan stays O(1) deep instead of growing with
 * the iteration count (lineage blowup is the classic iterative-DataFrame
 * trap). The per-round convergence check is one cheap anti-join count.
 */
object Graph {

  /** Release the executor storage behind an eagerly `localCheckpoint`ed
    * frame. `Dataset.unpersist` only clears CacheManager entries — a
    * checkpoint's backing RDD is persisted at the RDD level and would
    * otherwise sit in memory/disk until the ContextCleaner gets to it;
    * an iterative operator holding one copy per round cannot wait. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false): Unit
      case _ => ()
    }

  /**
   * Connected components of the undirected graph given by `edges`.
   *
   * @param edges  two-column edge list (direction irrelevant; self-loops and
   *               duplicates tolerated)
   * @param src    source id column (castable to long)
   * @param dst    destination id column
   * @param nodes  optional single-column node universe. When given, the
   *               OUTPUT IS EXACTLY THIS SET: universe nodes with no edge
   *               become singleton components, and edge endpoints absent
   *               from the universe are dropped from the result (their
   *               labels still propagated through them during the rounds).
   *               Pass the full id set when every endpoint must appear.
   * @param maxIter safety bound on rounds; with path halving a graph needs
   *               ~log2(diameter)+2 rounds, so the default covers any
   *               diameter up to ~2^20
   * @return (node, cluster) where cluster = the minimum node id reachable
   */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          nodes: Option[DataFrame] = None,
                          maxIter: Int = 25): DataFrame = {
    // materialize the edge list once: it feeds both the symmetric closure
    // and the initial label table, and upstream edge producers (LSH, exact
    // hashing) are far too expensive to execute twice
    val e = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .transform(graft.Checkpoints.local(_))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(graft.Checkpoints.local(_))

    // label table from the PRE-filter endpoints: a node whose only edge is a
    // self-loop still owns a singleton component
    var labels = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .withColumn("cluster", col("node"))
      .transform(graft.Checkpoints.local(_))
    freeCheckpoint(e) // sym and labels are materialized; e's storage can go

    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // propagate: every node offers its label to its neighbors; the node's
      // own row rides along tagged, so the SAME aggregate also yields the
      // previous label — convergence detection costs no extra join
      val offered = sym.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("cluster"), lit(false).as("own"))
      val prop = offered
        .union(labels.withColumn("own", lit(true)))
        .groupBy("node")
        .agg(min("cluster").as("cluster"),
          max(when(col("own"), col("cluster"))).as("prev"))
      // path halving: follow the label one hop (labels are node ids, so
      // L(L(v)) is defined whenever L(v) carries a label of its own).
      // prop appears on both sides; its shuffle is planned once (exchange
      // reuse), so the round stays a single job up to the checkpoint.
      val hop = prop.select(col("node").as("cluster"), col("cluster").as("hopped"))
      val next = prop.join(hop, Seq("cluster"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("hopped"), col("cluster"))).as("cluster"),
          col("prev"))
        .transform(graft.Checkpoints.local(_))

      converged = next.filter(col("cluster") =!= col("prev")).isEmpty
      freeCheckpoint(labels) // next is materialized; last round's copy can go
      labels = next.drop("prev")
      round += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds")

    freeCheckpoint(sym)
    nodes match {
      case None => labels
      case Some(n) =>
        val universe = n.select(col(n.columns.head).cast("long").as("node"))
        universe.join(labels, Seq("node"), "left")
          .select(col("node"), coalesce(col("cluster"), col("node")).as("cluster"))
    }
  }

  /**
   * Per-node triangle participation counts of the undirected graph (nodes
   * in no triangle are absent). Classic two-join scheme: edges oriented
   * low→high id so each triangle (a<b<c) forms exactly one wedge a→b→c,
   * closed by one semi-join probe back into the edge set — no triple
   * counting, no cross join. Wedge volume is Σ deg²; for skew-heavy graphs
   * the standard refinement is orienting by (degree, id) instead of id,
   * which bounds every wedge fan by the arboricity — worth switching to if
   * a hub node dominates (id orientation keeps the oracle SQL mirrorable).
   */
  def triangleCounts(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges
      .select(least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .transform(graft.Checkpoints.local(_))
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tri = wedges.join(e,
      col("x") === col("a") && col("z") === col("b"), "left_semi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /**
   * PageRank for a FIXED number of iterations (deterministic, hence
   * cross-engine checkable — convergence-threshold variants stop at
   * engine-dependent fp noise). Dangling nodes (no out-edges) contribute
   * no mass (the simplified formulation); feed a symmetric edge list for
   * undirected graphs and the case never arises. Each round is one join
   * edges⋈ranks plus one aggregate — O(E) shuffled per round — with ranks
   * checkpointed so plan depth stays constant.
   */
  def pageRank(edges: DataFrame, src: String, dst: String, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .distinct()
      .transform(graft.Checkpoints.local(_))
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
      .transform(graft.Checkpoints.local(_))
    val n = nodes.count()
    // out-degree is static — attach it to the edge list ONCE instead of
    // re-joining it every round; per round only the small rank table moves
    val eDeg = e.join(e.groupBy(col("a")).agg(count(lit(1)).as("od")), "a")
      .select(col("a"), col("b"), col("od"))
      .transform(graft.Checkpoints.local(_))
    freeCheckpoint(e)
    // the initial ranks get their OWN checkpoint: freeCheckpoint walks the
    // plan's LogicalRDDs, and a plan still referencing `nodes` would free
    // the (lineage-truncated, hence unrecomputable) node table out from
    // under the remaining rounds
    var ranks = nodes.withColumn("r", lit(1.0 / n)).transform(graft.Checkpoints.local(_))
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), (col("r") / col("od")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
        .transform(graft.Checkpoints.local(_))
      freeCheckpoint(ranks)
      ranks = next
    }
    freeCheckpoint(eDeg)
    freeCheckpoint(nodes)
    ranks
  }
}
