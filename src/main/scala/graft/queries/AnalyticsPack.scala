package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Clustering, Dedup, Ranking, Sampling}
import graft.operators.{Graph, Ranks, Sketches}
import Q._

/**
 * Corpus-analytics and statistics surface: duplicate-cluster connected
 * components (the transitive-closure step after LSH pair generation), BM25
 * keyword ranking, k-means assignment, top-terms vocabulary, pivot,
 * histogram, moment statistics, z-score outliers, and the approx-quantile
 * sketch contract.
 *
 * Oracle notes follow the house rules (exact integers, explicit unique-key
 * ORDER BY both sides). The connected-components oracle is a DuckDB
 * recursive CTE — a genuinely independent derivation (sequential transitive
 * closure) of what the Spark side computes by distributed label propagation.
 */
object AnalyticsPack extends QueryPack {

  /** BM25 demo query terms (fixed bag; mixed document frequencies). */
  private val Bm25Terms = Seq("join", "spark", "vector", "slow")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters" -> { (s, dir) =>
      import s.implicits._
      // Duplicate GROUPS, not pairs: corpus = documents ∪ planted exact
      // copies (+1e6) ∪ planted near-copies (+2e6, three appended tokens);
      // edges = exact-hash pairs ∪ verified LSH near-dup pairs (≥0.9) ∪ a
      // synthetic diameter-9 chain over ids 100..149 (multi-hop propagation
      // is exercised for real — path halving needs ~5 rounds there, and the
      // oracle's recursive closure must agree on every component).
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val planted = docs.filter($"doc_id" < 25)
      val corpus = docs
        .union(planted.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
        .union(planted.select(($"doc_id" + 2000000).as("doc_id"),
          concat($"text", lit(" zq zq zq")).as("text")))
      val exact = corpus
        .select($"doc_id",
          min($"doc_id").over(Window.partitionBy(md5($"text"))).as("keep"))
        .filter($"doc_id" =!= $"keep")
        .select($"keep".as("a"), $"doc_id".as("b"))
      // LSH recall stance mirrors q_dedup_minhash: the oracle derives edges
      // from exhaustive all-pairs Jaccard, so banded-LSH recall itself is
      // being graded (planted pairs sit at j ∈ {1.0} ∪ [0.9, 0.97]; miss
      // probability ≤ 2e-4 per 0.90-pair, frozen corpus verified green)
      val near = Dedup.nearDuplicates(corpus, "doc_id", "text",
          shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.9)
        .select($"doc_a".as("a"), $"doc_b".as("b"))
      // chain edges only between ids that BOTH exist in the corpus — the
      // oracle's recursive closure would otherwise propagate to phantom
      // endpoints the Spark universe join drops
      val chain = corpus
        .filter($"doc_id".between(100, 148) && $"doc_id" % 10 =!= 9)
        .select($"doc_id".as("a"), ($"doc_id" + 1).as("b"))
        .join(corpus.select($"doc_id".as("b")), Seq("b"), "left_semi")
      Graph.connectedComponents(exact.union(near).union(chain), "a", "b",
          nodes = Some(corpus.select($"doc_id")))
        .select($"node".as("doc_id"), $"cluster",
          count(lit(1)).over(Window.partitionBy($"cluster")).as("csize"))
        .orderBy($"doc_id")
    },
    "q_dedup_keep_best" -> { (s, dir) =>
      import s.implicits._
      // cluster-REPRESENTATIVE selection policy: corpus = documents ∪
      // verbatim re-ingested copies (+1e6) carrying a HIGHER completeness
      // score. The kept member of each duplicate cluster must be the
      // best-quality copy (max quality, ties → min id) — every planted
      // copy must beat its lower-id host, so a min-id keep (whichever
      // copy ingested first) fails all 25 planted rows. Clusters here are
      // exact-hash groups (one window); the operator composes unchanged
      // with connectedComponents output when pairs are fuzzy
      // (GraphSpec covers that composition; q_dedup_clusters grades CC).
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val corpus = docs.withColumn("quality", lit(1L))
        .unionByName(docs.filter($"doc_id" < 25)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
          .withColumn("quality", lit(2L)))
      val clusters = corpus.select($"doc_id".as("node"),
        min($"doc_id").over(Window.partitionBy(md5($"text"))).as("cluster"))
      Dedup.keepBestPerCluster(clusters, corpus, "doc_id", $"quality")
        .select($"doc_id", $"cluster", $"csize", $"quality")
        .orderBy($"cluster")
    },
    "q_graph_triangles" -> { (s, dir) =>
      import s.implicits._
      // part co-occurrence graph (parts bought together in one order);
      // per-part triangle participation — community density in the
      // co-purchase structure. Node set restricted to every third part:
      // wedge volume grows with degree², and the unfiltered sf0.1 graph
      // carries ~150M wedges — the filter keeps the demo O(5M) while the
      // operator itself stays fully general
      val li = t(s, dir, "lineitem")
        .filter($"l_partkey" % 3 === 0)
        .select($"l_orderkey", $"l_partkey")
      val pairs = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      Graph.triangleCounts(pairs, "pa", "pb")
        .orderBy($"node")
    },
    "q_graph_pagerank" -> { (s, dir) =>
      import s.implicits._
      // 3 fixed PageRank iterations over the symmetric co-purchase graph
      // (micros: engine-side summation-order noise is ~1e-15, far below);
      // same every-third-part node set as q_graph_triangles — the demo
      // graph derivation (a lineitem self-join) would otherwise dwarf the
      // operator being measured
      val li = t(s, dir, "lineitem")
        .filter($"l_partkey" % 3 === 0)
        .select($"l_orderkey", $"l_partkey")
      val pairs = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") =!= col("y.l_partkey"))
        .select(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      Graph.pageRank(pairs, "pa", "pb", iters = 3)
        .select($"node", micros($"r").as("pr_micro"))
        .orderBy($"node")
    },
    "q_events_funnel" -> { (s, dir) =>
      import s.implicits._
      // ordered-funnel analysis: first view, first click strictly after
      // it, first purchase strictly after that — the staged conditional
      // mins a funnel needs (a flat per-type min would accept out-of-order
      // journeys); only completing users are emitted
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type", expr("ts div 1000").as("tus"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"tus").as("vt"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"tus" > $"vt")
        .groupBy($"user_id").agg(min($"vt").as("vt"), min($"tus").as("ct"))
      ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"tus" > $"ct")
        .groupBy($"user_id")
        .agg(min($"vt").as("vt"), min($"ct").as("ct"), min($"tus").as("pt"))
        .orderBy($"user_id")
    },
    "q_events_retention" -> { (s, dir) =>
      import s.implicits._
      // cohort retention matrix: users grouped by first-active day, counted
      // again at day offsets 0/1/7/14. Single scan: the cohort day is a
      // min-window over the deduplicated activity rows, not a second
      // aggregate branch; rows are (user, day)-distinct so a plain count
      // suffices for the per-cell user count
      t(s, dir, "events")
        .select($"user_id", expr("ts div 86400000000000").as("day"))
        .distinct()
        .withColumn("cohort", min($"day").over(Window.partitionBy($"user_id")))
        .withColumn("k", $"day" - $"cohort")
        .filter($"k".isin(0L, 1L, 7L, 14L))
        .groupBy($"cohort", $"k")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort", $"k")
    },
    "q_text_bm25" -> { (s, dir) =>
      import s.implicits._
      Ranking.bm25(t(s, dir, "documents"), "doc_id", "text",
          Bm25Terms, k1 = Bm25K1, b = Bm25B)
        .select($"doc_id", $"n_terms", micros($"score").as("score_micro"))
        .orderBy($"doc_id")
    },
    "q_text_top_terms" -> { (s, dir) =>
      import s.implicits._
      Ranking.topTerms(t(s, dir, "documents"), "text", k = 25)
        .orderBy($"n".desc, $"tok")
    },
    "q_kmeans_assign" -> { (s, dir) =>
      import s.implicits._
      // k-means assignment kernel (the per-round hot path of Clustering
      // .lloyd, whose full iteration loop is spec-tested): deterministic
      // seed = the 8 lowest-id vectors, squared-L2, ties → lowest centroid
      val emb = t(s, dir, "embeddings")
      val points = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
      val centroids = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
      Clustering.assignNearest(points, centroids)
        .select($"id".as("vec_id"), $"cluster", $"d2_micro")
        .orderBy($"vec_id")
    },
    "q_pivot" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
        .orderBy($"o_orderpriority")
    },
    "q_agg_histogram" -> { (s, dir) =>
      import s.implicits._
      // equi-width $1000 price histogram — binning in exact integer cents
      // (double division at bucket boundaries is not engine-portable)
      t(s, dir, "lineitem")
        .withColumn("cents", cents($"l_extendedprice"))
        .groupBy(expr("cents div 100000").as("bucket"))
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_c"))
        .orderBy($"bucket")
    },
    "q_agg_stats" -> { (s, dir) =>
      import s.implicits._
      // second-moment statistics: correlation, covariance, stddev, variance
      // (micros over small-magnitude columns — quantity ≤ 50, discount ≤
      // 0.1 — so cross-engine merge-order fp noise is far below rounding).
      // Degenerate groups (single row / zero variance) are NaN in Spark but
      // NULL in DuckDB — map NaN to NULL so the contract holds on any data.
      def nanNull(c: org.apache.spark.sql.Column) =
        when(isnan(c), lit(null)).otherwise(c)
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          micros(nanNull(corr($"l_quantity", $"l_extendedprice"))).as("corr_qp_micro"),
          micros(nanNull(covar_samp($"l_quantity", $"l_discount"))).as("cov_qd_micro"),
          micros(nanNull(stddev_samp($"l_quantity"))).as("sd_q_micro"),
          micros(nanNull(var_samp($"l_discount"))).as("var_d_micro"))
        .orderBy($"l_returnflag")
    },
    "q_events_outliers" -> { (s, dir) =>
      import s.implicits._
      // z-score anomaly flagging per event type; the grouped moments come
      // from an unbounded window (one pass, no second join). The threshold
      // compares the ROUNDED integer, not the raw double — row membership
      // must not hinge on sub-ulp engine noise at |z| = 2.5 (same parity
      // discipline as the cents-binned histogram)
      val w = Window.partitionBy($"event_type")
      t(s, dir, "events")
        .withColumn("z", ($"value" - avg($"value").over(w)) / stddev_samp($"value").over(w))
        .withColumn("z_micro", micros($"z"))
        .filter(abs($"z_micro") > lit(2500000L))
        .select($"event_id", $"event_type", $"z_micro")
        .orderBy($"event_id")
    },
    "q_dedup_lines" -> { (s, dir) =>
      import s.implicits._
      // unit-level exact dedup (boilerplate removal): units are 10-token
      // chunks (the fixture corpus has no sentence delimiters); verbatim
      // copies of docs < 25 planted under high ids must come back with ALL
      // units flagged as already-seen (n_kept = 0)
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val corpus = docs.union(
        docs.filter($"doc_id" < 25).select($"doc_id" + 1000000, $"text"))
      Dedup.unitDedupCounts(corpus, "doc_id", Dedup.tokenChunks($"text", 10))
        .orderBy($"doc_id")
    },
    "q_events_moving" -> { (s, dir) =>
      import s.implicits._
      // bounded window FRAME (rows between 9 preceding and current) — the
      // frame sum is exact in cents, so sliding-window implementation
      // differences (recompute vs segment tree) cannot produce fp drift
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-9, Window.currentRow)
      t(s, dir, "events")
        .withColumn("vc", cents($"value"))
        .select($"event_id", $"user_id",
          sum($"vc").over(w).as("mov_sum_c"),
          count(lit(1)).over(w).as("mov_n"))
        .orderBy($"event_id")
    },
    "q_window_ntile" -> { (s, dir) =>
      import s.implicits._
      // decile assignment over a unique ordering, aggregated per decile.
      // NOT ntile().over(Window.orderBy(...)): that is a single-partition
      // global window — the whole table through one task at any scale.
      // Ranks.withNtile reproduces exact ntile semantics from a range
      // shuffle + per-partition rank + broadcast offsets; the ordering key
      // (o_totalprice, o_orderkey) is unique, so the result is identical.
      Ranks.withNtile(t(s, dir, "orders"), "decile", 10,
          Seq($"o_totalprice", $"o_orderkey"))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n"), cents(sum($"o_totalprice")).as("sum_c"))
        .orderBy($"decile")
    },
    "q_rank_global" -> { (s, dir) =>
      import s.implicits._
      // exact global row_number over a unique ordering, graded row-by-row —
      // Ranks.withGlobalRank's range-shuffle + broadcast-offset plan
      // directly against the oracle's single ROW_NUMBER() window
      Ranks.withGlobalRank(t(s, dir, "orders"), "rnk",
          Seq($"o_totalprice", $"o_orderkey"))
        .select($"o_orderkey", $"rnk")
        .orderBy($"o_orderkey")
    },
    "q_text_edit_distance" -> { (s, dir) =>
      import s.implicits._
      // fuzzy matching: Levenshtein over consecutive doc pairs, inputs
      // bounded to 80 chars so the O(len²) kernel stays constant-cost per
      // pair at any corpus size
      val docs = t(s, dir, "documents")
        .select($"doc_id", substring($"text", 1, 80).as("t80"))
      docs.as("a")
        .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.t80"), col("b.t80")).cast("long").as("dist"))
        .orderBy($"doc_a")
    },
    "q_sample_split" -> { (s, dir) =>
      import s.implicits._
      // deterministic 80/10/10 split: a pure hash projection, so membership
      // is engine-independent and stable under corpus growth; the oracle
      // re-derives EXACT membership (sum of ids, not just counts)
      Sampling.splitAssign(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("sum_ids"))
        .orderBy($"split")
    },
    "q_budget_select" -> { (s, dir) =>
      import s.implicits._
      // token-budget curation: best docs first (TTR desc, id tiebreak)
      // until 40% of the corpus token mass is spent. The running total is
      // the DISTRIBUTED prefix sum (range shuffle + broadcast offsets) —
      // no single-task window; the budget bound is a broadcast one-row
      // aggregate, no driver scalar. The oracle replays the greedy fill
      // with a plain window cumsum.
      val scored = t(s, dir, "documents").select($"doc_id",
        graft.llm.TextFunctions.typeTokenRatioMicro($"text").as("ttr"),
        graft.llm.TextFunctions.tokenCount($"text").as("n_tokens"))
      val bound = scored.agg(
        expr("(sum(n_tokens) * 2) DIV 5").as("budget"))
      Sampling.budgetSelect(scored.crossJoin(broadcast(bound)),
          $"ttr", $"n_tokens", "doc_id", $"budget")
        .select($"doc_id", $"ttr", $"n_tokens", $"cum_tokens")
        .orderBy($"doc_id")
    },
    "q_sample_split_clustered" -> { (s, dir) =>
      import s.implicits._
      // leakage-safe split: planted verbatim copies (+1e6) of docs < 50
      // must land in the SAME split as their host — a plain per-id split
      // would scatter ~20% of the pairs across the train/test boundary.
      // Clusters here are exact-hash groups (min id per md5(text)); the
      // operator composes unchanged with connectedComponents output.
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val corpus = docs.unionByName(docs.filter($"doc_id" < 50)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
      val clusters = corpus.select($"doc_id".as("node"),
        min($"doc_id").over(Window.partitionBy(md5($"text"))).as("cluster"))
      Sampling.splitAssignClustered(corpus, "doc_id", clusters,
          Seq("train" -> 0.8, "test" -> 0.2))
        .select($"doc_id", $"rep", $"split")
        .orderBy($"doc_id")
    },
    "q_shuffle_shards" -> { (s, dir) =>
      import s.implicits._
      // reproducible training-order shuffle: a seeded hash permutation
      // assigns every doc a shard and a within-shard position; the oracle
      // re-derives shard MEMBERSHIP (count + id checksum) and ORDER (the
      // first/last doc of every shard under the order key) independently
      Sampling.shuffleShards(t(s, dir, "documents"), "doc_id", shards = 8)
        .groupBy($"shard")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("sum_ids"),
          min_by($"doc_id", $"shuffle_key").as("first_doc"),
          max_by($"doc_id", $"shuffle_key").as("last_doc"))
        .orderBy($"shard")
    },
    "q_sample_quota" -> { (s, dir) =>
      import s.implicits._
      // source balancing: at most 30 docs per language, chosen in
      // deterministic hash order (reproducible unbiased subset per group)
      Sampling.quotaSample(t(s, dir, "documents"), "lang", "doc_id", quota = 30)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    "q_sample_weighted" -> { (s, dir) =>
      import s.implicits._
      // importance sampling: 50 docs chosen with probability ∝ length —
      // the oracle re-derives EXACT membership from the same hash keys
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars", k = 50)
        .select($"doc_id", $"key_micro", $"n_chars")
        .orderBy($"key_micro", $"doc_id")
    },
    "q_sketch_freq" -> { (s, dir) =>
      import s.implicits._
      // count-min frequency sketch, graded as a contract (like the HLL
      // row): rows are the EXACT top-10 tokens with exact counts; the
      // boolean asserts the sketch estimate respects the CM guarantees
      // (never undercounts; overcount ≤ 10·N/w holds with prob ~1-1e-5,
      // frozen corpus verified green)
      val w = 2048
      val d = 5
      val toks = t(s, dir, "documents")
        .select(explode(graft.llm.TextFunctions.tokens($"text")).as("tok"))
      val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
      val top = exact.orderBy($"exact_n".desc, $"tok").limit(10)
      val sketch = Sketches.countMin(toks, "tok", w, d)
      // N from the per-token counts — same exchange as `top`, no third scan
      val total = exact.agg(sum($"exact_n").as("total"))
      Sketches.estimate(sketch, top, "tok", w, d)
        .join(top, "tok")
        .crossJoin(broadcast(total))
        .select($"tok", $"exact_n",
          ($"est" >= $"exact_n" &&
            $"est" <= $"exact_n" + ceil($"total" * 10.0 / w)).as("within_bound"))
        .orderBy($"exact_n".desc, $"tok")
    },
    "q_agg_approx_quantile" -> { (s, dir) =>
      import s.implicits._
      // sketch contract, like q_agg_approx_distinct: the oracle states the
      // exact median (1e4 scale — integral, see q_agg_percentile) plus a
      // Spark-computed boolean that the approx sketch landed within 1%
      // exact median via exactGrouped (r18, §4/§5 — bit-identical to
      // `percentile`, no per-group histogram buffer); the approx sketch
      // keeps its aggregate (it IS the operator under test)
      val li = t(s, dir, "lineitem")
      li.groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("approx_med"))
        .join(broadcast(graft.operators.Quantiles.exactGrouped(
          li, "l_returnflag", "l_extendedprice", Seq("exact_med" -> 0.5))),
          Seq("l_returnflag"))
        .select($"l_returnflag",
          round($"exact_med" * 10000).cast("long").as("exact_med_tc"),
          (abs($"approx_med" - $"exact_med") <= $"exact_med" * 0.01).as("within_1pct"))
        .orderBy($"l_returnflag")
    },
  )

  // ---- oracle SQL ---------------------------------------------------------

  private val W = TextPack.W

  override def oracles: Map[String, String] = Map(
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25
         |  UNION ALL
         |  SELECT doc_id + 2000000, text || ' zq zq zq' FROM documents WHERE doc_id < 25),
         |${TextPack.jaccardCtes("corpus")},
         |nd AS (SELECT da AS a, db AS b FROM inter
         |       JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
         |       WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.9),
         |ex AS (SELECT keep AS a, doc_id AS b FROM (
         |         SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
         |         FROM corpus) x
         |       WHERE doc_id != keep),
         |ch AS (SELECT ca.doc_id AS a, cb.doc_id AS b
         |       FROM corpus ca JOIN corpus cb ON cb.doc_id = ca.doc_id + 1
         |       WHERE ca.doc_id BETWEEN 100 AND 148 AND ca.doc_id % 10 != 9),
         |edges AS (SELECT a, b FROM nd UNION SELECT a, b FROM ex UNION SELECT a, b FROM ch),
         |sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
         |reach AS (SELECT doc_id AS node, doc_id AS r FROM corpus
         |          UNION
         |          SELECT s.b AS node, reach.r AS r FROM reach JOIN sym s ON s.a = reach.node)
         |SELECT node AS doc_id, cluster,
         |  CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS csize
         |FROM (SELECT node, min(r) AS cluster FROM reach GROUP BY node) c
         |ORDER BY doc_id""".stripMargin,
    "q_dedup_keep_best" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, 1 AS quality FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, 2 FROM documents WHERE doc_id < 25),
        |cl AS (SELECT doc_id, quality,
        |         min(doc_id) OVER (PARTITION BY md5(text)) AS cluster
        |       FROM corpus)
        |SELECT doc_id, cluster, csize, CAST(quality AS BIGINT) AS quality FROM (
        |  SELECT doc_id, cluster, quality,
        |    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS csize,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY quality DESC, doc_id) AS rk
        |  FROM cl) x WHERE rk = 1 ORDER BY cluster""".stripMargin,
    "q_graph_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
        |                  greatest(x.l_partkey, y.l_partkey) AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  WHERE x.l_partkey % 3 = 0 AND y.l_partkey % 3 = 0),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |m AS (SELECT x AS node FROM tri UNION ALL
        |      SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
        |FROM m GROUP BY node ORDER BY node""".stripMargin,
    "q_graph_pagerank" -> {
      // 3 unrolled iterations of the same fixed-round recurrence
      def iter(prev: String, out: String) =
        s"""c_$out AS (SELECT e.b AS node, sum($prev.r / deg.od) AS s
           |       FROM e JOIN deg ON deg.a = e.a JOIN $prev ON $prev.node = e.a
           |       GROUP BY e.b),
           |$out AS (SELECT nd.node,
           |         CAST(0.15 AS DOUBLE) / g.n + CAST(0.85 AS DOUBLE) * coalesce(c_$out.s, 0) AS r
           |       FROM nd CROSS JOIN g LEFT JOIN c_$out ON c_$out.node = nd.node)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
         |  FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey != y.l_partkey
         |  WHERE x.l_partkey % 3 = 0 AND y.l_partkey % 3 = 0),
         |nd AS (SELECT DISTINCT a AS node FROM (SELECT a FROM e UNION ALL SELECT b FROM e) u(a)),
         |g AS (SELECT count(*) AS n FROM nd),
         |deg AS (SELECT a, count(*) AS od FROM e GROUP BY a),
         |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / g.n AS r FROM nd CROSS JOIN g),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, CAST(round(r * 1000000) AS BIGINT) AS pr_micro
         |FROM r3 ORDER BY node""".stripMargin
    },
    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT cohort, day - cohort AS k, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |WHERE day - cohort IN (0, 1, 7, 14)
        |GROUP BY cohort, k ORDER BY cohort, k""".stripMargin,
    "q_events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, min(tus) AS vt FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT ev.user_id, min(v.vt) AS vt, min(ev.tus) AS ct
        |      FROM ev JOIN v ON v.user_id = ev.user_id
        |      WHERE ev.event_type = 'click' AND ev.tus > v.vt
        |      GROUP BY ev.user_id),
        |p AS (SELECT ev.user_id, min(c.vt) AS vt, min(c.ct) AS ct, min(ev.tus) AS pt
        |      FROM ev JOIN c ON c.user_id = ev.user_id
        |      WHERE ev.event_type = 'purchase' AND ev.tus > c.ct
        |      GROUP BY ev.user_id)
        |SELECT user_id, vt, ct, pt FROM p ORDER BY user_id""".stripMargin,
    "q_text_bm25" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH dw AS (SELECT doc_id, $W AS w FROM documents),
         |dl AS (SELECT doc_id, len(w) AS dl FROM dw),
         |g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, tok, count(*) AS tf
         |       FROM (SELECT doc_id, unnest(w) AS tok FROM dw) x
         |       WHERE tok IN ($termList) GROUP BY 1, 2),
         |idf AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(round(sum(
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |    * (tf * ${Bm25K1 + 1.0}) / (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl))
         |  ) * 1000000) AS BIGINT) AS score_micro
         |FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), g
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_text_top_terms" ->
      s"""SELECT tok, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT unnest($W) AS tok FROM documents) x
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 25""".stripMargin,
    "q_kmeans_assign" -> {
      def dot(x: String, y: String) =
        s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in range(1,65)])"
      val d2 = s"${dot("e.embedding", "e.embedding")} + ${dot("c.embedding", "c.embedding")}" +
        s" - 2.0 * ${dot("e.embedding", "c.embedding")}"
      s"""WITH scored AS (
         |  SELECT e.vec_id, c.vec_id AS cid,
         |    CAST(round(($d2) * 1000000) AS BIGINT) AS d2_micro
         |  FROM embeddings e, embeddings c WHERE c.vec_id < 8)
         |SELECT vec_id, cid AS cluster, d2_micro FROM (
         |  SELECT vec_id, cid, d2_micro,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d2_micro, cid) AS rk
         |  FROM scored) r
         |WHERE rk = 1 ORDER BY vec_id""".stripMargin
    },
    "q_pivot" ->
      """SELECT o_orderpriority,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_histogram" ->
      """SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 100000 AS bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | CAST(round(corr(l_quantity, l_extendedprice) * 1000000) AS BIGINT) AS corr_qp_micro,
        | CAST(round(covar_samp(l_quantity, l_discount) * 1000000) AS BIGINT) AS cov_qd_micro,
        | CAST(round(stddev_samp(l_quantity) * 1000000) AS BIGINT) AS sd_q_micro,
        | CAST(round(var_samp(l_discount) * 1000000) AS BIGINT) AS var_d_micro
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_events_outliers" ->
      """SELECT event_id, event_type, z_micro
        |FROM (SELECT event_id, event_type,
        |        CAST(round((value - avg(value) OVER (PARTITION BY event_type))
        |          / stddev_samp(value) OVER (PARTITION BY event_type) * 1000000) AS BIGINT) AS z_micro
        |      FROM events) s
        |WHERE abs(z_micro) > 2500000 ORDER BY event_id""".stripMargin,
    "q_dedup_lines" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25),
         |dw AS (SELECT doc_id, $W AS w FROM corpus),
         |ch AS (SELECT doc_id,
         |         [array_to_string(w[i:i+9], ' ') for i in range(1, len(w)+1, 10)] AS units
         |       FROM dw),
         |u AS (SELECT doc_id, generate_subscripts(units, 1) - 1 AS pos,
         |             unnest(units) AS unit FROM ch),
         |uf AS (SELECT doc_id, pos, unit,
         |         row_number() OVER (PARTITION BY unit ORDER BY doc_id, pos) AS rk
         |       FROM u WHERE length(trim(unit)) > 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_units,
         |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM uf GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_events_moving" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_c,
        | CAST(count(*) OVER w AS BIGINT) AS mov_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_window_ntile" ->
      """SELECT decile, CAST(count(*) AS BIGINT) AS n,
        | CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_c
        |FROM (SELECT o_totalprice,
        |        CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
        |      FROM orders) d
        |GROUP BY decile ORDER BY decile""".stripMargin,
    "q_rank_global" ->
      """SELECT o_orderkey,
        | CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rnk
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_text_edit_distance" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS BIGINT) AS dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,
    "q_sample_split" -> {
      // same cumulative bounds the Spark side derives: 0.8/0.9/1.0 → 52429/58982
      s"""WITH d AS (SELECT doc_id, ${TextPack.bucketSql("doc_id")} AS bucket FROM documents)
         |SELECT CASE WHEN bucket < 52429 THEN 'train'
         |            WHEN bucket < 58982 THEN 'val' ELSE 'test' END AS split,
         | CAST(count(*) AS BIGINT) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM d GROUP BY split ORDER BY split""".stripMargin
    },
    // greedy fill replayed with a plain window cumsum over the same
    // (ttr DESC, doc_id) order and the same integer budget bound
    "q_budget_select" ->
      s"""WITH d AS (SELECT doc_id, ${TextPack.ttrSql} AS ttr,
         |                  len(${TextPack.W}) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, ttr, n_tokens,
         |        sum(n_tokens) OVER (ORDER BY ttr DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |      FROM d)
         |SELECT doc_id, ttr, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= (SELECT (sum(n_tokens) * 2) // 5 FROM d)
         |ORDER BY doc_id""".stripMargin,
    // split re-derived on the cluster REPRESENTATIVE (min id per exact-hash
    // group), same 0.8 cumulative bound as q_sample_split's train bucket
    "q_sample_split_clustered" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
         |r AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
         |      FROM corpus)
         |SELECT doc_id, rep,
         |  CASE WHEN ${TextPack.bucketSql("rep")} < 52429
         |       THEN 'train' ELSE 'test' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_shuffle_shards" -> {
      // seeded key "42|<doc_id>" — same string both engines; shard = the
      // 16-bit md5 bucket mod 8 (power of two: exact, unbiased)
      val key = "concat('42', '|', CAST(doc_id AS VARCHAR))"
      s"""WITH d AS (SELECT doc_id, md5($key) AS k,
         |  ${TextPack.bucketSql(key)} % 8 AS shard FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         | min_by(doc_id, k) AS first_doc, max_by(doc_id, k) AS last_doc
         |FROM d GROUP BY shard ORDER BY shard""".stripMargin
    },
    "q_sample_quota" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${TextPack.bucketSql("doc_id")}, doc_id) AS rk
         |  FROM documents) r
         |WHERE rk <= 30 ORDER BY doc_id""".stripMargin,
    "q_sample_weighted" ->
      s"""SELECT doc_id, CAST(round(wkey / 1000.0) AS BIGINT) AS key_micro, n_chars
         |FROM (
         |  SELECT doc_id, n_chars, wkey FROM (
         |    SELECT doc_id, n_chars,
         |      CAST(CAST(round(-ln((${TextPack.bucketSql("doc_id")} + 0.5) / 65536.0)
         |        * 1000000000) AS BIGINT) AS DOUBLE) / n_chars AS wkey
         |    FROM documents WHERE n_chars > 0) x
         |  ORDER BY wkey, doc_id LIMIT 50) s
         |ORDER BY key_micro, doc_id""".stripMargin,
    "q_sketch_freq" ->
      s"""SELECT tok, CAST(count(*) AS BIGINT) AS exact_n, true AS within_bound
         |FROM (SELECT unnest($W) AS tok FROM documents) x
         |GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 10""".stripMargin,
    "q_agg_approx_quantile" ->
      """SELECT l_returnflag,
        | CAST(round(quantile_cont(l_extendedprice, 0.5) * 10000) AS BIGINT) AS exact_med_tc,
        | true AS within_1pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
