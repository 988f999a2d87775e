package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Similarity
import Q._

/**
 * Similarity-search operators over `embeddings` (64-dim float vectors):
 * exact brute-force cosine top-k (query side broadcast), IVF-bucketed
 * approximate top-k (deterministic, hence oracle-checkable), and vector
 * norm/statistics kernels.
 *
 * Cross-engine exactness: all dot products are sequential double folds and
 * all similarities are published as `round(cos*1e6)` integers; per-label
 * sums aggregate those exact integers, never raw doubles.
 */
object VectorPack extends QueryPack {

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def candidatesDf(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir).filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def centroidsDf(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> { (s, dir) =>
      Similarity.bruteForceTopK(queriesDf(s, dir), candidatesDf(s, dir), k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    "q_knn_ivf" -> { (s, dir) =>
      Similarity.ivfTopK(queriesDf(s, dir), candidatesDf(s, dir),
        centroidsDf(s, dir), k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    "q_knn_ivf_indexed" -> { (s, dir) =>
      // index lifecycle: build once (cell-partitioned parquet — the layout
      // IS the index), query through the pruned read path; results must be
      // IDENTICAL to the direct q_knn_ivf, so they share one oracle
      val idx = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
      Similarity.saveIndex(candidatesDf(s, dir), centroidsDf(s, dir), idx)
      Similarity.ivfTopKIndexed(s, idx, queriesDf(s, dir), k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    "q_knn_ivf_appended" -> { (s, dir) =>
      // index MAINTENANCE lifecycle: build on a prefix of the corpus,
      // append the rest as a NAMED shard (assigned to the STORED centroids
      // — O(shard), no rebuild), replay the same shard append (must be a
      // committed no-op), query through the pruned read path. The
      // contract: results IDENTICAL to the direct q_knn_ivf over the full
      // corpus — so all three index paths (direct, built-once,
      // built+appended) share one oracle, and a non-idempotent replay
      // (duplicated candidates occupying two ranks) would fail it.
      val idx = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
      Similarity.saveIndex(candidatesDf(s, dir).filter(col("id") < 300),
        centroidsDf(s, dir), idx)
      val tail = candidatesDf(s, dir).filter(col("id") >= 300)
      Similarity.appendToIndex(s, idx, tail, shardId = "s1")
      Similarity.appendToIndex(s, idx, tail, shardId = "s1") // replay: no-op
      Similarity.ivfTopKIndexed(s, idx, queriesDf(s, dir), k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    "q_knn_index_stats" -> { (s, dir) =>
      // index HEALTH: per-cell occupancy of the persisted layout after
      // build + append — the skew/imbalance signal that schedules a
      // rebuild (a cell holding a disproportionate share of the corpus
      // degrades every probe that hits it). Metadata-scale read: one
      // groupBy over the cell partition column, committed shards only.
      val idx = java.nio.file.Files.createTempDirectory("graft-ivf-stats").toString
      Similarity.saveIndex(candidatesDf(s, dir).filter(col("id") < 300),
        centroidsDf(s, dir), idx)
      Similarity.appendToIndex(s, idx,
        candidatesDf(s, dir).filter(col("id") >= 300), shardId = "s1")
      Similarity.indexStats(s, idx).orderBy(col("cell"))
    },
    "q_knn_rebalance" -> { (s, dir) =>
      // index REBALANCE lifecycle, closing the loop on q_knn_index_stats:
      // an index built over a DEGENERATE 2-centroid quantizer (every cell
      // holds ~half the corpus — occupancy far past any share bound) is
      // rebalanced against the production centroid set; the policy check
      // reads only per-cell counts, the triggered rewrite re-assigns the
      // stored vectors O(corpus). Contract: post-rebalance results are
      // IDENTICAL to the direct q_knn_ivf (shares its oracle) — rebuild
      // preserves the corpus exactly, only the quantizer changes — and a
      // second rebalance against a now-balanced index is a no-op.
      val idx = java.nio.file.Files.createTempDirectory("graft-ivf-rebal").toString
      Similarity.saveIndex(candidatesDf(s, dir),
        centroidsDf(s, dir).filter(col("id") < 100), idx) // 2 centroids: skewed
      val rebuilt = Similarity.rebalanceIndex(s, idx, centroidsDf(s, dir),
        maxCellShareMicro = 250000L)
      val again = Similarity.rebalanceIndex(s, idx, centroidsDf(s, dir),
        maxCellShareMicro = 250000L)
      require(rebuilt && !again,
        s"rebalance policy: first=$rebuilt (want trigger), second=$again (want no-op)")
      Similarity.ivfTopKIndexed(s, idx, queriesDf(s, dir), k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    "q_dedup_embed" -> { (s, dir) =>
      // embedding-cosine near-dup: IVF-cell-blocked pairs over the whole
      // corpus, exact cosine threshold (0.40 — the fixture has no planted
      // vector dups, so this surfaces the natural high-similarity tail)
      Similarity.cellBlockedNearDuplicates(
        embeddings(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec")),
        centroidsDf(s, dir), thresholdMicro = 400000L)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    "q_dedup_embed_incremental" -> { (s, dir) =>
      // growing-corpus embedding dedup: vectors < 300 form the persisted
      // store (pre-assigned cells + norms); the new shard is vectors >= 300
      // PLUS planted near-dups — vectors 0..4 scaled by 0.5 (ids +8000000).
      // Cosine is scale-invariant, so the planted copies score 1e6 against
      // their hosts while being bit-different vectors (exact-hash dedup
      // would keep them); halving a float is exact, so both engines see
      // identical doubles. Survivors of the shard are graded.
      val emb = embeddings(s, dir)
      // persisted-store lifecycle: cells + norms assigned ONCE at store
      // build, written to parquet, read back for the dedup pass
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-vecstore").toString
      Similarity.nearestCells(
          emb.filter(col("vec_id") < 300)
            .select(col("vec_id").as("id"), col("embedding").as("vec")),
          centroidsDf(s, dir), n = 1)
        .write.mode("overwrite").parquet(storeDir)
      val store = s.read.parquet(storeDir)
      val planted = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 8000000L).as("id"),
          transform(col("embedding"), x => x * lit(0.5f)).as("vec"))
      val shard = emb.filter(col("vec_id") >= 300)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .unionByName(planted)
      val (survivors, _) = Similarity.incrementalEmbedDedup(shard, store,
        centroidsDf(s, dir), thresholdMicro = 400000L)
      survivors.select(col("id")).orderBy(col("id"))
    },
    "q_dedup_srp" -> { (s, dir) =>
      // signed-random-projection LSH (the cosine-family hash) at the
      // PRODUCTION band shape: 64 hyperplane-sign bits over integer-
      // quantized vectors, 8 bands of 8 bits (256 bucket values per band —
      // the 16/4 demo shape made 16-value bands whose candidate join
      // degenerated toward all-pairs), exact-cosine verification. Planted
      // 0.25-scaled copies of vectors 0..4 (ids +9000000) are cosine-1e6
      // near-dups whose projection sums scale by ~0.25 (quartering a float
      // is exact; only quantization rounding perturbs them), so their
      // signatures nearly always match their hosts' and banding surfaces
      // them; the oracle re-derives band values, candidates, and verdicts
      // from the same integer formulas, so recall is graded as-computed.
      val emb = embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val corpus = emb.unionByName(
        emb.filter(col("id") < 5).select((col("id") + 9000000L).as("id"),
          transform(col("vec"), x => x * lit(0.25f)).as("vec")))
      graft.llm.SrpLsh.srpPairs(corpus,
          nbits = 64, bands = 8, thresholdMicro = 900000L)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    "q_knn_recall" -> { (s, dir) =>
      // ANN quality audit: recall@3 of the IVF index against the exact
      // brute-force baseline, per query — the self-measuring metric an ANN
      // deployment needs; both engines re-derive both rankings
      val iv = Similarity.ivfTopK(queriesDf(s, dir), candidatesDf(s, dir),
          centroidsDf(s, dir), k = 3, nprobe = 2)
        .select(col("query_id").as("iq"), col("cand_id").as("hit"))
      val exact = Similarity.bruteForceTopK(queriesDf(s, dir), candidatesDf(s, dir), k = 3)
        .select(col("query_id"), col("cand_id"))
      exact.join(iv, col("query_id") === col("iq") && col("cand_id") === col("hit"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("hit")).as("n_hits"))
        .orderBy(col("query_id"))
    },
    "q_knn_vote" -> { (s, dir) =>
      // kNN label classification — the ANN layer actually USED: each query
      // vector takes the majority label of its exact top-5 cosine
      // neighbours (ties: more votes win, then the smaller label —
      // deterministic in both engines). One equality join attaches labels
      // to the k·|queries| neighbour rows (never the full corpus), one
      // bounded per-query window picks the winner.
      val knn = Similarity.bruteForceTopK(queriesDf(s, dir), candidatesDf(s, dir), k = 5)
        .select(col("query_id"), col("cand_id"))
      val labels = embeddings(s, dir)
        .select(col("vec_id").as("cand_id"), col("label"))
      val votes = knn.join(labels, "cand_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("label"))
      votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("label").cast("long").as("label"),
          col("votes"))
        .orderBy(col("query_id"))
    },
    "q_embed_norm" -> { (s, dir) =>
      embeddings(s, dir).select(col("vec_id"),
        round(Similarity.norm(col("embedding")) * 1000000).cast("long").as("norm_micro"),
        col("label"))
        .orderBy(col("vec_id"))
    },
    "q_embed_label_stats" -> { (s, dir) =>
      embeddings(s, dir)
        .select(col("label"),
          round(Similarity.norm(col("embedding")) * 1000000).cast("long").as("nm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), min(col("nm")).as("min_norm_micro"),
          max(col("nm")).as("max_norm_micro"), sum(col("nm")).as("sum_norm_micro"))
        .orderBy(col("label"))
    },
  )

  // ---- oracle SQL ---------------------------------------------------------

  /** 64-dim cosine as `round(cos*1e6)` BIGINT — a sequential double fold,
    * mirroring [[Similarity.dot]] exactly. */
  private def cosMicro(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in range(1,65)])"
    s"CAST(round((${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))) * 1000000) AS BIGINT)"
  }

  private def normMicro(a: String): String = {
    val dot = s"list_sum([CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE) for i in range(1,65)])"
    s"CAST(round(sqrt($dot) * 1000000) AS BIGINT)"
  }

  /** CTE chain `ctr, candcell, qcell, scored` reproducing `ivfTopK`'s cell
    * assignment + candidate scoring over CTEs `q`(qid, qe) / `c`(cid, ce) —
    * shared by the IVF and recall oracles so index semantics cannot drift
    * between them. */
  private def ivfCtes(nprobe: Int): String =
    s"""ctr AS (SELECT vec_id AS ctrid, embedding AS ctre FROM embeddings WHERE vec_id % 50 = 0),
       |candcell AS (
       |  SELECT cid, ce, cell FROM (
       |    SELECT cid, ce, ctrid AS cell,
       |      row_number() OVER (PARTITION BY cid
       |        ORDER BY ${cosMicro("ce", "ctre")} DESC, ctrid) AS cr
       |    FROM c, ctr) x WHERE cr <= 1),
       |qcell AS (
       |  SELECT qid, qe, cell FROM (
       |    SELECT qid, qe, ctrid AS cell,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY ${cosMicro("qe", "ctre")} DESC, ctrid) AS cr
       |    FROM q, ctr) x WHERE cr <= $nprobe),
       |scored AS (
       |  SELECT DISTINCT qid AS query_id, cid AS cand_id,
       |    ${cosMicro("qe", "ce")} AS cos_micro
       |  FROM qcell JOIN candcell USING (cell))""".stripMargin

  private lazy val ivfOracleSql =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 10),
       |${ivfCtes(nprobe = 2)}
       |SELECT query_id, rank, cand_id, cos_micro FROM (
       |  SELECT query_id, cand_id, cos_micro,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_micro DESC, cand_id) AS rank
       |  FROM scored) r
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 10),
         |pairs AS (SELECT qid, cid, ${cosMicro("qe", "ce")} AS cos_micro FROM q, c)
         |SELECT query_id, rank, cand_id, cos_micro FROM (
         |  SELECT qid AS query_id, cid AS cand_id, cos_micro,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_micro DESC, cid) AS rank
         |  FROM pairs) r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_knn_ivf" -> ivfOracleSql,
    // the indexed path must return exactly the direct path's results
    "q_knn_ivf_indexed" -> ivfOracleSql,
    // ...and so must the built-then-appended index (same corpus, same cells)
    "q_knn_ivf_appended" -> ivfOracleSql,
    // ...and the skew-triggered rebuild: rebalancing onto the production
    // centroids must land exactly where a direct build would have
    "q_knn_rebalance" -> ivfOracleSql,
    // cell occupancy re-derived from the same nearest-centroid assignment
    // over the full candidate corpus (build prefix + appended shard)
    "q_knn_index_stats" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 10),
         |ctr AS (SELECT vec_id AS ctrid, embedding AS ctre FROM embeddings WHERE vec_id % 50 = 0),
         |candcell AS (
         |  SELECT cid, cell FROM (
         |    SELECT cid, ctrid AS cell,
         |      row_number() OVER (PARTITION BY cid
         |        ORDER BY ${cosMicro("ce", "ctre")} DESC, ctrid) AS cr
         |    FROM c, ctr) x WHERE cr <= 1)
         |SELECT cell, count(*) AS n FROM candcell
         |GROUP BY cell ORDER BY cell""".stripMargin,
    "q_dedup_embed" ->
      s"""WITH ctr AS (SELECT vec_id AS ctrid, embedding AS ctre FROM embeddings WHERE vec_id % 50 = 0),
         |cells AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT v.vec_id, v.embedding, ctrid AS cell,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosMicro("v.embedding", "ctre")} DESC, ctrid) AS cr
         |    FROM embeddings v, ctr) x WHERE cr <= 1)
         |SELECT vec_a, vec_b, cos_micro FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${cosMicro("a.embedding", "b.embedding")} AS cos_micro
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id) p
         |WHERE cos_micro >= 400000 ORDER BY vec_a, vec_b""".stripMargin,
    // mirrors the cell blocking + the asymmetric drop rule; store ids
    // (< 300) are all below shard ids, so "db in the shard" covers both
    // arms of the (da < db) pair relation
    "q_dedup_embed_incremental" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 8000000, [x * 0.5 for x in embedding]::FLOAT[]
         |  FROM embeddings WHERE vec_id < 5),
         |ctr AS (SELECT vec_id AS ctrid, embedding AS ctre FROM embeddings WHERE vec_id % 50 = 0),
         |cells AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT v.vec_id, v.embedding, ctrid AS cell,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosMicro("v.embedding", "ctre")} DESC, ctrid) AS cr
         |    FROM corpus v, ctr) x WHERE cr <= 1),
         |dup AS (
         |  SELECT a.vec_id AS da, b.vec_id AS db FROM cells a
         |  JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosMicro("a.embedding", "b.embedding")} >= 400000)
         |SELECT vec_id AS id FROM corpus
         |WHERE vec_id >= 300
         |  AND vec_id NOT IN (SELECT db FROM dup WHERE db >= 300)
         |ORDER BY id""".stripMargin,
    // full SRP pipeline re-derived: integer quantization, hyperplane-sign
    // bits (same (h*64+j) multiplicative mix), 8 bands of 8 bits — each
    // band value packed independently (band i = hyperplanes [i*8, (i+1)*8),
    // first hyperplane most significant), so no value exceeds 255 and
    // DuckDB's overflow-CHECKED BIGINT arithmetic never packs a 64-bit
    // signature — shared-band candidates (DISTINCT replaces the engine's
    // in-bandCandidates dedup; the star guard never fires at fixture scale,
    // every bucket is far below maxBucket), exact-cosine verdicts
    "q_dedup_srp" -> {
      val wgt = "(((h*64 + j) * 2654435761 + 104729) % 1001 - 500)"
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 9000000, [x * 0.25 for x in embedding]::FLOAT[]
         |  FROM embeddings WHERE vec_id < 5),
         |base AS (
         |  SELECT vec_id, embedding,
         |    [CAST(round(CAST(embedding[j] AS DOUBLE) * 1000000) AS BIGINT)
         |     for j in range(1, 65)] AS q
         |  FROM corpus),
         |bands AS (
         |  SELECT vec_id, embedding, i,
         |    list_reduce(
         |      [CASE WHEN list_sum([q[j] * $wgt for j in range(1, 65)]) >= 0
         |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |       for h in range(CAST(i*8 AS BIGINT), CAST((i+1)*8 AS BIGINT))],
         |      (a, b) -> a * 2 + b) AS bv
         |  FROM base, range(0, 8) t(i)),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS va, a.embedding AS ea,
         |                  b.vec_id AS vb, b.embedding AS eb
         |  FROM bands a JOIN bands b
         |    ON a.i = b.i AND a.bv = b.bv AND a.vec_id < b.vec_id)
         |SELECT va AS vec_a, vb AS vec_b, ${cosMicro("ea", "eb")} AS cos_micro
         |FROM cand
         |WHERE ${cosMicro("ea", "eb")} >= 900000
         |ORDER BY vec_a, vec_b""".stripMargin
    },
    "q_knn_recall" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 10),
         |ex3 AS (
         |  SELECT qid AS query_id, cid AS cand_id FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY ${cosMicro("qe", "ce")} DESC, cid) AS rank
         |    FROM q, c) r WHERE rank <= 3),
         |${ivfCtes(nprobe = 2)},
         |ivf3 AS (
         |  SELECT query_id, cand_id FROM (
         |    SELECT query_id, cand_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_micro DESC, cand_id) AS rank
         |    FROM scored) r
         |  WHERE rank <= 3)
         |SELECT ex3.query_id, CAST(count(ivf3.cand_id) AS BIGINT) AS n_hits
         |FROM ex3 LEFT JOIN ivf3
         |  ON ivf3.query_id = ex3.query_id AND ivf3.cand_id = ex3.cand_id
         |GROUP BY ex3.query_id ORDER BY ex3.query_id""".stripMargin,
    // exact top-5 re-derived like q_knn_brute, labels joined, majority by
    // (votes DESC, label) — the same deterministic tie-break
    "q_knn_vote" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 10),
         |top5 AS (
         |  SELECT qid AS query_id, cid AS cand_id FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY ${cosMicro("qe", "ce")} DESC, cid) AS rank
         |    FROM q, c) r WHERE rank <= 5),
         |votes AS (
         |  SELECT query_id, e.label, count(*) AS votes
         |  FROM top5 JOIN embeddings e ON cand_id = e.vec_id
         |  GROUP BY query_id, e.label)
         |SELECT query_id, CAST(label AS BIGINT) AS label, votes FROM (
         |  SELECT query_id, label, votes, row_number() OVER (
         |    PARTITION BY query_id ORDER BY votes DESC, label) AS rn
         |  FROM votes) v
         |WHERE rn = 1 ORDER BY query_id""".stripMargin,
    "q_embed_norm" ->
      s"""SELECT vec_id, ${normMicro("embedding")} AS norm_micro, label
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_embed_label_stats" ->
      s"""SELECT label, count(*) AS n,
         | min(nm) AS min_norm_micro, max(nm) AS max_norm_micro,
         | CAST(sum(nm) AS BIGINT) AS sum_norm_micro
         |FROM (SELECT label, ${normMicro("embedding")} AS nm FROM embeddings) s
         |GROUP BY label ORDER BY label""".stripMargin,
  )
}
