package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data curation.
 *
 * `rand()`-based sampling is not reproducible across runs, partition
 * layouts, or engines; curation pipelines need the opposite: re-running the
 * sample over a GROWN corpus must keep every previously-selected row
 * selected, and an auditor must be able to re-derive the exact sample in a
 * different engine. Both hold when the keep-decision is a pure function of
 * a row key: keep ⇔ `hash(key) mod B < fraction·B`.
 *
 * The hash is the first four hex nibbles of `md5(key)` — chosen (over
 * xxhash64, which DuckDB lacks) so the decision is reproducible in plain
 * SQL anywhere. One filter, no shuffle, fully codegen'd. Fractions are
 * honored in steps of 1/65536 with no modulo bias.
 */
object Sampling {

  /** Bucket resolution: the full 16-bit hash domain. Using the domain size
    * itself (not a mod by a smaller round number) keeps the bucket exactly
    * uniform — `x % 10000` over 65536 preimages would give 5536 buckets 7
    * preimages and the rest 6, a systematic ~7% relative over-sample. */
  val Buckets = 65536

  /** Deterministic per-row bucket in [0, Buckets) — exactly uniform over
    * the md5 16-bit prefix. */
  def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Keep rows with `bucket(key) < fraction·Buckets` — a repeatable
    * `fraction`-sample of the corpus. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    df.filter(bucket(col(keyCol)) < math.round(fraction * Buckets))
  }

  /**
   * Down-sample to a TARGET mixture: given per-group target shares (domain
   * mixing — "the training set should be 20% per language"), keep the
   * LARGEST corpus achievable without up-sampling any group: the binding
   * group is the one most under-represented relative to its share, total
   * T = min_g(n_g / share_g), and group g keeps share_g·T/n_g of its hash
   * buckets. Groups absent from `shares` are dropped (they have no place
   * in the target mixture). The keep decision is the same md5-bucket
   * function as every other sampler here — deterministic, engine-
   * re-derivable membership, stable under partition layout.
   *
   * Scale shape: one per-group count aggregate (map-side combined, rows =
   * |groups|), a scalar min, and the |groups|-row threshold table
   * broadcast back — the corpus itself is touched by exactly one filter
   * pass, no shuffle.
   */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
                    shares: Map[String, Double]): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(_ > 0.0),
      s"shares must be positive: $shares")
    val shareOf = element_at(typedLit(shares), col(groupCol))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .filter(shareOf.isNotNull)
      .withColumn("cap", col("n_g").cast("double") / shareOf)
    val t = counts.agg(min(col("cap")).as("t"))
    val thresholds = counts.crossJoin(broadcast(t))
      .select(col(groupCol),
        round(shareOf * col("t") / col("n_g") * Buckets).cast("long").as("__thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(bucket(col(keyCol)) < col("__thr"))
      .drop("__thr")
  }

  /**
   * Deterministic train/validation/test split: each row is assigned the
   * first split whose cumulative weight bound exceeds its bucket. A pure
   * projection (no shuffle, no RNG) — membership is stable under corpus
   * growth and re-derivable in any engine, which is exactly what dataset
   * splits must guarantee (a row can never migrate between train and test
   * when the corpus is re-snapshotted).
   */
  /**
   * Token-budget corpus selection — "take the best documents until the
   * budget is spent": rows are ordered by (`quality` descending, `idCol`
   * as the deterministic tiebreak) and kept while the INCLUSIVE running
   * token total fits `budget`. The greedy quality-first fill is the
   * standard curation step when a training run affords N tokens, not N
   * documents.
   *
   * Scale shape: the running total is [[graft.operators.Ranks
   * .withRunningTotal]]'s distributed prefix sum (range shuffle +
   * per-partition window + broadcast offsets) — never a global
   * single-task window. `budget` is a Column so a computed bound (e.g.
   * 40% of the corpus mass, cross-joined as a broadcast one-row
   * aggregate) costs no driver round-trip.
   *
   * @return the kept rows plus `cum_tokens` (the running total at and
   *         including each row)
   */
  def budgetSelect(docs: DataFrame, quality: Column, tokens: Column,
                   idCol: String, budget: Column): DataFrame =
    graft.operators.Ranks.withRunningTotal(docs, "cum_tokens", tokens,
        Seq(quality.desc, col(idCol)))
      .filter(col("cum_tokens") <= budget)

  /**
   * Leakage-safe split: like [[splitAssign]], but the hash key is each
   * row's duplicate-cluster REPRESENTATIVE, so every member of a cluster
   * lands in the SAME split — the guard against train/test contamination
   * through near-copies (a verbatim or near-duplicate of a test document
   * sitting in train defeats the held-out evaluation). `clusters` is a
   * (node, cluster) mapping — exact-hash groups or
   * [[Graph.connectedComponents]] output, both compose unchanged; rows
   * absent from the mapping are singletons and split by their own key.
   * One broadcast-or-shuffle join more than [[splitAssign]]; the
   * assignment itself stays a pure projection.
   */
  def splitAssignClustered(df: DataFrame, keyCol: String, clusters: DataFrame,
                           splits: Seq[(String, Double)]): DataFrame = {
    val cl = clusters.select(col("node").as(keyCol), col("cluster").as("__cl"))
    val withRep = df.join(cl, Seq(keyCol), "left")
      .withColumn("__rep", coalesce(col("__cl"), col(keyCol)))
    splitAssign(withRep, "__rep", splits)
      .withColumn("rep", col("__rep")).drop("__rep", "__cl")
  }

  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(w => math.round(w * Buckets))
    val b = bucket(col(keyCol))
    val assigned = splits.zip(bounds).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), bound)) => when(b < bound, name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /**
   * Weighted sampling without replacement (Efraimidis–Spirakis, IPL 2006),
   * determinized: each row draws key = −ln(u)/weight with u its md5-bucket
   * uniform (never 0 or 1: (bucket + 0.5)/65536), and the k SMALLEST keys
   * win — inclusion probability proportional to weight, reproducible across
   * runs and engines. Cross-engine determinism is scale-INVARIANT: −ln(u)
   * (range ≈ (1.5e-5, 11.8]) is quantized to an exact nano-integer — which
   * absorbs the one-ulp spread between libm `ln` implementations — and the
   * ranking key is that integer divided by the weight: identical operands,
   * one IEEE division, bit-identical doubles in every engine at ANY weight
   * magnitude (an absolute quantization of the ratio would collapse to 0
   * under large weights and silently stop being weighted). Ties (identical
   * doubles) break on the row key. Rows with non-positive weight are
   * excluded. Top-k by sort key = TakeOrderedAndProject — no global sort.
   *
   * Output: the input columns plus `key_micro`, the selection key at 1e-6
   * scale (display/audit; membership is decided by the full-precision
   * ranking above). A pre-existing `key_micro` column would be overwritten.
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val u = (bucket(col(keyCol)) + 0.5) / Buckets
    val lnuNano = round(-log(u) * 1000000000L).cast("long")
    val key = lnuNano.cast("double") / col(weightCol)
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey"), col(keyCol))
      .limit(k)
      // same 1e-6 integer convention as the query layer's Q.micros —
      // keep the rounding mode in sync with it
      .withColumn("key_micro", round(col("__wkey") / 1000.0).cast("long"))
      .drop("__wkey")
  }

  /**
   * Per-group quota sampling — source balancing: keep at most `quota` rows
   * per group (domain, language, …), chosen in deterministic hash order so
   * the kept subset is an unbiased-but-reproducible sample of each group,
   * not "whatever sorted first". One window shuffle on the group key; at
   * scale the quota bounds per-group output, and the window never
   * materializes more than a partition's run of one group.
   */
  def quotaSample(df: DataFrame, groupCol: String, keyCol: String,
                  quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucket(col(keyCol)), col(keyCol))
    df.withColumn("__qrk", row_number().over(w))
      .filter(col("__qrk") <= quota)
      .drop("__qrk")
  }

  /**
   * Temperature-weighted source mixing — the multilingual/multi-source
   * rebalancing step of LLM corpus assembly (sample sources proportionally
   * to n^alpha, so small sources are up-weighted relative to their raw
   * share as alpha → 0). Allocates a total `budget` of rows across groups
   * with target t_g = floor(budget · w_g / Σw), w_g = n_g^alpha, then keeps
   * each group's first min(t_g, n_g) rows in deterministic hash order.
   * Unfilled budget from capped groups is NOT redistributed (documented
   * contract — redistribution would make t_g data-order dependent).
   *
   * Cross-engine determinism: w_g is quantized to round(n^alpha · 1e6) —
   * for alpha = 0.5 the power is computed with `sqrt`, which IEEE requires
   * correctly rounded, so the quantized weight is bit-identical in any
   * engine; Σw and the t_g division are exact integer arithmetic. (Other
   * alphas use `pow`, which libm does NOT guarantee correctly rounded — an
   * auditor re-deriving t_g may then be one ulp off at a rounding boundary.)
   *
   * Scale shape: one count aggregate (tiny — one row per source), broadcast
   * back; one window shuffle on the group key for the hash-order rank.
   */
  def temperatureSample(df: DataFrame, groupCol: String, keyCol: String,
                        budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    import org.apache.spark.sql.expressions.Window
    val nPow: Column => Column =
      if (alpha == 0.5) sqrt(_)
      else if (alpha == 1.0) _.cast("double")
      else org.apache.spark.sql.functions.pow(_, alpha)
    val weights = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wm", round(nPow(col("__n")) * 1000000L).cast("long"))
    val total = weights.agg(sum(col("__wm")).as("__W"))
    // __wm * budget is computed in Long: __wm ≈ n^alpha·1e6, so a source of
    // ~1e12 rows with a large budget can exceed Long range, and non-ANSI
    // arithmetic would wrap silently to negative targets (= empty output).
    // budget is a driver-side Long, so the safe bound is a plain constant;
    // fail loudly per-row instead of corrupting the mix.
    val maxSafeWm = Long.MaxValue / budget
    val targets = weights.crossJoin(broadcast(total))
      // integral DIV, not double division + floor: a double quotient one ulp
      // above an integer boundary would disagree with an engine's exact //
      .select(col(groupCol),
        when(col("__wm") > maxSafeWm, raise_error(concat(
          lit("temperatureSample: quantized weight "), col("__wm"),
          lit(s" * budget $budget overflows Long; lower the budget or pre-split the source"))))
          .otherwise(expr(s"CAST((__wm * $budget) DIV __W AS BIGINT)")).as("__t"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucket(col(keyCol)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .join(broadcast(targets), groupCol)
      .filter(col("__rk") <= col("__t"))
      .drop("__rk", "__t")
  }

  /**
   * Stratified deterministic sample: per-stratum keep fractions (e.g.
   * down-sample boilerplate-heavy domains, keep rare languages whole) with
   * a default for unlisted strata. Still one filter — the per-stratum rate
   * is a map literal lookup, so there is no join and no shuffle regardless
   * of stratum cardinality in the map.
   */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, fractions: Map[String, Double],
      keyCol: String, defaultFraction: Double = 1.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions out of [0,1]: $fractions / $defaultFraction")
    val bp: Map[String, Long] =
      fractions.map { case (k, f) => k -> math.round(f * Buckets) }
    df.filter(bucket(col(keyCol)) <
      coalesce(element_at(typedLit(bp), col(stratumCol)),
        lit(math.round(defaultFraction * Buckets))))
  }

  /**
   * Deterministic corpus shuffle for reproducible training runs: each row
   * gets a `shard` in [0, shards) and a `shuffle_key` order key, both pure
   * functions of (seed, row key) — a seeded permutation any engine can
   * re-derive, stable across runs, partition layouts, and resumes (the
   * property `rand()`-shuffled training order lacks; re-running a crashed
   * epoch-0 export must produce bit-identical shards). Materializing the
   * shuffled corpus is then `repartitionByRange($"shard", $"shuffle_key")`
   * + `sortWithinPartitions` + a partitioned write — ONE range shuffle at
   * any scale; the assignment itself is a codegen'd projection with no
   * shuffle at all. Power-of-two shard counts divide the 16-bit bucket
   * domain exactly (no modulo bias — same stance as [[bucket]]).
   */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int,
                    seed: String = "42"): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val k = md5(concat_ws("|", lit(seed), col(keyCol).cast("string")))
    df.withColumn("shuffle_key", k)
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("long"),
          lit(shards.toLong)))
  }

  /**
   * Materialize the shuffled corpus as shard-partitioned parquet: ONE
   * range shuffle on (shard, shuffle_key), rows sorted by the order key
   * within every file — so a training job reading `shard=K` streams its
   * rows in the seeded permutation order with no further sort, and two
   * exports of the same corpus produce identical per-shard row sequences
   * (the resumability/auditability property the seeded permutation
   * exists for).
   */
  def writeShuffled(df: DataFrame, keyCol: String, shards: Int, path: String,
                    seed: String = "42"): Unit =
    shuffleShards(df, keyCol, shards, seed)
      .repartitionByRange(shards, col("shard"), col("shuffle_key"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
      .write.partitionBy("shard").parquet(path)
}
