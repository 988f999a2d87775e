package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant aggregation: when the group-key cardinality is far below
 * the cluster's parallelism (or one key dominates), a single-phase
 * `groupBy(key)` funnels each key through one reducer. Salting splits each
 * key into `saltBuckets` sub-groups for a parallel partial aggregate, then
 * combines partials per key — two small shuffles instead of one skewed one.
 *
 * (AQE's skew-join splitting handles *join* skew automatically; aggregation
 * skew on low-cardinality keys is the case it does not cover.)
 */
object Skew {

  /**
   * Deterministic salt in [0, saltBuckets): a content hash over every
   * column of the row. Salts derived from `spark_partition_id()` or
   * `monotonically_increasing_id()` change when a fetch failure re-executes
   * part of the map stage — re-run tasks would route rows to different
   * shuffle partitions and silently duplicate or drop them (SPARK-23207).
   * A content hash is stable across retries by construction. Rows identical
   * in EVERY column share a salt — acceptable: salting targets hot *keys*
   * whose rows differ in payload columns; full-row duplicates are a
   * dedup problem, not a skew problem.
   */
  private def contentSalt(df: DataFrame, saltBuckets: Int,
                          saltOn: Seq[Column]): Column = {
    val src = if (saltOn.nonEmpty) saltOn else {
      // xxhash64 rejects MapType (maps are unorderable, so their hash is
      // undefined) — surface that contract here instead of as an opaque
      // analysis error from inside the salted plan. Callers passing an
      // explicit saltOn own the choice (and can hash a map via to_json).
      import org.apache.spark.sql.types._
      def hasMap(dt: DataType): Boolean = dt match {
        case _: MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
      val maps = df.schema.fields.collect { case f if hasMap(f.dataType) => f.name }
      require(maps.isEmpty,
        s"content-hash salting cannot hash map-typed columns: ${maps.mkString(", ")} " +
        "— drop or serialize them (e.g. to_json) before salting, or pass saltOn")
      df.columns.map(col).toIndexedSeq
    }
    pmod(xxhash64(src: _*), lit(saltBuckets.toLong))
  }

  /**
   * Two-phase salted aggregation for algebraic aggregates.
   *
   * @param partials per-column (partialAgg, finalCombine) pairs keyed by
   *                 output name, e.g. `"n" -> (count(lit(1)), sum)` or
   *                 `"s" -> (sum($"v"), sum)`
   * @param saltOn   columns the salt is hashed from; default (empty) hashes
   *                 EVERY column. Degenerate case to know about: a hot key
   *                 whose rows are byte-identical across the hashed columns
   *                 (count-style facts with no payload) collapses to ONE
   *                 salt bucket and the mitigation silently disappears —
   *                 pass a genuinely varying column subset (an id, a
   *                 timestamp) when the full row may not vary.
   */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
                partials: Seq[(String, (Column, Column => Column))],
                saltOn: Seq[Column] = Nil): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    require(partials.nonEmpty, "saltedAgg needs at least one aggregate")
    require(!partials.exists(_._1 == "key"),
      "output name 'key' is reserved for the group key column")
    val salted = df
      .withColumn("__salt", contentSalt(df, saltBuckets, saltOn))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head._2._1.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }: _*)
    salted
      .groupBy(col("__key"))
      .agg(partials.head._2._2(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }: _*)
      .withColumnRenamed("__key", "key")
  }

  /**
   * Salted equality join for skewed keys: the left (large, skewed) side
   * gets a salt in [0, saltBuckets); the right side is replicated once per
   * salt value; the join runs on (key, salt) — a hot key's rows spread
   * over `saltBuckets` reducers instead of funneling through one.
   *
   * The salt is invisible in the result: output = `left ⋈ right on key`,
   * EXACTLY (inner join; the salt — a deterministic content hash, see
   * [[contentSalt]] — cannot affect which pairs meet, because every right
   * row exists under every salt). Cost: right side shuffles ×saltBuckets —
   * use when the right side is too big to broadcast but ≪ left.
   *
   * (AQE's skew-join split covers sort-merge joins it can see at runtime;
   * this is the explicit form — deterministic plan, works under any join
   * strategy, and composable with pre-aggregated inputs.)
   *
   * @param saltOn salt-source columns for the LEFT side; same default and
   *               same degenerate-case caveat as [[saltedAgg]] — rows of a
   *               hot key identical across the hashed columns all take one
   *               salt and still funnel through one reducer.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int, saltOn: Seq[Column] = Nil): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val l = left.withColumn("__salt", contentSalt(left, saltBuckets, saltOn))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
