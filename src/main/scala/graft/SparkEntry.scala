package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a query here (and, when the
  * semantics are SQL-expressible, a DuckDB oracle) — this is the round's
  * correctness channel (`CORRECTNESS_r{N}.json`).
  */
object SparkEntry {

  /** All registered query packs. */
  private val packs: Seq[QueryPack] =
    Seq(Relational, EventPack, EnginePack, TextPack, VectorPack, AdvancedPack,
      AnalyticsPack, CurationPack, LakehousePack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    queries("q_join_revenue")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size, "duplicate query names across packs")
    // Every session that reaches a query needs the UTC time zone conf and
    // graft's SQL function registrations; wrap so externally-built sessions
    // (the driver's) are configured too. (events.ts itself is normalized to
    // long epoch-nanos at the read boundary, Q.t.)
    all.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(GraftSession.configure(s), dir))
    }.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracles).toMap
}
