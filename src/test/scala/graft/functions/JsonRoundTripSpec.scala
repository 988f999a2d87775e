package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[SimplifyJsonRoundTrip]] (r17 optimization): the rewrite must be
  * value-identical to the JSON round-trip on every integral edge, must fire
  * (no JSON parse left in the optimized plan), and must refuse the unsafe
  * shapes (floating fields, narrowing casts, nested paths). */
class JsonRoundTripSpec extends SparkSpec {

  private def roundTrip(colName: String) =
    get_json_object(to_json(struct(col(colName).as("k"))), "$.k")

  test("integral round-trip collapses to the field and stays value-identical") {
    import spark.implicits._
    val vals = Seq[java.lang.Long](0L, 1L, -1L, 42L, -9007199254740993L,
      Long.MaxValue, Long.MinValue, null)
    val df = vals.toDF("v")
      .select(col("v"), roundTrip("v").cast("long").as("rt"))
    val rows = df.collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), s"mismatch: $r"))
    // and the JSON machinery is actually gone from the optimized plan of a
    // NON-FOLDABLE source (a LocalRelation would constant-fold either way —
    // range() is what proves the rule itself fired, including through the
    // alias substitution predicate pushdown performs)
    val ranged = spark.range(100).select((col("id") - 50).as("event_id"))
      .orderBy(col("event_id"))
      .select(to_json(struct(col("event_id").as("eid"))).as("metadata"))
      .filter(get_json_object(col("metadata"), "$.eid").cast("long") % 7 === 0)
    val opt = ranged.queryExecution.optimizedPlan.toString
    assert(!opt.contains("get_json_object"), s"round-trip not collapsed:\n$opt")
    assert(ranged.count() == 15) // -49..49 divisible by 7: -49,-42,…,49
  }

  test("string view of the collapsed field matches the JSON text") {
    import spark.implicits._
    val df = Seq(7L, -12L, 0L).toDF("v").select(roundTrip("v").as("s"))
    assert(df.as[String].collect().toSeq == Seq("7", "-12", "0"))
  }

  test("floating fields keep the round-trip (Jackson formatting differs from cast)") {
    // range() source keeps the plan non-foldable, so the optimized plan
    // shows whether the rule fired rather than a pre-evaluated literal
    val df = spark.range(2).select((col("id") + lit(0.5)).as("v"))
      .select(roundTrip("v").as("s"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("get_json_object"), s"double field must not collapse:\n$opt")
  }

  test("narrowing casts keep the string detour (error/null vs wrap semantics)") {
    // int → string → byte: the string path errors (ANSI) / nulls (legacy)
    // on overflow while a direct int → byte cast wraps — the rule must
    // leave the narrowing chain alone (plan-asserted)
    val df = spark.range(2).select((col("id") + lit(300)).cast("int").as("v"))
      .select(col("v").cast("string").cast("byte").as("b"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("cast(cast("), s"narrowing chain must survive:\n$opt")
  }

  test("nested paths and multi-segment paths are not rewritten") {
    import spark.implicits._
    val df = Seq(5L).toDF("v")
      .select(get_json_object(
        to_json(struct(struct(col("v").as("k")).as("o"))), "$.o.k").as("s"))
    assert(df.as[String].collect().toSeq == Seq("5"))
  }
}
