package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LakehouseSpec extends SparkSpec {

  test("scd2: intervals tile each key's history; only the newest is current") {
    import spark.implicits._
    val chg = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 15L, "c"), (2, 5L, "x"))
      .toDF("k", "v", "payload")
    val out = History.scd2(chg, Seq("k"), "v")
      .select($"k", $"valid_from", $"valid_to", $"is_current", $"payload")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3), r.getString(4)))
      .toSet
    assert(out == Set(
      (1, 10L, Some(15L), false, "a"),
      (1, 15L, Some(20L), false, "c"),
      (1, 20L, None, true, "b"),
      (2, 5L, None, true, "x")))
  }

  test("profile: null, distinct, and min/max accounting per field") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, null), (2L, "y"), (null, "x"))
      .toDF("num", "s")
    val out = Profile.profile(df, Seq("num" -> col("num"), "s" -> col("s")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out("num") == ((4L, 1L, 2L, "1", "2")))
    assert(out("s") == ((4L, 1L, 2L, "x", "y")))
  }

  test("zValue interleaves bits (a odd positions, b even)") {
    import spark.implicits._
    val out = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    // (3, 5): a=011 -> bits 1,3; b=101 -> bits 0,4  => 2+8+1+16 = 27
    assert(out == Seq(2L, 1L, 27L, (1L << 32) - 1))
  }

  test("zValue ignores bits above the configured width") {
    import spark.implicits._
    val out = Seq((1L + (1L << 20), 0L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 16).as("z"))
      .as[Long].collect()
    assert(out.head == 2L)
  }
}
