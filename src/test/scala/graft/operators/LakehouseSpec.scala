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

  test("scd2 property: random changelogs tile [first, inf) with no gaps or overlaps") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val chg = (0 until 400).map { i =>
      (rnd.nextInt(20), i.toLong * 7 + rnd.nextInt(7), s"p$i") // unique versions
    }.distinct.toDF("k", "v", "payload")
    val rows = History.scd2(chg, Seq("k"), "v")
      .select($"k", $"valid_from", $"valid_to", $"is_current")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getBoolean(3)))
      .groupBy(_._1)
    rows.foreach { case (_, hist) =>
      val sorted = hist.sortBy(_._2)
      // seamless tiling: each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2) && !a._4)
        case _ =>
      }
      // exactly one current version: the last, open-ended
      assert(sorted.last._3.isEmpty && sorted.last._4)
      assert(sorted.count(_._4) == 1)
    }
  }

  test("scd2 plan: exactly one exchange (the window shuffle)") {
    import spark.implicits._
    val chg = (1 to 100).map(i => (i % 10, i.toLong, s"v$i")).toDF("k", "v", "p")
    val plan = History.scd2(chg, Seq("k"), "v").queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("profile plan: a single scan feeds all per-column aggregates") {
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
    val plan = Profile.profile(df, Seq(
      "o_orderkey" -> col("o_orderkey"), "o_custkey" -> col("o_custkey")))
      .queryExecution.executedPlan.toString
    // one parquet scan — multi-distinct rides Expand, not repeated reads
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("Expand"))
  }

  test("z-order layout scans fewer rows than a single-column sort on the probe dim") {
    // the layout's reason to exist: on real orders data, probing the
    // dimension the single-column sort ignores must touch fewer rows under
    // the z-order bucketing
    val day = datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long")
    val base = spark.read.parquet(s"${sf()}/orders.parquet").select(
      col("o_custkey").bitwiseAND(lit(0xFFFFL)).as("x"),
      day.bitwiseAND(lit(0xFFFFL)).as("y"))
    import org.apache.spark.sql.expressions.Window
    def rowsScanned(key: org.apache.spark.sql.Column): Long = base
      .withColumn("bkt", ntile(64).over(Window.orderBy(key)))
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("nr"), min(col("y")).as("mn"), max(col("y")).as("mx"))
      .filter(col("mn") <= 730 && col("mx") >= 365)
      .agg(sum(col("nr"))).collect()(0).getLong(0)
    val z = rowsScanned(Layout.zValue(col("x"), col("y"), 16))
    val linear = rowsScanned(col("x") * 65536L + col("y"))
    assert(z < linear / 2, s"z-order scanned $z rows vs $linear under custkey sort")
  }
}
