package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  test("count-min never undercounts and bounds overcount on a skewed stream") {
    // zipf-ish: key k occurs 1000/k times, k = 1..50 → N ≈ 4500
    val items = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"key$k")).toDF("k")
    val n = items.count()
    val w = 256
    val d = 4
    val sketch = Sketches.countMin(items, "k", w, d)
    val keys = (1 to 50).map(k => s"key$k").toDF("k")
    val est = Sketches.estimate(sketch, keys, "k", w, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = (1 to 50).map(k => s"key$k" -> (1000L / k)).toMap
    exact.foreach { case (key, ex) =>
      assert(est(key) >= ex, s"$key undercounted: ${est(key)} < $ex")
      assert(est(key) <= ex + 10L * n / w,
        s"$key overshot the CM bound: ${est(key)} vs $ex (+${10L * n / w})")
    }
  }

  test("sketch size is capped at d*w cells regardless of key cardinality") {
    val items = (1 to 20000).map(i => s"u$i").toDF("k")
    val sketch = Sketches.countMin(items, "k", w = 64, d = 3)
    assert(sketch.count() <= 64L * 3)
    // total mass per row equals the item count (nothing lost)
    val mass = sketch.groupBy("r").agg(sum("cnt").as("m"))
      .collect().map(r => r.getLong(1))
    assert(mass.forall(_ == 20000L))
  }

  test("merged shard sketches equal the single-pass sketch cell for cell") {
    // value-deterministic split (limit() without ordering is not)
    val all = (1 to 5000).map(i => (i, s"k${i % 97}")).toDF("i", "k")
    val left = all.filter(col("i") <= 2000).select("k")
    val right = all.filter(col("i") > 2000).select("k")
    val merged = Sketches.merge(
      Sketches.countMin(left, "k", w = 128, d = 4),
      Sketches.countMin(right, "k", w = 128, d = 4))
    val whole = Sketches.countMin(all.select("k"), "k", w = 128, d = 4)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "cell-wise merge must reproduce the single-pass sketch exactly")
  }

  test("absent keys estimate to at most the collision noise, never negative") {
    val items = Seq.fill(100)("present").toDF("k")
    val sketch = Sketches.countMin(items, "k", w = 1024, d = 4)
    val est = Sketches.estimate(sketch, Seq("absent1", "absent2").toDF("k"),
        "k", w = 1024, d = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // with one distinct present key and w=1024, a 4-row collision on the
    // same cell is (1/1024)^4-unlikely — absent keys read 0
    assert(est.values.forall(v => v == 0L || v == 100L))
    assert(est.values.count(_ == 0L) >= 1)
  }
}
