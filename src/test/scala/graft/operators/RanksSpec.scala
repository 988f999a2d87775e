package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranks]] must be bit-identical to the global window functions it
  * replaces — and must not itself contain the single-partition window
  * (empty partitionSpec) it exists to remove. */
class RanksSpec extends SparkSpec {

  private def globalWindows(df: DataFrame): Seq[LogicalWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }

  test("withGlobalRank equals row_number over a global window (unique keys)") {
    import spark.implicits._
    // keys deliberately NOT in insertion order, spread over values that
    // collide under hash partitioning
    val df = (1 to 997).map(i => ((i * 7919) % 1000003, s"p$i")).toDF("k", "p")
    val expected = df
      .withColumn("r", row_number().over(Window.orderBy($"k")).cast("long"))
      .select($"k", $"r").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val got = Ranks.withGlobalRank(df, "r", Seq($"k"), numPartitions = 7)
      .select($"k", $"r").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("withNtile equals ntile over a global window (incl. N % tiles != 0 and N < tiles)") {
    import spark.implicits._
    for ((n, tiles) <- Seq((1000, 10), (997, 10), (25, 10), (7, 10), (3, 8), (64, 64))) {
      val df = (1 to n).map(i => (i * 31 % 65537, i)).toDF("k", "i") // k unique for these n
      val expected = df
        .withColumn("t", ntile(tiles).over(Window.orderBy($"k", $"i")).cast("long"))
        .select($"k", $"t").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val got = Ranks.withNtile(df, "t", tiles, Seq($"k", $"i"), numPartitions = 5)
        .select($"k", $"t").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(got == expected, s"n=$n tiles=$tiles")
    }
  }

  test("withNtile with tied keys: per-key tile multisets match the window function") {
    import spark.implicits._
    // every key duplicated 5x — ties may permute WITHIN a tie group, but the
    // multiset of tiles each key receives is determined by the rank range
    val df = (1 to 500).map(i => (i % 100, i)).toDF("k", "i")
    def tilesPerKey(d: DataFrame): Map[Int, Seq[Long]] =
      d.select($"k", $"t").collect()
        .groupBy(_.getInt(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq.sorted }
    val expected = tilesPerKey(df.withColumn("t",
      ntile(7).over(Window.orderBy($"k")).cast("long")))
    val got = tilesPerKey(Ranks.withNtile(df, "t", 7, Seq($"k"), numPartitions = 6))
    assert(got == expected)
  }

  test("Ranks plans contain no single-partition (global) window") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i * 13 % 101, i)).toDF("k", "i")
    assert(globalWindows(Ranks.withGlobalRank(df, "r", Seq($"k"))).isEmpty)
    assert(globalWindows(Ranks.withNtile(df, "t", 10, Seq($"k"))).isEmpty)
    assert(globalWindows(
      Ranks.withRunningTotal(df, "c", $"i", Seq($"k"))).isEmpty)
  }

  test("withRunningTotal equals the global running-sum window across sizes and weights") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for ((n, parts) <- Seq((1, 4), (37, 3), (500, 7), (997, 5))) {
      // unique sort keys in scrambled order; weights include zeros
      val df = (1 to n).map(i => ((i * 7919) % 1000003, rnd.nextInt(50).toLong))
        .toDF("k", "w")
      val expected = df.withColumn("c", sum($"w").over(
          Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"k", $"c").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val got = Ranks.withRunningTotal(df, "c", $"w", Seq($"k"), numPartitions = parts)
        .select($"k", $"c").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(got == expected, s"n=$n parts=$parts")
    }
  }

  test("randomized: rank and ntile match the window functions across sizes/ties/partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 6) {
      val size = 1 + rnd.nextInt(2000)
      val keySpace = 1 + rnd.nextInt(size) // guarantees ties for small spaces
      val tiles = 1 + rnd.nextInt(16)
      val parts = 1 + rnd.nextInt(9)
      val df = (0 until size).map(i => (rnd.nextInt(keySpace), i)).toDF("k", "i")
      // (k, i) is unique → both rank and ntile are fully determined
      val wcols = Seq($"k", $"i")
      val expR = df.withColumn("r", row_number().over(Window.orderBy(wcols: _*)).cast("long"))
        .select($"i", $"r").as[(Int, Long)].collect().toSet
      val gotR = Ranks.withGlobalRank(df, "r", wcols, numPartitions = parts)
        .select($"i", $"r").as[(Int, Long)].collect().toSet
      assert(gotR == expR, s"rank trial=$trial size=$size parts=$parts")
      val expT = df.withColumn("t", ntile(tiles).over(Window.orderBy(wcols: _*)).cast("long"))
        .select($"i", $"t").as[(Int, Long)].collect().toSet
      val gotT = Ranks.withNtile(df, "t", tiles, wcols, numPartitions = parts)
        .select($"i", $"t").as[(Int, Long)].collect().toSet
      assert(gotT == expT, s"ntile trial=$trial size=$size tiles=$tiles parts=$parts")
    }
  }

  test("q_window_ntile and q_zorder plans contain no single-partition window") {
    for (name <- Seq("q_window_ntile", "q_zorder")) {
      val df = graft.SparkEntry.queries(name)(spark, sf())
      assert(globalWindows(df).isEmpty, s"$name has a global WindowExec")
    }
  }
}
