package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * `_file` metadata column (`SupportsMetadataColumns`): chunk-file lineage
 * per event with zero per-row cost — the reader emits it as a per-file
 * constant, like the directory-derived `partition` column. Hidden unless
 * referenced (star-expansion must NOT include it), prunable like any
 * column, and live through both the format("graft") path and SQL.
 */
class MetadataColumnSpec extends SparkSpec {

  private def mkTopic(): (GraftDriver, String) = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-filecol").toString)
    d.createTopic("t", partitions = 2)
    val rows = (0 until 40).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    d.openTopic("t").producer(chunkMaxRecords = 8).produce(rows)
    (d, d.warehouse)
  }

  private def load(w: String) =
    spark.read.format("graft").option("warehouse", w).option("topic", "t").load()

  test("_file is hidden from star-expansion but selectable") {
    val (_, w) = mkTopic()
    assert(load(w).columns.toSeq == Seq("partition", "event_id", "metadata", "data"))
    val withFile = load(w).select(col("partition"), col("event_id"), col("_file"))
    assert(withFile.columns.toSeq == Seq("partition", "event_id", "_file"))
  }

  test("_file values are the real chunk files, constant per 8-id block") {
    val (_, w) = mkTopic()
    val rows = load(w).select(col("partition"), col("event_id"), col("_file"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 40)
    // every surfaced path exists and lives under its partition directory
    rows.foreach { case (p, _, f) =>
      assert(f.contains(s"partition=$p"), s"file $f not under partition=$p")
      assert(new java.io.File(new java.net.URI(f)).isFile, s"missing $f")
    }
    // chunk rotation at 8: one distinct file per (partition, id/8) block
    val byBlock = rows.groupBy { case (p, id, _) => (p, id / 8) }
    byBlock.foreach { case (block, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"block $block spans files")
      // 20 ids per partition rolled at 8 → 8, 8, then a 4-row tail chunk
      assert(rs.length == (if (block._2 == 2L) 4 else 8))
    }
    assert(byBlock.keySet.map(_._2) == Set(0L, 1L, 2L))
    // distinct files = 3 chunks × 2 partitions
    assert(rows.map(_._3).distinct.length == 6)
  }

  test("_file works through SQL and respects pushed filters") {
    val (d, w) = mkTopic()
    val cat = "filecolcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    val n = spark.sql(
      s"SELECT count(DISTINCT _file) AS nf FROM $cat.t WHERE event_id < 8")
      .collect().head.getLong(0)
    // ids [0,8) of each partition live in exactly one chunk file
    assert(n == 2, s"expected one file per partition for the first id block, got $n")
  }
}
