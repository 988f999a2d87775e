package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The engine's local-checkpoint replication policy (VERDICT r17 item 7):
  * `spark.graft.checkpoint.replicated` swaps every engine localCheckpoint
  * to MEMORY_AND_DISK_2 with identical semantics. Recompute is
  * deliberately NOT the fallback — the pinned frames embed
  * non-deterministic expressions (id assignment), so the safe behaviors
  * are "serve the pinned blocks" (replicated or not) or "fail loudly". */
class CheckpointsSpec extends SparkSpec {

  private def withConf[T](v: Option[String])(body: => T): T = {
    val key = "spark.graft.checkpoint.replicated"
    val prev = spark.conf.getOption(key)
    v match { case Some(x) => spark.conf.set(key, x); case None => spark.conf.unset(key) }
    try body
    finally prev match {
      case Some(x) => spark.conf.set(key, x); case None => spark.conf.unset(key)
    }
  }

  test("default level is single-copy MEMORY_AND_DISK") {
    withConf(None) {
      val df = spark.range(10).toDF("id")
      assert(Checkpoints.level(df) == StorageLevel.MEMORY_AND_DISK)
      val cp = Checkpoints.local(df)
      assert(cp.rdd.getStorageLevel.replication == 1)
      assert(cp.count() == 10)
    }
  }

  test("replicated=true selects MEMORY_AND_DISK_2 and keeps rows identical") {
    withConf(Some("true")) {
      val df = spark.range(10).toDF("id")
      assert(Checkpoints.level(df) == StorageLevel.MEMORY_AND_DISK_2)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val cp = Checkpoints.local(df)
      assert(cp.select(sum(col("id"))).head().getLong(0) == 45L)
      // local[*] has one block manager, so the SECOND replica cannot land,
      // but the requested level must carry the replication factor — on a
      // real cluster that is what makes a single executor loss survivable.
      // (`cp.rdd` builds a fresh wrapper RDD; the pinned level lives on the
      // INTERNAL checkpointed RDD, visible via getPersistentRDDs.)
      val pinned = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }.values
      assert(pinned.exists(_.getStorageLevel.replication == 2),
        s"levels: ${pinned.map(_.getStorageLevel).mkString(",")}")
    }
  }

  test("produce under replicated=true assigns the same ids as default") {
    import spark.implicits._
    def ids(): Map[(Int, Long), String] = {
      val wh = java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString
      val d = new graft.engine.GraftDriver(spark, wh)
      d.createTopic("t", partitions = 2)
      d.openTopic("t").producer().produce(
        Seq((9L, """{"k":9}"""), (3L, """{"k":3}"""), (7L, """{"k":7}"""),
          (2L, """{"k":2}""")).toDF("__order", "metadata")
          .withColumn("partition", (col("__order") % 2).cast("int")))
      d.openTopic("t").events().collect()
        .map(r => (r.getAs[Int]("partition"), r.getAs[Long]("event_id")) ->
          r.getAs[String]("metadata")).toMap
    }
    val base = withConf(None)(ids())
    val repl = withConf(Some("true"))(ids())
    assert(base == repl)
    assert(base.nonEmpty)
  }
}
