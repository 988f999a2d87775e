package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {

  test("applyChangelog: latest version wins, deletes drop, inserts land") {
    import spark.implicits._
    val snapshot = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
    ).toDF("k", "name", "v")
    val changes = Seq(
      // k=1: update then delete (delete is newest) → gone
      (1L, "a1", 11L, 5L, "U"),
      (1L, "a2", 12L, 9L, "D"),
      // k=2: two updates → version 8 wins
      (2L, "b1", 21L, 3L, "U"),
      (2L, "b2", 22L, 8L, "U"),
      // k=5: brand-new insert
      (5L, "e", 50L, 2L, "U"),
      // k=6: insert then delete → never appears
      (6L, "f", 60L, 1L, "U"),
      (6L, "f", 61L, 4L, "D")
    ).toDF("k", "name", "v", "version", "op")

    val out = Merge.applyChangelog(snapshot, changes, Seq("k"), "version", "op")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    assert(out === Array(
      (2L, "b2", 22L), // newest update
      (3L, "c", 30L),  // untouched snapshot row
      (4L, "d", 40L),  // untouched snapshot row
      (5L, "e", 50L))) // fresh insert
  }

  test("applyChangelog: delete older than a later upsert does not win") {
    import spark.implicits._
    val snapshot = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq((1L, 0L, 1L, "D"), (1L, 99L, 2L, "U"))
      .toDF("k", "v", "version", "op")
    val out = Merge.applyChangelog(snapshot, changes, Seq("k"), "version", "op")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1L, 99L)))
  }

  test("applyChangelog plans exactly one exchange (latest-wins window)") {
    import spark.implicits._
    val snapshot = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq((1L, 11L, 1L, "U")).toDF("k", "v", "version", "op")
    val plan = Merge.applyChangelog(snapshot, changes, Seq("k"), "version", "op")
      .queryExecution.executedPlan.toString
    // one hash-partitioning exchange for the window; the union itself is free
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
