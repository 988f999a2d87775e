package graft

/** Dev tool: print a registered query's formatted physical plan.
  * `runMain graft.ExplainQ <sfDir> <name>` — the explain-and-iterate loop
  * every operator goes through before it counts as done. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    SparkEntry.queries(args(1))(spark, args(0)).explain("formatted")
    spark.stop()
  }
}
