// scratch timing main (not committed)
package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val spark = GraftSession.getOrCreate()
    spark.range(100000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[timeq] $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
