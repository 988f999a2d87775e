package graft
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    SparkEntry.queries(args(1))(spark, args(0)).explain("formatted")
    spark.stop()
  }
}
