package graft
import org.apache.spark.sql.SparkSession

/** Throwaway smoke main — deleted before final commit of round. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t count=${df.count()}")
        df.printSchema()
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
