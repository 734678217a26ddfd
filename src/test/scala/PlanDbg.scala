import org.apache.spark.sql.SparkSession
object PlanDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      println(s"==== $q ====")
      println(df.queryExecution.executedPlan.toString)
      graft.core.CacheBay.drain()
    }
    spark.stop()
  }
}
