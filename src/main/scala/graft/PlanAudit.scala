package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      println(s"==== $name")
      println(p.linesIterator.filter(l => l.contains("Scan parquet") || l.contains("ReadSchema")
        || l.contains("Exchange") || l.contains("Join") || l.contains("PushedFilters")).mkString("\n"))
    }
    spark.stop()
  }
}
