package graft
import org.apache.spark.sql.SparkSession
object TmpExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Queries.q25LeadLag(spark, "/root/testdata/sf0.1")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
