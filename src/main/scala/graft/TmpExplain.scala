package graft
import org.apache.spark.sql.SparkSession
object TmpExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = ops.SqlSurface.run(spark, "/root/testdata/sf0.01",
      """SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
         FROM nation n, LATERAL (
           SELECT c_name, c_acctbal FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_name LIMIT 3) t
         ORDER BY n.n_name, acctbal DESC, c_name""")
    df.show(8)
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
