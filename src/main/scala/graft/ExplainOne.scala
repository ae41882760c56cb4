package graft
import org.apache.spark.sql.SparkSession
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name =====")
      val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      println(p.split("\n").take(40).mkString("\n"))
    }
    spark.stop()
  }
}
