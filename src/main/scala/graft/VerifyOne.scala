package graft
import org.apache.spark.sql.SparkSession
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, dir).write.mode("overwrite")
      .parquet(s"/tmp/verify_one/$name.parquet")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      val resolved =
        graft.operators.IndexStore.resolveArtifactTokens(sql, dir)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/verify_one/$name.sql"),
        resolved.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
