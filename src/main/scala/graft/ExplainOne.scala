package graft
import org.apache.spark.sql.SparkSession

/** scratch plan inspector: print registered queries' formatted plans.
  * Accepts a comma-separated name list; each plan is fenced by
  * `==== PLAN <name>` markers so a capture script can split them. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"==== PLAN $name")
      try SparkEntry.queries(name)(spark, dir).explain("formatted")
      catch { case e: Throwable =>
        println(s"(explain failed: ${e.getMessage})")
      }
      println(s"==== END $name")
    }
    spark.stop()
  }
}
