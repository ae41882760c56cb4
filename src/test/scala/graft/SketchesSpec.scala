package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Sketches
import graft.sources.Tables

/** Sketch statistics must land within their documented error bounds of
  * the exact answers. */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    graft.core.FastLocalDir.install()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("HLL distinct and approx percentiles track the exact values") {
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val sk = Sketches.profile(li, Nil, "l_extendedprice").collect()(0)
    val exact = li.agg(
      countDistinct(col("l_extendedprice")).as("d"),
      expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").as("ps"))
      .collect()(0)
    val d = exact.getLong(0).toDouble
    assert(math.abs(sk.getLong(1) - d) / d < 0.10,
      s"HLL ${sk.getLong(1)} vs exact $d")
    val approxPs = sk.getSeq[Double](2)
    val exactPs = exact.getSeq[Double](1)
    approxPs.zip(exactPs).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e")
    }
    // sketches merge: the grouped profile's partials union to the global
    val grouped = Sketches.profile(li, Seq("l_returnflag"), "l_extendedprice")
    assert(grouped.count() === 3)
  }
}
