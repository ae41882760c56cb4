package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.IncrementalAgg
import graft.sources.Tables

/** The maintained-aggregate contract: merging any batching of deltas
  * reproduces the full recompute exactly (counts/min/max bit-equal, sums
  * to float tolerance). */
class IncrementalAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    graft.core.FastLocalDir.install()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("three-way delta merge equals the one-pass state") {
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val keys = Seq("l_returnflag")
    def part(r: Int) = li.filter(col("l_orderkey") % 3 === r)
    val merged = IncrementalAgg.merge(
      IncrementalAgg.merge(
        IncrementalAgg.state(part(0), keys, "l_quantity"),
        IncrementalAgg.state(part(1), keys, "l_quantity"), keys),
      IncrementalAgg.state(part(2), keys, "l_quantity"), keys)
      .orderBy("l_returnflag").collect()
    val full = IncrementalAgg.state(li, keys, "l_quantity")
      .orderBy("l_returnflag").collect()
    assert(merged.length === full.length)
    merged.zip(full).foreach { case (m, f) =>
      assert(m.getString(0) === f.getString(0))
      assert(m.getLong(1) === f.getLong(1))                       // n
      assert(math.abs(m.getDouble(2) - f.getDouble(2)) < 1e-6)    // sum
      assert(m.getDouble(3) === f.getDouble(3))                   // min
      assert(m.getDouble(4) === f.getDouble(4))                   // max
    }
  }
}
