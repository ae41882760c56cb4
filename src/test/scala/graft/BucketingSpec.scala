package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{Bucketing, Tables}

/** Bucketed co-located joins: the join on the bucket key must plan with
  * no Exchange on either side and return the same rows as the plain
  * shuffle join. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    graft.core.FastLocalDir.install()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/bucketing-warehouse").getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    // runtime conf (survives a reused session from an earlier suite):
    // broadcast would bypass the bucketed-join path under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val orders = Tables(spark, sf, "orders")
    val lineitem = Tables(spark, sf, "lineitem")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4)
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }

  test("join on the bucket column is shuffle-free and matches the plain join") {
    val joined = Bucketing.table(spark, "b_orders")
      .join(Bucketing.table(spark, "b_lineitem"), "o_orderkey")
    assert(Bucketing.isShuffleFree(joined),
      s"expected no Exchange in:\n${joined.queryExecution.executedPlan}")

    val expected = Tables(spark, sf, "orders").join(
      Tables(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey").count()
    assert(joined.count() === expected)
  }

  test("groupBy on the bucket column is shuffle-free") {
    val agg = Bucketing.table(spark, "b_lineitem")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    assert(Bucketing.isShuffleFree(agg),
      s"expected no Exchange in:\n${agg.queryExecution.executedPlan}")
  }
}
