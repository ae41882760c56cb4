package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.AsOfJoin

/** As-of semantics on crafted data: ties take the equal-time right row,
  * unmatched lefts drop (inner) or carry null (outer). */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    graft.core.FastLocalDir.install()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("latest right row at-or-before each left time, per key") {
    spark.sparkContext.setLogLevel("WARN")
    val spark2 = spark
    import spark2.implicits._
    val left = Seq(("u1", 5L, "a"), ("u1", 10L, "b"), ("u1", 15L, "c"),
      ("u1", 25L, "d"), ("u2", 9L, "e")).toDF("k", "t", "tag")
    val right = Seq(("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u2", 9L, 9.0))
      .toDF("k", "t", "v")

    val inner = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t").collect().map(r => (r.getString(2), r.getDouble(3)))
    // t=5 has no right row <= 5 and drops; t=10 ties to the t=10 right row
    assert(inner.toSeq === Seq(("b", 1.0), ("c", 1.0), ("d", 2.0), ("e", 9.0)))

    val outer = AsOfJoin.asOf(left, right, "k", "t", Seq("v"), keepUnmatched = true)
      .orderBy("k", "t").collect()
    assert(outer.length === 5)
    assert(outer(0).getString(2) === "a" && outer(0).isNullAt(3))
  }
}
