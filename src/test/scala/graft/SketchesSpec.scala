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

  test("Misra-Gries two-pass heavy hitters are exact under a vocab far larger than k") {
    import spark.implicits._
    // 4 planted heavy items (>= 500 each) + 2000-item uniform tail (~5 each),
    // shuffled across 8 partitions; k=64 counters << 2004 distinct items
    val heavy = Seq.tabulate(4)(i => Seq.fill(500 + 37 * i)(s"hot_$i")).flatten
    val tail = Seq.tabulate(2000)(i => Seq.fill(5)(s"cold_$i")).flatten
    val df = scala.util.Random.shuffle(heavy ++ tail).toDF("token").repartition(8)
    val n = df.count()
    val threshold = 400L
    assert(threshold > n / 65, "threshold must exceed the sketch guarantee bound")
    val got = Sketches.heavyHitters(df, "token", threshold, k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact, s"got $got vs exact $exact")
    assert(got.keySet === Set("hot_0", "hot_1", "hot_2", "hot_3"))
  }

  test("Misra-Gries summary never exceeds k counters and keeps true heavies") {
    val mg = new Sketches.MisraGries(8)
    val stream = scala.util.Random.shuffle(
      Seq.fill(300)("big") ++ (1 to 500).map(i => s"small_${i % 100}"))
    val b = stream.foldLeft(mg.zero)(mg.reduce)
    assert(b.size <= 8, s"summary grew to ${b.size}")
    assert(b.contains("big"), "item with freq > n/(k+1) must survive")
    // merge path: two half-streams merged == bounded too
    val (l, r) = stream.splitAt(stream.length / 2)
    val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
    assert(merged.size <= 8 && merged.contains("big"))
  }
}
