package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.dialect.Tql
import graft.functions.gf

/** TQL dialect frontend: parse + compile + execute against sf0.001,
  * cross-checked with directly-built DataFrames. */
class TqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("tql-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tbl(name: String) = graft.sources.Tables(spark, dir, name)

  test("projection + where + order + limit") {
    val got = Tql.query(spark, dir,
      """SELECT l_orderkey, l_quantity * l_extendedprice AS gross
        |FROM lineitem WHERE l_quantity > 45 ORDER BY gross DESC, l_orderkey LIMIT 5""".stripMargin)
    val want = tbl("lineitem").filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), (col("l_quantity") * col("l_extendedprice")).as("gross"))
      .orderBy(col("gross").desc, col("l_orderkey")).limit(5)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("glob LIKE translation and IN / BETWEEN / IS NULL") {
    val got = Tql.query(spark, dir,
      """SELECT p_partkey FROM part
        |WHERE p_name LIKE '*a*' AND p_size BETWEEN 1 AND 15
        |AND p_brand NOT IN ('Brand#99') ORDER BY p_partkey""".stripMargin)
    val want = tbl("part")
      .filter(col("p_name").like("%a%") && col("p_size").between(1, 15) &&
        !col("p_brand").isin("Brand#99"))
      .select(col("p_partkey")).orderBy(col("p_partkey"))
    assert(got.collect().toSeq == want.collect().toSeq)
    assert(got.count() > 0)
  }

  test("join ... on with qualified refs") {
    val got = Tql.query(spark, dir,
      """SELECT o.o_orderkey, c.c_name FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > 300000 ORDER BY o.o_orderkey LIMIT 10""".stripMargin)
    assert(got.columns.toSeq == Seq("o_orderkey", "c_name"))
    assert(got.count() == 10)
  }

  test("array index, negative index, slice with step") {
    val got = Tql.query(spark, dir,
      """SELECT vec_id, embedding[0] AS first, embedding[-1] AS last,
        |SUM(embedding[0:8]) AS head_sum, SUM(embedding[::2]) AS even_sum
        |FROM embeddings ORDER BY vec_id LIMIT 20""".stripMargin).collect()
    val want = tbl("embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).as("first"),
        element_at(col("embedding"), -1).as("last"),
        gf.tsum(slice(col("embedding"), 1, 8)).as("head_sum"),
        gf.tsum(filter(col("embedding"), (_, i) => i % 2 === 0)).as("even_sum"))
      .orderBy(col("vec_id")).limit(20).collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(math.abs(g.getFloat(1) - w.getFloat(1)) < 1e-6)
      assert(math.abs(g.getFloat(2) - w.getFloat(2)) < 1e-6)
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9)
      assert(math.abs(g.getDouble(4) - w.getDouble(4)) < 1e-9)
    }
  }

  test("elementwise arithmetic on arrays: L2_NORM(a - b)") {
    val got = Tql.query(spark, dir,
      """SELECT e.vec_id, L2_NORM(e.embedding - q.embedding) AS dist
        |FROM embeddings e JOIN embeddings q ON q.vec_id = e.vec_id
        |ORDER BY e.vec_id LIMIT 5""".stripMargin).collect()
    got.foreach(r => assert(math.abs(r.getDouble(1)) < 1e-6)) // distance to itself = 0
  }

  test("vector search: ORDER BY COSINE_SIMILARITY DESC LIMIT k") {
    val q = Tql.query(spark, dir,
      """SELECT e.vec_id, COSINE_SIMILARITY(e.embedding, q.embedding) AS score
        |FROM embeddings e JOIN embeddings q ON q.vec_id = 0
        |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin).collect()
    assert(q.length == 5)
    assert(q.head.getLong(0) == 0L) // self-match first
    assert(math.abs(q.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("GROUP BY reshapes to sequences; reductions act per group") {
    val got = Tql.query(spark, dir,
      """SELECT user_id, SUM(value) AS total, AVG(value) AS mean
        |FROM events GROUP BY user_id ORDER BY user_id LIMIT 10""".stripMargin)
    val want = tbl("events").groupBy(col("user_id"))
      .agg(sum(col("value")).as("total"), avg(col("value")).as("mean"))
      .orderBy(col("user_id")).limit(10)
    val g = got.collect()
    val w = want.collect()
    g.zip(w).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }

  test("GROUP BY + UNGROUP BY round-trips rows") {
    val grouped = Tql.query(spark, dir,
      "SELECT user_id, value FROM events GROUP BY user_id")
    assert(grouped.schema("value").dataType.typeName == "array")
    val ungrouped = Tql.query(spark, dir,
      "SELECT user_id, value FROM events GROUP BY user_id UNGROUP BY value")
    assert(ungrouped.count() == tbl("events").count())
  }

  test("set ops with per-branch limits") {
    val got = Tql.query(spark, dir,
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 100000 ORDER BY o_orderkey LIMIT 5
        |UNION SELECT o_orderkey FROM orders WHERE o_totalprice < 50000 ORDER BY o_orderkey LIMIT 5""".stripMargin)
    val hi = math.min(5, tbl("orders").filter(col("o_totalprice") > 100000).count())
    val lo = math.min(5, tbl("orders").filter(col("o_totalprice") < 50000).count())
    assert(got.count() == hi + lo)
  }

  test("SAMPLE BY MAX_WEIGHT pairs consumes LIMIT as sample size") {
    val got = Tql.query(spark, dir,
      """SELECT event_id, event_type FROM events
        |SAMPLE BY MAX_WEIGHT(event_type == 'purchase': 10.0, TRUE: 1.0) LIMIT 50""".stripMargin)
    assert(got.count() == 50)
    // purchases are upweighted 10x, so they should be over-represented
    val purchaseShare = got.filter(col("event_type") === "purchase").count() / 50.0
    val baseShare = tbl("events").filter(col("event_type") === "purchase").count().toDouble /
      tbl("events").count()
    assert(purchaseShare > baseShare)
  }

  test("LIMIT PERCENT and OFFSET") {
    val total = tbl("region").count()
    val got = Tql.query(spark, dir,
      "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 40 PERCENT")
    assert(got.count() == (total * 40 / 100.0).toInt)
    val off = Tql.query(spark, dir,
      "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 2 OFFSET 1").collect()
    assert(off.map(_.getAs[Number](0).longValue).toSeq == Seq(1L, 2L))
  }

  test("positional params bind as literals") {
    val got = Tql.query(spark, dir,
      "SELECT o_orderkey FROM orders WHERE o_totalprice > ? ORDER BY o_orderkey LIMIT ?",
      params = Seq(350000.0, 3L))
    assert(got.count() <= 3)
  }

  test("JSON key access and KEYS()") {
    val got = Tql.query(spark, dir,
      """SELECT event_id, props['k'] AS k, KEYS(props) AS ks
        |FROM events ORDER BY event_id LIMIT 5""".stripMargin).collect()
    assert(got.forall(r => r.getString(1).toLong >= 0))
    assert(got.forall(r => r.getSeq[String](2) == Seq("k")))
  }

  test("scalar functions: ANY/ALL over predicates, SHAPE, subquery FROM") {
    val got = Tql.query(spark, dir,
      """SELECT vec_id, ANY(embedding > 0.3) AS has_big, SHAPE(embedding) AS shp
        |FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10)
        |ORDER BY vec_id""".stripMargin).collect()
    assert(got.length == 10)
    assert(got.forall(_.getSeq[Int](2) == Seq(64)))
  }
}
