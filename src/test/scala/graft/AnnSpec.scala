package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnIndex

/** ANN recall gate, mirroring the reference's embedding-quality test
  * (postgres/tests/py_tests/test_embedding_quality.py: KNN on seeded
  * random vectors must beat a minimum pass count vs exact results). */
class AnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("default config recall@10 >= 0.6 on random vectors") {
    val queries = emb.filter(col("vec_id") < 10)
    val r = AnnIndex.recallAtK(spark, emb, queries, "vec_id", "embedding",
      k = 10, AnnIndex.SearchConfig(), nClusters = 16)
    assert(r >= 0.6, s"recall@10 = $r")
  }

  test("high-accuracy config (probe all clusters) recall@10 = 1.0") {
    val queries = emb.filter(col("vec_id") < 10)
    val r = AnnIndex.recallAtK(spark, emb, queries, "vec_id", "embedding",
      k = 10, AnnIndex.SearchConfig(accuracyFactor = 20, clusterSearchFactor = 8.0),
      nClusters = 16)
    assert(r === 1.0, s"recall@10 = $r (exhaustive probe must equal exact)")
  }

  test("quantized index: recall@10 non-decreasing in accuracyFactor") {
    val queries = emb.filter(col("vec_id") < 10)
    val rs = Seq(1, 3, 10).map { af =>
      AnnIndex.recallAtK(spark, emb, queries, "vec_id", "embedding", k = 10,
        AnnIndex.SearchConfig(accuracyFactor = af), nClusters = 16, quantized = true)
    }
    assert(rs == rs.sorted, s"recall must be non-decreasing in accuracyFactor: $rs")
  }

  test("quantized index recall@10 >= 0.9 vs brute force (all clusters probed)") {
    val queries = emb.filter(col("vec_id") < 10)
    val r = AnnIndex.recallAtK(spark, emb, queries, "vec_id", "embedding", k = 10,
      AnnIndex.SearchConfig(accuracyFactor = 10, clusterSearchFactor = 4.0),
      nClusters = 16, quantized = true)
    assert(r >= 0.9, s"quantized recall@10 = $r")
  }

  test("search returns exactly k ranked rows per query") {
    val idx = AnnIndex.build(emb, "vec_id", "embedding", nClusters = 8)
    val res = AnnIndex.search(idx, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 5)
      .collect()
    assert(res.length === 5)
    assert(res.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
  }
}
