package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.1"
  private def docs(dir: String) = graft.sources.Tables(spark, dir, "documents")

  test("exact stats: counts are consistent") {
    val r = Dedup.exactStats(docs(sf001), "text").head()
    val (nDocs, nUnique, nGroups, nRedundant) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nDocs >= nUnique)
    assert(nDocs - nUnique === nRedundant)
    assert(nGroups <= nRedundant || nRedundant === 0L)
  }

  test("exact mapping finds the sf0.1 planted duplicates") {
    val m = Dedup.exactDupMapping(docs(sf01), "doc_id", "text").collect()
    assert(m.length === 8) // 8 dup groups of size 2 planted at sf0.1
    assert(m.forall(r => r.getLong(0) > r.getLong(1)), "keeper must be the min id")
  }

  test("minhash LSH pairs are a subset of exact ngram-jaccard pairs with high recall") {
    val exact = Dedup.ngramJaccardPairs(docs(sf001), "doc_id", "text", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs(sf001), "doc_id", "text", 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH-verified pairs must all be true near-dups")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.8, s"LSH recall $recall too low (${lsh.size}/${exact.size})")
    }
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val e = graft.sources.Tables(spark, sf001, "embeddings")
    val pairs = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.4).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) > 0.4))
  }

  test("simhash buckets only contain groups of 2+") {
    val b = Dedup.simhashBuckets(docs(sf001), "doc_id", "text").collect()
    assert(b.forall(_.getLong(1) >= 2))
    assert(b.forall(r => r.getString(0).length === 16 && r.getString(0).forall(c => c == '0' || c == '1')))
  }
}
