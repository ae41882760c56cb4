package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Deterministic weighted per-group sampling: reservoir-equivalent
  * distribution from hash-derived uniforms. */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-group sizes, determinism across partitionings, zero-weight exclusion") {
    import spark.implicits._
    val df = (1 to 300).map { i =>
      (i.toLong, s"g${i % 3}", if (i % 10 == 0) 0.0 else 1.0 + (i % 7))
    }.toDF("id", "g", "w")
    val a = Sampling.weightedHashSamplePerGroup(df, col("g"), col("id"), col("w"), 20)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedHashSamplePerGroup(df.repartition(13), col("g"), col("id"), col("w"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on physical layout")
    val perGroup = Sampling.weightedHashSamplePerGroup(df, col("g"), col("id"), col("w"), 20)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ == 20), perGroup.toString)
    assert(a.forall(_ % 10 != 0), "zero-weight rows must never sample")
    // small group: sample is the whole group
    val tiny = Seq((1L, "x", 5.0), (2L, "x", 1.0)).toDF("id", "g", "w")
    assert(Sampling.weightedHashSamplePerGroup(tiny, col("g"), col("id"), col("w"), 20)
      .count() == 2)
  }

  test("heavier rows are sampled proportionally more often") {
    import spark.implicits._
    // 1000 rows, weight 9 for ids < 100, weight 1 otherwise; sample 200.
    // Expected heavy share under weighted sampling >> 10% population share.
    val df = (1 to 1000).map(i => (i.toLong, "g", if (i <= 100) 9.0 else 1.0))
      .toDF("id", "g", "w")
    val got = Sampling.weightedHashSamplePerGroup(df, col("g"), col("id"), col("w"), 200)
      .collect().map(_.getLong(0))
    val heavyShare = got.count(_ <= 100).toDouble / got.length
    assert(heavyShare > 0.25, f"heavy rows underrepresented: $heavyShare%.3f")
  }
}
