package graft

import org.apache.spark.sql.SparkSession

/** Developer harness: time a subset of SparkEntry queries (args = query
  * names, or prefixes ending in '*'), N repetitions each, optionally
  * printing the formatted plan. Mirrors Bench's measurement (noop-format
  * write after a clearCache) so numbers are comparable per query.
  *
  *   sbt "runMain graft.BenchOne q_hybrid_search q_bm25_topk"
  *   SPARK_GRAFT_EXPLAIN=1 SPARK_GRAFT_REPS=3 sbt "runMain graft.BenchOne q_bm25_topk"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    graft.core.FastLocalDir.install()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.IndexStore.warmAll(spark, sfDir)

    val wanted = SparkEntry.queries.keys.toSeq.sorted.filter(n =>
      args.exists(a => if (a.endsWith("*")) n.startsWith(a.dropRight(1)) else n == a))
    if (wanted.isEmpty) { System.err.println(s"no queries match ${args.mkString(",")}"); sys.exit(1) }
    wanted.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
