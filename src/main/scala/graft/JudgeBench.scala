package graft
import org.apache.spark.sql.SparkSession

/** Minimal re-timing harness (the judge's 3-rep median probe). Args:
  * optional sf dir first (any arg containing '/'), then an optional
  * query subset; defaults to sf0.1 and the headline list. Per-query
  * isolation: a failing query prints FAIL and the run continues.
  *
  *   sbt "runMain graft.JudgeBench"
  *   sbt "runMain graft.JudgeBench /root/testdata/sf0.01 q_bm25_topk"
  */
object JudgeBench {
  def main(args: Array[String]): Unit = {
    graft.core.FastLocalDir.install()
    val sfDir = args.find(_.contains("/")).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm every persisted artifact (fault-tolerant), so no listed
    // query's first rep silently pays an index build
    graft.operators.IndexStore.warmAll(spark, sfDir)
    val subset = args.filterNot(_.contains("/"))
    val names =
      if (subset.nonEmpty) subset.toSeq
      else Headline.names.toSeq.sorted
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(f"JUDGE $n%-28s UNKNOWN (not in SparkEntry.queries)")
        case Some(fn) =>
          try {
            val ts = (1 to 3).map { _ =>
              spark.catalog.clearCache()
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            println(f"JUDGE $n%-28s ${ts.sorted.apply(1)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
          } catch { case e: Throwable =>
            println(f"JUDGE $n%-28s FAIL ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
