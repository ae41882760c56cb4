package graft
import org.apache.spark.sql.SparkSession
object JudgeBench {
  def main(args: Array[String]): Unit = {
    graft.core.FastLocalDir.install()
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.IndexStore.annQuantized(spark, sfDir)
    graft.operators.IndexStore.inverted(spark, sfDir)
    graft.operators.IndexStore.bm25(spark, sfDir)
    val names = Seq("q1_pricing_summary","q3_top_revenue_orders","q6_revenue_forecast",
      "q9_product_profit","q13_customer_distribution","q18_large_volume_customers",
      "q21_waiting_suppliers","q_dedup_minhash_lsh","q_dedup_embedding",
      "q_dedup_ngram_jaccard","q_vec_cosine_topk","q_vec_ann_topk",
      "q_hybrid_search","q_bm25_topk","q_inverted_contains_all","q_text_langid","q_window_rank")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"JUDGE $n%-28s ${ts.sorted.apply(1)}%.3f  (${ts.map(t=>f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
