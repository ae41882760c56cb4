package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Measurement-only main (guide §1): run queries and print per-JOB wall
  * times + stage/task counts from a SparkListener, so the optimization
  * loop sees where a multi-job operator's time actually goes (job count
  * vs per-stage work) instead of guessing from totals. Not part of the
  * driver contract. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    graft.core.FastLocalDir.install()
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    // GRAFT_PROBE_CPUS: probe the same query at different core counts
    // (the driver's scaling block runs 8 vs 32) without editing code
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long, Int, Int, String)] // id, start, end, stages, tasks, site
    val starts = mutable.Map.empty[Int, (Long, Int, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts(js.jobId) = (js.time, js.stageInfos.size, js.stageInfos.map(_.numTasks).sum, site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, st, tk, site) =>
          jobs += ((je.jobId, t0, je.time, st, tk, site)) }
    })
    names.foreach { name =>
      (1 to reps).foreach { r =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        jobs.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        val tot = jobs.map(j => j._3 - j._2).sum / 1e3
        println(f"[probe] $name rep$r wall=$wall%.2fs jobs=${jobs.size} jobsum=$tot%.2fs stages=${jobs.map(_._4).sum} tasks=${jobs.map(_._5).sum}")
        if (r == reps) {
          jobs.sortBy(j => -(j._3 - j._2)).take(10).foreach {
            case (id, s, e, st, tk, _) =>
              println(f"[probe]   job#$id ${(e - s) / 1e3}%.3fs stages=$st tasks=$tk")
          }
        }
      }
    }
    spark.stop()
  }
}
