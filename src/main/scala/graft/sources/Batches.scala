package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** Training-export surface (SURVEY.md §2.13): the reference's
  * `DatasetView.batches(batch_size, drop_last)` / `pytorch()` /
  * `tensorflow()` (`__init__.pyi:2594-2618`, `python/deeplake/_torch.py`).
  *
  * Spark-native: `toLocalIterator` streams one partition at a time to the
  * driver (bounded memory — never a full collect), and batches are cut
  * from that stream. For distributed trainers, `foreachPartitionBatches`
  * runs the consumer inside executors so the data never funnels through
  * the driver at all — that is the 100 TB path.
  */
object Batches {

  /** Sequential batch iterator on the driver (single-trainer loop). */
  def batches(df: DataFrame, batchSize: Int, dropLast: Boolean = false): Iterator[Seq[Row]] = {
    require(batchSize > 0, "batchSize must be positive")
    import scala.jdk.CollectionConverters._
    val it = df.toLocalIterator().asInstanceOf[java.util.Iterator[Row]]
      .asScala.grouped(batchSize)
    if (dropLast) it.filter(_.size == batchSize).map(_.toSeq)
    else it.map(_.toSeq)
  }

  /** Executor-side batched consumption: each partition is cut into
    * batches and handed to `f` in place — no driver funnel. */
  def foreachPartitionBatches(df: DataFrame, batchSize: Int)
      (f: Seq[Row] => Unit): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach(b => f(b.toSeq))
    }
}
