package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

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

  /** Seeded epoch shuffle (the per-epoch reshuffle every training data
    * loader needs): a deterministic global permutation keyed by
    * (seed, id) — md5("seed:id") order — materialized as (shard_id,
    * position) coordinates rather than a single global sort: shard =
    * hash prefix mod `numShards`, position = rank within the shard.
    * Ranks window over ONE shard's rows each, so the permutation costs
    * one hash shuffle + per-shard local sorts — no global sort, no
    * driver funnel; a loader reads shard files in position order and
    * the concatenation across shards is the epoch's permutation.
    * Different seeds give independent permutations; the same seed is
    * bit-stable across runs and engines (md5, no engine hash). */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
      numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard_id", pmod(
        conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
        lit(numShards.toLong)).cast("int"))
      .withColumn("position", (row_number().over(
        Window.partitionBy(col("shard_id")).orderBy(col("__h"), col(idCol)))
        - 1).cast("long"))
      .drop("__h")
  }

  // ------------------------------------------------- sharded export

  final case class ShardInfo(shardId: Int, rows: Long, bytes: Long, path: String)

  /** Sharded training export (WebDataset-style layout): the dataset is
    * split into ceil(n / targetRowsPerShard) shards by a deterministic
    * hash of `idCol` (same rows → same shard on every run), written as
    * one `shard_id=N` directory per shard in `format` (parquet / json
    * for JSONL / csv), plus a `_manifest.json` recording per-shard row
    * and byte counts — what a downstream dataloader reads to plan epochs
    * without listing data files.
    *
    * Scale shape: one count, one hash-partitioned shuffle write; shard
    * row counts ride the same shuffle as a groupBy before the write.
    * Each shard is written by exactly one task (hash-colocated), so a
    * shard is one file. */
  def exportShards(df: DataFrame, idCol: String, outDir: String,
      targetRowsPerShard: Long, format: String = "parquet"): Seq[ShardInfo] = {
    require(targetRowsPerShard > 0, "targetRowsPerShard must be positive")
    val n = df.count()
    val nShards = math.max(1L, (n + targetRowsPerShard - 1) / targetRowsPerShard).toInt
    val sharded = df.withColumn("shard_id",
      pmod(xxhash64(col(idCol)), lit(nShards.toLong)).cast("int"))
    val counts = sharded.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("rows")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    sharded.repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(idCol))
      .write.mode("overwrite").partitionBy("shard_id").format(format).save(outDir)
    val infos = (0 until nShards).map { sid =>
      val dir = Paths.get(outDir, s"shard_id=$sid")
      val bytes =
        if (!Files.exists(dir)) 0L
        else Files.walk(dir).iterator().asScala
          .filter(Files.isRegularFile(_)).map(Files.size).sum
      ShardInfo(sid, counts.getOrElse(sid, 0L), bytes, dir.toString)
    }
    val manifest = infos.map { s =>
      s"""{"shard_id": ${s.shardId}, "rows": ${s.rows}, "bytes": ${s.bytes}, "path": "shard_id=${s.shardId}"}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(outDir, "_manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    infos
  }
}
