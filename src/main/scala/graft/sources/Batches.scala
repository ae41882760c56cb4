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

  /** GPT-style concat-and-chunk SEQUENCE PACKING: pretraining pipelines
    * concatenate documents and slice the token stream into fixed
    * `budget`-token training sequences (documents straddle sequence
    * boundaries — the zero-padding posture, complementing
    * [[graft.operators.TextAnalysis.packSequences]]'s FFD bins which
    * never split a doc but pad the slack). Documents hash-shard
    * deterministically (md5 — the [[epochShuffle]] convention, so the
    * layout is bit-stable across engines and runs) and concatenate in
    * id order WITHIN their shard: the only window partitions by shard,
    * the parallel unit a multi-executor run needs anyway — no global
    * cumulative sum. Returns (shard_id, id, n_tokens, seq_id,
    * seq_offset): the per-shard zero-based sequence containing the
    * document's FIRST token, and the token offset inside it. Integer
    * `div`/`pmod` arithmetic throughout — no double rounding at
    * corpus-scale cumulative counts. */
  def concatChunkPack(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Int, numShards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")
    // explicit ROWS frame: the default RANGE frame includes ORDER BY
    // peers, so duplicate ids would double-count each other's tokens
    // and break stream contiguity (the oracle is ROWS-framed too)
    val w = Window.partitionBy(col("shard_id")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(tokensCol).cast("long").as("n_tokens"),
        shard.as("shard_id"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("shard_id"), col(idCol), col("n_tokens"),
        expr(s"__start DIV ${budget}L").as("seq_id"),
        pmod(col("__start"), lit(budget.toLong)).as("seq_offset"))
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

  // ------------------------------------------------- Arrow IPC export

  /** Arrow IPC training export — the columnar zero-copy analogue of the
    * reference's numpy dataloader path (`python/deeplake/__init__.pyi:418-451`
    * batches/pytorch): each plan partition streams through Spark's OWN
    * Arrow batch encoder (`toArrowBatchRdd` — the exact wire path
    * PySpark rides) and lands as one `part-NNNNN.arrows` IPC STREAM file
    * (schema header + record batches + EOS), readable zero-copy by any
    * Arrow consumer (pyarrow.ipc.open_stream / polars / torch
    * dataloaders). `batchRows` caps record-batch height so a trainer maps
    * batches straight into fixed-size tensors.
    *
    * Scale shape: NO collect, NO driver funnel — the encoder RDD runs
    * inside executors, each task writes exactly its own file, and only
    * the (partition, batches, rows, bytes) manifest rows return to the
    * driver. Returns one ShardInfo per partition file. */
  def exportArrowShards(df: DataFrame, outDir: String,
      batchRows: Int = 1024): Seq[ShardInfo] = {
    require(batchRows > 0, "batchRows must be positive")
    val spark = df.sparkSession
    Files.createDirectories(Paths.get(outDir))
    val confKey = "spark.sql.execution.arrow.maxRecordsPerBatch"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, batchRows.toString)
    val rdd =
      try org.apache.spark.sql.graft.Bridge.arrowBatchRdd(df)
      finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    val schema = df.schema
    val tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    // captured driver-side: the stream header must declare the same
    // var-type width the batch encoder used, or the shards are
    // undecodable under spark.sql.execution.arrow.useLargeVarTypes=true
    val largeVar = org.apache.spark.sql.graft.Bridge.arrowLargeVarTypes(spark)
    val outDirB = outDir
    val stats = rdd.mapPartitionsWithIndex { case (pid, batches) =>
      val path = Paths.get(outDirB, f"part-$pid%05d.arrows")
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(path))
      var nBatches = 0L
      try org.apache.spark.sql.graft.Bridge.writeArrowStream(
        schema, tz, batches.map { b => nBatches += 1; b }, os, largeVar)
      finally os.close()
      Iterator.single((pid, nBatches, Files.size(path)))
    }.collect().sortBy(_._1)
    val infos = stats.map { case (pid, nBatches, bytes) =>
      ShardInfo(pid, nBatches, bytes,
        Paths.get(outDir, f"part-$pid%05d.arrows").toString)
    }.toSeq
    val manifest = infos.map { s =>
      s"""{"shard_id": ${s.shardId}, "batches": ${s.rows}, "bytes": ${s.bytes}, "path": "${Paths.get(s.path).getFileName}"}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(outDir, "_manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    infos
  }

  /** Read an [[exportArrowShards]] directory back into a DataFrame (the
    * loader-side contract check; batches decode through Spark's own Arrow
    * reader). */
  def readArrowShards(spark: org.apache.spark.sql.SparkSession,
      dir: String, schemaJson: String): DataFrame = {
    val listing = Files.list(Paths.get(dir))
    val files =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".arrows")).toSeq.sortBy(_.toString)
      finally listing.close() // Files.list holds a directory handle open
    val batches = files.iterator.flatMap(p =>
      org.apache.spark.sql.graft.Bridge.readArrowStream(p.toString).iterator)
    org.apache.spark.sql.graft.Bridge.dataFrameFromArrowBatches(
      spark, schemaJson, batches)
  }

  // ------------------------------------------------- tar shard export

  /** One POSIX ustar (1988) member header + data, padded to 512-byte
    * blocks. Hand-rolled because the JDK ships no tar writer; the
    * format is 512 fixed offsets and an octal checksum, validated in
    * the spec against GNU tar itself. */
  private[sources] def tarMember(name: String, data: Array[Byte],
      out: java.io.OutputStream): Unit = {
    require(name.getBytes(StandardCharsets.UTF_8).length <= 100,
      s"ustar member name over 100 bytes: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)                                   // name[100]
    put(100, "0000644")                            // mode[8] (NUL-terminated)
    put(108, "0000000")                            // uid[8]
    put(116, "0000000")                            // gid[8]
    put(124, f"${data.length}%011o")               // size[12] octal
    put(136, "00000000000")                        // mtime[12] (epoch: reproducible)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum[8] = spaces while summing
    h(156) = '0'                                   // typeflag: regular file
    put(257, "ustar")                              // magic[6] "ustar\0"
    h(262) = 0
    put(263, "00")                                 // version[2]
    put(265, "graft")                              // uname[32]
    put(297, "graft")                              // gname[32]
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o")                          // chksum: 6 octal + NUL + space
    h(154) = 0
    h(155) = ' '.toByte
    out.write(h)
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** WebDataset-style tar shard export: each sample's members land as
    * consecutive `<key>.<ext>` files in one `.tar` per shard — THE
    * sequential-read layout multimodal training loaders stream (tar
    * keeps a sample's text/image/metadata adjacent on disk, so a
    * dataloader never seeks). `members` maps file extensions to binary
    * or string columns; keys assign to ceil(n/targetRowsPerShard)
    * shards by deterministic hash, samples sort by key inside a shard
    * and member order follows `members` — the archive is byte-stable
    * across runs and layouts (member mtime pinned to epoch).
    *
    * Scale shape: one count + one hash-partitioned shuffle; every
    * shard's rows land in exactly one task, which streams its tar
    * straight to disk (nothing buffers a whole shard in memory).
    * A `_manifest.json` records per-shard samples/bytes for epoch
    * planning. */
  def exportTarShards(df: DataFrame, keyCol: String,
      members: Seq[(String, String)], outDir: String,
      targetRowsPerShard: Long): Seq[ShardInfo] = {
    require(members.nonEmpty, "need at least one member column")
    require(targetRowsPerShard > 0, "targetRowsPerShard must be positive")
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val exts = members.map(_._1)
    val memberCols = members.map { case (ext, c) =>
      df.schema(c).dataType match {
        case BinaryType => col(c)
        case StringType => col(c).cast("binary")
        case other => throw new IllegalArgumentException(
          s"member column $c must be binary or string, got $other")
      }
    }
    val n = df.count()
    val nShards = math.max(1L, (n + targetRowsPerShard - 1) / targetRowsPerShard).toInt
    Files.createDirectories(Paths.get(outDir))
    val prepared = df.select(col(keyCol).cast("string").as("__key"),
        array(memberCols.map(c => coalesce(c, lit(Array.empty[Byte]))): _*).as("__data"))
      .withColumn("__shard",
        pmod(xxhash64(col("__key")), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
    // per-shard sample counts from a key-only aggregation (cheap scan;
    // the data columns never join this job)
    val counts = df.select(col(keyCol).cast("string").as("__key"))
      .groupBy(pmod(xxhash64(col("__key")), lit(nShards.toLong)).cast("int")
        .as("__shard"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val outDirB = outDir
    val extsB = exts
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      var cur: Option[(Int, java.io.OutputStream)] = None
      def close(): Unit = cur.foreach { case (_, os) =>
        os.write(new Array[Byte](1024)) // two zero blocks = end of archive
        os.close()
      }
      rows.foreach { r =>
        val sid = r.getInt(2)
        if (!cur.exists(_._1 == sid)) {
          close()
          cur = Some(sid -> new java.io.BufferedOutputStream(
            Files.newOutputStream(Paths.get(outDirB, f"shard-$sid%05d.tar"))))
        }
        val key = r.getString(0)
        val datas = r.getSeq[Array[Byte]](1)
        extsB.zip(datas).foreach { case (ext, bytes) =>
          tarMember(s"$key.$ext", bytes, cur.get._2)
        }
      }
      close()
    }
    val infos = (0 until nShards).map { sid =>
      val tarPath = Paths.get(outDir, f"shard-$sid%05d.tar")
      val bytes = if (Files.exists(tarPath)) Files.size(tarPath) else 0L
      ShardInfo(sid, counts.getOrElse(sid, 0L), bytes, tarPath.toString)
    }
    val manifest = infos.map { s =>
      s"""{"shard_id": ${s.shardId}, "samples": ${s.rows}, "bytes": ${s.bytes}, "path": "${Paths.get(s.path).getFileName}"}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(outDir, "_manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    infos
  }
}
