package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared LSM plumbing for the streaming index maintainers: tombstone
  * segments (the delete path) and the stop-the-world segment swap
  * (the compaction path).
  *
  * Deletes append one parquet segment of ids per request —
  * right-to-be-forgotten without read-modify-writing any history, the
  * exact mirror of how appends land. Readers fold tombstones at
  * merge-on-read (an anti-join on a fixed-width id column — AQE
  * broadcasts the request-sized tombstone set); compaction rewrites the
  * folded state into one segment and drops the tombstones.
  *
  * ALL filesystem metadata operations (existence checks, the
  * swap/recover moves, the commit marker) go through Hadoop
  * `FileSystem`, the same abstraction Spark's parquet reads/writes
  * already use — so maintainer state dirs address any Hadoop-visible
  * store: a local path, a `file://` URI, `hdfs://`, or an object store
  * with a Hadoop connector. At the 100 TB posture this state belongs
  * on shared storage, not an executor-local disk. (Crash-safety
  * caveat, inherited from the store: `rename` is atomic on local/HDFS;
  * on S3-style stores it is copy+delete, so the [[recover]] protocol's
  * "no point where the only copy is mid-write" guarantee holds because
  * the COMPACTED copy persists until the final delete, not because the
  * rename is atomic.)
  *
  * Compaction contract: the caller pauses the maintainer (no concurrent
  * foreachBatch commit — same stop-the-world contract as
  * [[StreamingSketch.compact]]). The swap itself is crash-safe: the new
  * segment is fully written to `<name>__compact` BEFORE the live dir
  * moves aside, and [[recover]] (run by every reader) completes an
  * interrupted swap — at no point is the only copy of the data mid-write.
  */
private[graft] object Lsm {

  /** The active session's Hadoop conf (falls back to a bare
    * `Configuration` for JVM-side tooling outside a session). */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(p: HPath): FileSystem = p.getFileSystem(hadoopConf)

  /** Hadoop-FS existence check for maintainer sub-dirs — the check the
    * maintainers use instead of `java.io.File` so `file://`/`hdfs://`
    * URIs behave identically to bare paths. */
  def exists(path: String): Boolean = {
    val p = new HPath(path)
    fsOf(p).exists(p)
  }

  /** Exactly-once segment absorb for maintainer state: `foreachBatch`
    * is AT-LEAST-ONCE (a crash between the sink write and the
    * checkpoint's offset commit re-delivers the batch), so a plain
    * `mode("append")` write double-counts a replayed batch — fatal for
    * ALGEBRAIC state (bigram counts, bin counts, sketch segments),
    * where duplicate segments change the merged answer. Each batch's
    * partial therefore writes to its OWN `batch=<id>` subdirectory
    * with overwrite: a replay rewrites the same segment instead of
    * adding a second copy. Readers go through [[readSegments]] (strips
    * the partition-discovery `batch` column); a maintainer that must
    * read state WITHOUT its own in-flight batch (the self-join hazard)
    * uses [[readSegmentsExcept]]. Compactions write their merged
    * output under `batch=compact` inside the usual `__compact` swap dir so
    * a directory stays uniformly partitioned for its whole lifetime
    * (parquet discovery rejects mixed flat + partitioned layouts).
    *
    * Contract: a maintainer dir binds to ONE checkpoint lineage (the
    * standard Structured Streaming sink rule — a fresh checkpoint
    * restarts batch ids at 0 and re-reads the source), and compaction
    * runs only with the maintainer stopped and fully committed
    * (already every compactor's documented stop-the-world contract). */
  def absorbSegment(part: DataFrame, dir: String, key: String): Unit =
    part.write.mode("overwrite").parquet(s"$dir/batch=$key")

  /** The segment key for one micro-batch: checkpoint-lineage hash +
    * batch id. The batch id alone is NOT unique across a maintainer
    * dir's lifetime — separate ingest runs (each with its own
    * checkpoint: a new source, a resumed pipeline) all restart at
    * batch 0 and would clobber each other's segments. Within ONE
    * lineage the key is replay-stable, which is the idempotence that
    * matters. Keys are deliberately non-numeric so the partition
    * column always discovers as string. */
  def segmentKey(checkpoint: String, batchId: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
    "b" + md.take(4).map(b => f"$b%02x").mkString + "-" + batchId
  }

  /** merged view over every absorbed segment (batch column stripped) */
  def readSegments(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("batch")

  /** [[readSegments]] minus `key`'s own segment — the state view a
    * replayed batch must see (its first delivery's segment is already
    * on disk; joining against it would differ from the first run and,
    * worse, self-pair the batch) */
  def readSegmentsExcept(spark: SparkSession, dir: String,
      key: String): DataFrame =
    spark.read.parquet(dir).filter(col("batch") =!= key).drop("batch")

  /** [[swapIn]] addressed by the full segment-dir path */
  def swapInPath(path: String): Unit = {
    val p = new HPath(path)
    swapIn(p.getParent.toString, p.getName)
  }

  /** [[recover]] addressed by the full segment-dir path — every reader
    * (and restarted maintainer) of a [[swapInPath]]-compacted dir must
    * call this first, or a crash between the swap's two moves strands
    * the only merged copy in `__compact` forever */
  def recoverPath(path: String): Unit = {
    val p = new HPath(path)
    recover(p.getParent.toString, p.getName)
  }

  /** delete a maintainer dir outright (the segment-zero reset) */
  def resetDir(dir: String): Unit = rmTree(new HPath(dir))

  def tombstone(ids: DataFrame, idKey: String, dir: String): Unit =
    ids.select(col(idKey).as("id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")

  def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    if (exists(s"$dir/tombstones"))
      Some(spark.read.parquet(s"$dir/tombstones").distinct())
    else None

  /** anti-join `df` against the tombstone set on `idColName` */
  def dropTombstoned(spark: SparkSession, dir: String, df: DataFrame,
      idColName: String): DataFrame =
    tombstones(spark, dir) match {
      case Some(t) =>
        df.join(t.select(col("id").as(idColName)), Seq(idColName), "left_anti")
      case None => df
    }

  def clearTombstones(dir: String): Unit =
    rmTree(new HPath(s"$dir/tombstones"))

  /** One JVM-wide monitor serializes every swap/recover transition:
    * without it, a reader's [[recover]] interleaving between
    * [[swapIn]]'s two moves completes the swap itself and the writer's
    * second move throws, aborting a compaction that in fact succeeded
    * (and skipping its tombstone cleanup). Cross-JVM writers remain the
    * caller's stop-the-world responsibility, as documented. */
  private val lock = new Object

  /** rename that fails LOUDLY: Hadoop `rename` signals some failures
    * by returning false instead of throwing (dst exists, src missing —
    * both protocol violations here, never conditions to paper over) */
  private def mv(fs: FileSystem, src: HPath, dst: HPath): Unit =
    require(fs.rename(src, dst), s"rename $src -> $dst failed")

  /** Replace segment dir `name` under `dir` with the fully-written
    * contents of `<name>__compact`:
    * move live → `<name>__trash`, move compact → live, drop
    * trash. A crash between the two moves leaves no live dir but a
    * complete `__compact`; [[recover]] finishes the swap. Idempotent:
    * if the compact dir is gone but live exists, a recover already
    * completed this swap and the call is a no-op. */
  def swapIn(dir: String, name: String): Unit = lock.synchronized {
    val live = new HPath(dir, name)
    val compact = new HPath(dir, s"${name}__compact")
    val trash = new HPath(dir, s"${name}__trash")
    val fs = fsOf(live)
    if (!fs.exists(compact)) {
      require(fs.exists(live),
        s"neither $compact nor $live exists — nothing to swap in")
      return
    }
    rmTree(trash)
    if (fs.exists(live)) mv(fs, live, trash)
    mv(fs, compact, live)
    rmTree(trash)
  }

  /** Reader-side repair: complete a swap interrupted between its two
    * moves (live dir missing, `__compact` fully written), and clear
    * leftover trash. Idempotent, cheap (two existence checks). */
  def recover(dir: String, name: String): Unit = lock.synchronized {
    val live = new HPath(dir, name)
    val compact = new HPath(dir, s"${name}__compact")
    val fs = fsOf(live)
    if (!fs.exists(live) && fs.exists(compact)) mv(fs, compact, live)
    rmTree(new HPath(dir, s"${name}__trash"))
  }

  /** MULTI-directory commit for layouts whose segment dirs must change
    * together (BM25: postings + doc_stats + term_df + the tombstone
    * drop — per-dir swaps are each crash-safe but a crash BETWEEN them
    * leaves new postings with old stats, and the stats un-mix is not
    * idempotent). Protocol: every `<name>__compact` must be fully
    * written; a COMMIT marker then makes the compacted copies
    * canonical, after which lives are replaced, tombstones dropped,
    * and the marker removed. A crash anywhere re-runs from the marker
    * ([[recoverAll]]) — each step is idempotent. */
  def swapInAll(dir: String, names: Seq[String]): Unit = lock.synchronized {
    val fs = fsOf(new HPath(dir))
    names.foreach(n => require(fs.exists(new HPath(dir, s"${n}__compact")),
      s"missing compacted segment $n under $dir"))
    val marker = new HPath(dir, CommitMarker)
    val out = fs.create(marker, true)
    try out.write(names.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    completeCommit(dir, names)
  }

  /** reader-side: finish an interrupted [[swapInAll]] (marker present),
    * then any interrupted single-dir swaps */
  def recoverAll(dir: String, names: Seq[String]): Unit = lock.synchronized {
    val fs = fsOf(new HPath(dir))
    if (fs.exists(new HPath(dir, CommitMarker))) completeCommit(dir, names)
    names.foreach(recover(dir, _))
  }

  private val CommitMarker = "__compact_COMMIT"

  private def completeCommit(dir: String, names: Seq[String]): Unit = {
    val fs = fsOf(new HPath(dir))
    names.foreach { n =>
      val live = new HPath(dir, n)
      val compact = new HPath(dir, s"${n}__compact")
      if (fs.exists(compact)) {
        rmTree(live) // marker ⇒ the compacted copy is canonical
        mv(fs, compact, live)
      }
    }
    clearTombstones(dir)
    fs.delete(new HPath(dir, CommitMarker), false)
    ()
  }

  def rmTree(p: HPath): Unit = {
    val fs = fsOf(p)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
