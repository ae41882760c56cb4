package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * Compaction contract: the caller pauses the maintainer (no concurrent
  * foreachBatch commit — same stop-the-world contract as
  * [[StreamingSketch.compact]]). The swap itself is crash-safe: the new
  * segment is fully written to `<name>__compact` BEFORE the live dir
  * moves aside, and [[recover]] (run by every reader) completes an
  * interrupted swap — at no point is the only copy of the data mid-write.
  */
private[streaming] object Lsm {

  /** Segment reads/writes go through Spark's Hadoop FS, but tombstone
    * existence checks and the swap/recover moves use java.nio — on a
    * non-local URI (s3://, hdfs://) the parquet side would succeed while
    * tombstones() / dropTombstoned / recover silently no-op, resurfacing
    * DELETEd ids (a silent right-to-be-forgotten violation). Fail loudly
    * at every entry point instead: maintainer state dirs must be local
    * paths. Distributed deployments put them on a shared local mount or
    * port this object to Hadoop FileSystem first. */
  private def requireLocal(dir: String): String = {
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*://.*"),
      s"Lsm maintainer dirs must be local filesystem paths (java.nio side " +
        s"of the swap/tombstone protocol cannot address a URI): got $dir")
    dir
  }

  def tombstone(ids: DataFrame, idKey: String, dir: String): Unit = {
    requireLocal(dir)
    ids.select(col(idKey).as("id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")
  }

  def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    if (new java.io.File(s"${requireLocal(dir)}/tombstones").exists())
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
    rmTree(Paths.get(requireLocal(dir), "tombstones"))

  /** One JVM-wide monitor serializes every swap/recover transition:
    * without it, a reader's [[recover]] interleaving between
    * [[swapIn]]'s two moves completes the swap itself and the writer's
    * second move throws, aborting a compaction that in fact succeeded
    * (and skipping its tombstone cleanup). Cross-JVM writers remain the
    * caller's stop-the-world responsibility, as documented. */
  private val lock = new Object

  /** Replace segment dir `name` under `dir` with the fully-written
    * contents of `<name>__compact`:
    * move live → `<name>__trash`, atomically move compact → live, drop
    * trash. A crash between the two moves leaves no live dir but a
    * complete `__compact`; [[recover]] finishes the swap. Idempotent:
    * if the compact dir is gone but live exists, a recover already
    * completed this swap and the call is a no-op. */
  def swapIn(dir: String, name: String): Unit = lock.synchronized {
    requireLocal(dir)
    val live = Paths.get(dir, name)
    val compact = Paths.get(dir, s"${name}__compact")
    val trash = Paths.get(dir, s"${name}__trash")
    if (!Files.exists(compact)) {
      require(Files.exists(live),
        s"neither $compact nor $live exists — nothing to swap in")
      return
    }
    rmTree(trash)
    if (Files.exists(live)) Files.move(live, trash)
    Files.move(compact, live, StandardCopyOption.ATOMIC_MOVE)
    rmTree(trash)
  }

  /** Reader-side repair: complete a swap interrupted between its two
    * moves (live dir missing, `__compact` fully written), and clear
    * leftover trash. Idempotent, cheap (two existence checks). */
  def recover(dir: String, name: String): Unit = lock.synchronized {
    requireLocal(dir)
    val live = Paths.get(dir, name)
    val compact = Paths.get(dir, s"${name}__compact")
    if (!Files.exists(live) && Files.exists(compact))
      Files.move(compact, live, StandardCopyOption.ATOMIC_MOVE)
    rmTree(Paths.get(dir, s"${name}__trash"))
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
    requireLocal(dir)
    names.foreach(n => require(Files.exists(Paths.get(dir, s"${n}__compact")),
      s"missing compacted segment $n under $dir"))
    Files.write(Paths.get(dir, CommitMarker),
      names.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    completeCommit(dir, names)
  }

  /** reader-side: finish an interrupted [[swapInAll]] (marker present),
    * then any interrupted single-dir swaps */
  def recoverAll(dir: String, names: Seq[String]): Unit = lock.synchronized {
    requireLocal(dir)
    if (Files.exists(Paths.get(dir, CommitMarker))) completeCommit(dir, names)
    names.foreach(recover(dir, _))
  }

  private val CommitMarker = "__compact_COMMIT"

  private def completeCommit(dir: String, names: Seq[String]): Unit = {
    names.foreach { n =>
      val live = Paths.get(dir, n)
      val compact = Paths.get(dir, s"${n}__compact")
      if (Files.exists(compact)) {
        rmTree(live) // marker ⇒ the compacted copy is canonical
        Files.move(compact, live, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    clearTombstones(dir)
    Files.deleteIfExists(Paths.get(dir, CommitMarker))
    ()
  }

  def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
