package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Lsm

/** Persisted edge-list artifact for the graph-analytics family — the
  * graph analog of the text/ANN index artifacts ([[IndexStore]]): the
  * reference maintains its indexes next to the dataset and updates them
  * incrementally on append (`docs/docs/advanced/tql.md:768`,
  * `cpp/query_core/index_holder.hpp:18-44`); the graph queries here get
  * the same posture instead of re-deriving the edge frame from the
  * source join on every query.
  *
  * Layout (all through Hadoop FS, so dirs address local/HDFS/object
  * stores alike):
  * {{{
  *   <dir>/edges/batch=<key>/   (src long, dst long, w long) collapsed
  *   <dir>/tombstones/          (id long) deleted NODES
  * }}}
  *
  * The stored state is the COLLAPSED directed multigraph — parallel
  * edges folded to a count weight `w`. Counts are ALGEBRAIC, so an
  * append lands as one O(delta) segment of partial counts and
  * merge-on-read restores exact totals with one edge-keyed hash-agg
  * (the [[Lsm]] segment discipline: replayed batches overwrite their
  * own segment, never double-count). Node deletes are tombstones folded
  * at read as anti-joins on both endpoints; [[compact]] rewrites the
  * folded state into one src-partitioned segment and drops them.
  *
  * Scale shape: every derived view the operators need (symmetrization,
  * degree annotation, simple-graph dedupe) is one shuffle over the
  * EDGE-sized frame — orders of magnitude smaller than the corpus-sized
  * source join the artifact replaces, and paid only by the query that
  * needs that exact view.
  */
object GraphStore {

  /** collapse a raw edge frame to exact (src, dst, w) multiplicity
    * counts — the stored form, and the partial an append absorbs */
  def collapse(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))

  /** build the artifact from scratch: one collapsed, src-partitioned
    * base segment (idempotent overwrite) */
  def build(edges: DataFrame, srcCol: String, dstCol: String,
      dir: String): Unit = {
    val par = edges.sparkSession.sparkContext.defaultParallelism
    collapse(edges, srcCol, dstCol)
      .repartition(par, col("src"))
      .write.mode("overwrite").parquet(s"$dir/edges/batch=base")
  }

  /** absorb an O(delta) append: the new edges' partial counts land as
    * their own segment (replay-idempotent — a re-delivered batch
    * rewrites the same segment, see [[Lsm.absorbSegment]]) */
  def absorb(newEdges: DataFrame, srcCol: String, dstCol: String,
      dir: String, key: String): Unit =
    Lsm.absorbSegment(collapse(newEdges, srcCol, dstCol), s"$dir/edges", key)

  /** delete nodes: tombstone ids fold at read as anti-joins on BOTH
    * endpoints (an edge dies with either end). Standard LSM caveat: a
    * later re-absorb of a tombstoned id stays masked until [[compact]]
    * folds the tombstones away. */
  def deleteNodes(ids: DataFrame, idCol: String, dir: String): Unit =
    Lsm.tombstone(ids, idCol, dir)

  private def segmentCount(dir: String): Int = {
    val p = new HPath(s"$dir/edges")
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  /** merged view: exact (src, dst, w) totals with tombstoned nodes
    * dropped. Single-segment tombstone-free state (fresh build or just
    * compacted) skips the merge agg — the common serving path reads the
    * parquet as-is. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    Lsm.recoverPath(s"$dir/edges")
    // no absorbed segments yet (fresh dir, or deleteNodes before any
    // build): the graph IS empty — return the empty edge frame instead
    // of letting spark.read throw on the missing path (r13 advice)
    if (segmentCount(dir) == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "src LONG, dst LONG, w LONG"))
    val raw = Lsm.readSegments(spark, s"$dir/edges")
    val hasTombs = Lsm.exists(s"$dir/tombstones")
    val merged =
      if (segmentCount(dir) <= 1) raw
      else raw.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    if (!hasTombs) merged
    else Lsm.dropTombstoned(spark, dir,
      Lsm.dropTombstoned(spark, dir, merged, "src"), "dst")
  }

  /** Persist a converged rank vector next to the edges — the warm-start
    * artifact for the iterative analytics family: the damped power
    * iteration is a contraction, so after an O(delta) absorb a handful
    * of iterations FROM THE LAST FIXPOINT replaces a cold re-run —
    * the rank analog of [[Bm25]] merging stats instead of rebuilding.
    * Overwrite-idempotent (replays land the same state). */
  def saveRanks(ranks: DataFrame, dir: String, name: String = "pagerank"): Unit = {
    val par = ranks.sparkSession.sparkContext.defaultParallelism
    ranks.select(col("id").cast("long").as("id"),
        col("rank").cast("double").as("rank"))
      .repartition(par, col("id"))
      .write.mode("overwrite").parquet(s"$dir/ranks/$name")
  }

  /** last persisted rank vector, if any */
  def loadRanks(spark: SparkSession, dir: String,
      name: String = "pagerank"): Option[DataFrame] =
    if (Lsm.exists(s"$dir/ranks/$name"))
      Some(spark.read.parquet(s"$dir/ranks/$name"))
    else None

  /** Warm-start maintenance hook (run after [[absorb]]): re-converge
    * pageRank over the CURRENT merged edges starting from the last
    * persisted vector (cold uniform start if none), persist and return
    * the refreshed ranks. New nodes enter at uniform; the init is
    * renormalized inside [[Graphs.pageRank]]. */
  def refreshPageRank(spark: SparkSession, dir: String, iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val ranks = Graphs.pageRank(read(spark, dir), "src", "dst", iterations,
      damping, weightCol = Some("w"), init = loadRanks(spark, dir))
    saveRanks(ranks, dir)
    ranks
  }

  /** [[refreshPageRank]]'s personalized sibling: warm-starts from the
    * per-seed-set rank slot (different seed sets converge to DIFFERENT
    * fixpoints, so the caller names the slot). */
  def refreshPpr(spark: SparkSession, dir: String, seeds: DataFrame,
      seedCol: String, slot: String, iterations: Int = 6,
      damping: Double = 0.85): DataFrame = {
    val ranks = Graphs.personalizedPageRank(read(spark, dir), "src", "dst",
      seeds, seedCol, iterations, damping, weightCol = Some("w"),
      init = loadRanks(spark, dir, s"ppr_$slot"))
    saveRanks(ranks, dir, s"ppr_$slot")
    ranks
  }

  /** [[refreshPageRank]]'s HITS sibling: the hub vector warm-starts the
    * power iteration (scale-invariant — [[Graphs.hits]] rescales it);
    * both end-normalized vectors persist for serving. */
  def refreshHits(spark: SparkSession, dir: String,
      iterations: Int = 20): DataFrame = {
    val ha = Graphs.hits(read(spark, dir), "src", "dst", iterations,
      weightCol = Some("w"),
      init = loadRanks(spark, dir, "hits_hub")).localCheckpoint()
    saveRanks(ha.select(col("id"), col("hub").as("rank")), dir, "hits_hub")
    saveRanks(ha.select(col("id"), col("authority").as("rank")), dir,
      "hits_authority")
    ha
  }

  /** fold segments + tombstones into one src-partitioned segment via
    * the crash-safe [[Lsm.swapIn]] protocol (stop-the-world contract:
    * no concurrent absorb) */
  def compact(spark: SparkSession, dir: String): Unit = {
    val par = spark.sparkContext.defaultParallelism
    read(spark, dir)
      .repartition(par, col("src"))
      .write.mode("overwrite").parquet(s"$dir/edges__compact/batch=compact")
    Lsm.swapInPath(s"$dir/edges")
    Lsm.clearTombstones(dir)
  }
}
