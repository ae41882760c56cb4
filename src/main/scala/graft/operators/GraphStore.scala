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
    val raw = Lsm.readSegments(spark, s"$dir/edges")
    val hasTombs = Lsm.exists(s"$dir/tombstones")
    val merged =
      if (segmentCount(dir) <= 1) raw
      else raw.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    if (!hasTombs) merged
    else Lsm.dropTombstoned(spark, dir,
      Lsm.dropTombstoned(spark, dir, merged, "src"), "dst")
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
