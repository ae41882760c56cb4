package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.EventAnalytics

/** Streaming maintenance of the CDC latest-state view
  * ([[EventAnalytics.latestSnapshot]]) in the LSM posture: every
  * micro-batch collapses to its OWN latest-per-key rows (one map-side
  * combinable max_by agg over the batch) appended as a segment — at
  * most one row per key per batch, nothing read-modify-writes. Readers
  * re-run the same aggregate over the segment rows: max_by over an
  * (order, id) struct is a semilattice, so merging per-batch maxima
  * equals the latest over all history, for ANY batch split.
  *
  * DELETE is an AS-OF tombstone `(key, as_of)` — "forget this entity's
  * state up to order `as_of`": readers drop the key's segment rows with
  * order ≤ as_of BEFORE the merge, so the key vanishes now but a LATER
  * arrival (order > as_of) re-opens it with only its new state — the
  * right-to-be-forgotten semantics a compacted changelog needs (a plain
  * key tombstone would suppress post-delete arrivals too). Compaction
  * rewrites the folded state as one segment and drops the tombstones
  * (crash-safe [[Lsm]] two-phase swap).
  */
object StreamingCdc {

  /** per-batch latest-per-key segment appended to `dir/state` */
  def maintain(stream: DataFrame, dir: String, keyCols: Seq[String],
      orderCol: String, idCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // restarted maintainer: complete an interrupted compaction swap
        // before appending — a recreated live dir would make recover
        // refuse the move and strand the compacted state. (Plain append
        // is replay-safe HERE because latest-state merge is a
        // semilattice: duplicate segments cannot change the answer.)
        Lsm.recover(dir, "state")
        EventAnalytics.latestSnapshot(batch, keyCols, orderCol, idCol)
          .write.mode("append").parquet(s"$dir/state")
        ()
      }
      .start()

  /** The up-to-date view: segments merged through the same semilattice
    * aggregate, as-of tombstones folded first. Tombstone segments carry
    * a FIXED schema `(__key_name, __key, __as_of)` — the key value is
    * string-normalized — so deletes issued under DIFFERENT key columns
    * coexist in one directory (heterogeneous parquet schemas would make
    * an arbitrary file's schema win and silently drop the other
    * deletes' tombstones). One fold pass per distinct key name (≤ the
    * key-column count). */
  def current(spark: SparkSession, dir: String, keyCols: Seq[String],
      orderCol: String, idCol: String): DataFrame = {
    Lsm.recover(dir, "state")
    val segs = spark.read.parquet(s"$dir/state")
    val live =
      if (Lsm.exists(s"$dir/tombstones")) {
        val t = spark.read.parquet(s"$dir/tombstones")
        val keyNames = t.select(col("__key_name")).distinct()
          .collect().map(_.getString(0))
        keyNames.foldLeft(segs) { (acc, keyName) =>
          // several deletes of one key: the latest as_of wins
          val t1 = t.filter(col("__key_name") === keyName)
            .groupBy(col("__key")).agg(max(col("__as_of")).as("__as_of"))
          acc.join(broadcast(t1),
              acc(keyName).cast("string") === t1("__key"), "left")
            .filter(col("__as_of").isNull || col(orderCol) > col("__as_of"))
            .drop("__key", "__as_of")
        }
      } else segs
    EventAnalytics.latestSnapshot(live, keyCols, orderCol, idCol)
  }

  /** Tombstone the entities' state up to `asOf` (one appended segment —
    * O(request), no history rewrite). `idKey` must be one of the view's
    * key columns; it is stored under the FIXED tombstone schema so
    * mixed-key deletes never produce heterogeneous parquet. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idKey: String, asOf: Long): Unit =
    ids.select(col(idKey).cast("string").as("__key")).distinct()
      .withColumn("__key_name", lit(idKey))
      .withColumn("__as_of", lit(asOf))
      .write.mode("append").parquet(s"$dir/tombstones")

  /** Stop-the-world LSM merge: rewrite the folded view as ONE segment,
    * drop the tombstones. Caller pauses the maintainer first. */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
      orderCol: String, idCol: String): Unit = {
    current(spark, dir, keyCols, orderCol, idCol)
      .write.mode("overwrite").parquet(s"$dir/state__compact")
    Lsm.swapIn(dir, "state")
    Lsm.clearTombstones(dir)
  }
}
