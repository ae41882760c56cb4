package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points joined to the intervals containing
  * them. Spark plans the naive `p BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin — O(|points| x |intervals|) and a broadcast
  * of a whole side; at 100 TB that's the canonical scale-killer.
  *
  * The bucketed form turns it into an equi-join: points land in the
  * fixed-width bin containing them, each interval EXPLODES across every
  * bin it overlaps, the join key becomes (keys..., bin), and the exact
  * `BETWEEN` runs as a residual filter on the (tiny) candidate set. Each
  * (point, interval) pair shares exactly one bin — the point's — so no
  * dedup is needed. Pick `binWidth` near the typical interval length:
  * candidates per point stay O(intervals overlapping its bin) and the
  * explode factor stays O(interval/binWidth + 1).
  */
object RangeJoin {

  /** points(pCol + keyCols) ⋈ intervals(loCol, hiCol + keyCols), inner,
    * `lo <= p <= hi`, equi on keyCols + bin. All of pCol/loCol/hiCol are
    * long-valued (timestamps as epoch integers). */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keyCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, keyCols :+ "__bin")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }
}
