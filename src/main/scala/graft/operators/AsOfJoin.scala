package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the LATEST right row with
  * `right.time <= left.time` for the same key — the event-time feature
  * lookup every training pipeline needs (join each sample to the most
  * recent label/feature/state as of its timestamp) and a first-class
  * operator in temporal engines (DuckDB `ASOF JOIN`, which is exactly
  * what the driver oracle uses).
  *
  * Spark has no native as-of join, and the naive formulation — a range
  * non-equi join plus a per-left-row max — plans as a
  * BroadcastNestedLoopJoin. This implementation is the scale-safe
  * union form: tag both sides, ONE hash-shuffle on the key, sort within
  * partitions by (time, side), and carry the most recent right value
  * forward with `last(ignoreNulls) OVER (rows unbounded preceding)` —
  * the same cost class as a sort-merge join. Right rows sort BEFORE left
  * rows at equal timestamps, giving the conventional `<=` semantics.
  *
  * `right` must be unique per (key, time) — pre-aggregate it otherwise
  * (duplicate right timestamps make "the" as-of row ambiguous in any
  * engine). Inner semantics: left rows with no earlier right row drop;
  * pass `keepUnmatched = true` for the left-outer form.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightValueCols: Seq[String], keepUnmatched: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col) ++
        rightValueCols.map(c => lit(null).cast(
          right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col) ++
        rightValueCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
    if (keepUnmatched) carried
    else carried.filter(rightValueCols.map(c => col(c).isNotNull).reduce(_ && _))
  }
}
