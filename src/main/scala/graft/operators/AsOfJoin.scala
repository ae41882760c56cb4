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
  *
  * The carried state is the whole right row packed as a struct, not the
  * individual value columns: a right row whose value column is genuinely
  * NULL still *matches* (the left row gets that NULL, exactly like
  * DuckDB ASOF) instead of the window reaching past it to an older
  * non-null value. `rightValueCols` must be disjoint from the left
  * frame's columns — a collision would yield duplicate output names.
  */
object AsOfJoin {

  /** `direction`: "backward" (latest right with rt <= lt — the default
    * and DuckDB's `l.ts >= r.ts`) or "forward" (EARLIEST right with
    * rt >= lt — the upcoming-event lookup; DuckDB's `l.ts <= r.ts`).
    * Forward is the same one-shuffle union-window plan scanned in
    * descending time order, with right still sorting before left at
    * equal timestamps so `>=` stays inclusive.
    *
    * `tolerance`: maximum staleness (backward) / lead (forward) in the
    * time column's own units — a match farther than this from the left
    * row is no match at all (pandas merge_asof's tolerance). Requires a
    * numeric time column. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightValueCols: Seq[String], keepUnmatched: Boolean = false,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward")(direction),
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val leftCarry = leftCols.filterNot(c => c == keyCol || c == timeCol)
    val collisions = rightValueCols.intersect(leftCols)
    require(collisions.isEmpty,
      s"rightValueCols collide with left columns: ${collisions.mkString(", ")}")
    // the nearest right ROW travels as one nullable struct: non-null
    // whenever a right row exists, even if every value inside is NULL.
    // The right TIME rides inside it so tolerance can compare after the
    // window without a second join.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("__rt", right.schema(timeCol).dataType))
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftCarry.map(col) :+
        lit(null).cast(payloadType).as("__r_payload"): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftCarry.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col) :+ col(timeCol).as("__rt"): _*)
          .as("__r_payload"): _*)
    val timeOrd =
      if (direction == "backward") col(timeCol).asc else col(timeCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(timeOrd, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__r0", last(col("__r_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withinTol = tolerance match {
      case None => col("__r0").isNotNull
      case Some(t) =>
        val gap =
          if (direction == "backward") col(timeCol) - col("__r0").getField("__rt")
          else col("__r0").getField("__rt") - col(timeCol)
        col("__r0").isNotNull && gap <= t
    }
    val resolved = carried.withColumn("__r",
      when(withinTol, col("__r0")).otherwise(lit(null).cast(payloadType)))
    val matched =
      if (keepUnmatched) resolved else resolved.filter(col("__r").isNotNull)
    matched.select(Seq(col(keyCol), col(timeCol)) ++
      leftCarry.map(col) ++
      rightValueCols.map(c => col("__r").getField(c).as(c)): _*)
  }
}
