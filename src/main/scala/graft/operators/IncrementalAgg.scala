package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally maintained grouped aggregates — the materialized-view
  * pattern behind the reference's maintained statistics
  * (`cpp/deeplake_pg/column_statistics.cpp` keeps n_distinct/null_frac
  * current under DML; `sync_worker.cpp` folds appended chunks in).
  *
  * At 100 TB you never re-aggregate history to absorb a day of appends:
  * keep the aggregate STATE table (count / sum / min / max per key —
  * every algebraic aggregate), aggregate only the delta, and merge the
  * two states key-by-key. `merge(state(full)) == state(full)` by
  * associativity, so the maintained table is bit-identical to a full
  * recompute — which is exactly what the DuckDB oracle checks. Derived
  * values (avg = sum/count) come from a final projection, never stored.
  *
  * The merge is one hash-shuffle of two state tables (each one row per
  * key — tiny next to the corpus); the delta aggregation is the only
  * work proportional to new data.
  */
object IncrementalAgg {

  /** aggregate state of `df` grouped by `keys`: n, sum/min/max of `valueCol` */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("s"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** fold a delta's state into a maintained state: counts and sums add,
    * min/max fold — associative + commutative, so any merge order and
    * any delta batching gives the same table */
  def merge(prev: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** reader view with derived aggregates */
  def readout(st: DataFrame, keys: Seq[String]): DataFrame =
    st.select(keys.map(col) ++ Seq(col("n"),
      col("s"), (col("s") / col("n")).as("mean"), col("mn"), col("mx")): _*)
}
