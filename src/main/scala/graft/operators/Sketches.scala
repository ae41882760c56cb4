package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based column statistics — the 100 TB replacement for the exact
  * forms (reference maintains exact n_distinct/MCV per column at its
  * single-node scale, `cpp/deeplake_pg/column_statistics.cpp:278-345`;
  * at cluster scale the exact computation is a full shuffle of every
  * value, while sketches are fixed-size, mergeable map-side state).
  *
  * - distinct count: HyperLogLog++ (`approx_count_distinct`, default
  *   ~2.3% rsd) — constant memory per partition, one partial-agg pass
  * - percentiles: the Greenwald-Khanna-style `percentile_approx` with an
  *   accuracy knob — bounded-size mergeable summaries
  *
  * Both are Spark built-ins (codegen'd partial aggregation), so a
  * profile over N columns is ONE scan with map-side combine, no joins.
  */
object Sketches {

  /** per-group sketch profile of `valueCol`: approximate distinct count
    * and p50/p95/p99, plus exact count/min/max which are free in the
    * same pass */
  def profile(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.023, percentileAccuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        percentile_approx(col(valueCol),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(percentileAccuracy))
          .as("p50_p95_p99"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))
}
