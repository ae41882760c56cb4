package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-dense map stages (optimization guide
  * §2.6 — idle capacity).
  *
  * A narrow scan (one small parquet file, a collapsed count table)
  * arrives in a handful of input splits, and AQE coalesces downstream
  * shuffles by BYTES — both are correct for byte-bound stages and
  * dead wrong for FLOP-bound ones (per-row kernels: cosine towers,
  * n-gram explodes, LM scoring joins), which end up nearly serial on a
  * 32-core executor (measured: q_ccnet_buckets ran 29 single-task
  * stages; q_vec_knn_shapley's dominant stage used 6 of 32 cores).
  *
  * `spread` round-robins such an input across at least the default
  * parallelism — ONLY when it currently has fewer partitions, so a
  * real-scale input that already carries >= cores partitions passes
  * through untouched (the repartition must never SHRINK a big scan).
  * The shuffle it introduces moves the narrow pre-explode rows — the
  * cheap side of the stage by construction.
  */
object Par {
  /** df spread to >= defaultParallelism partitions iff it has fewer.
    *
    * ONLY for exchange-free inputs (scan/filter/project): the partition
    * probe goes through `df.rdd`, and under AQE that finalizes the plan
    * — on a plan with shuffles it would eagerly execute the upstream
    * query stages just to count partitions. Downstream of a shuffle,
    * pin parallelism with an explicit keyed `repartition(par, cols...)`
    * instead (exempt from AQE byte-coalescing by construction). */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }
}
