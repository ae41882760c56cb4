package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Mechanically-bounded global windows.
  *
  * A handful of operators rank a WHOLE frame: vocab top-K dense ids, RRF
  * candidate ranks, distinct-domain slots, numPartitions-row offset
  * prefix sums. Each frame is bounded by construction — a `limit`, a
  * distinct over a low-cardinality key, a per-partition aggregate — but a
  * bare `Window.orderBy(...)` keeps that invariant by convention only:
  * Spark plans an unpartitioned WindowExec, logs `No Partition Defined`,
  * and an accidental data-sized global window would hide in the same
  * warning noise.
  *
  * [[over]] makes the bound mechanical: the frame is collapsed to one
  * partition and windowed under a literal partition key (a PARTITIONED
  * WindowExec — no warning, so the PlanSpec gate can assert that NO
  * unpartitioned window exists anywhere in any registered query), and a
  * codegen'd `assert_true` fails the query outright if the frame exceeds
  * `maxRows` — a bound violation is an error, not a silently slow job.
  */
object BoundedWindow {
  private val G = "__bw_g"
  private val N = "__bw_n"

  /** Window `df` (≤ `maxRows` rows, enforced at runtime) inside one
    * literal-keyed partition. `f` receives the framed DataFrame and the
    * partition-keyed [[WindowSpec]] base — add `.orderBy`/frame clauses
    * to it. Helper columns are dropped on the way out. */
  def over(df: DataFrame, maxRows: Long)(
      f: (DataFrame, WindowSpec) => DataFrame): DataFrame = {
    val base = Window.partitionBy(col(G))
    // the key must be constant-0 (the 1-partition exchange guarantees
    // it) yet NON-FOLDABLE — Catalyst strips literal partition keys,
    // which would silently restore the unpartitioned WindowExec this
    // helper exists to eliminate; spark_partition_id() is
    // nondeterministic so it survives. repartition(1), NOT coalesce(1):
    // coalesce fuses the UPSTREAM plan (often a data-sized aggregation)
    // into a single task, serializing it; repartition adds a stage
    // boundary so only the bounded output crosses to one partition.
    val framed = df.repartition(1).withColumn(G, spark_partition_id())
      .withColumn(N, count(lit(1)).over(base))
      // assert_true returns NULL iff the bound holds; the filter keeps it
      // un-prunable (a dropped column would be optimized away unevaluated)
      .where(assert_true(col(N) <= lit(maxRows),
        lit(s"bounded global window exceeded $maxRows rows")).isNull)
    f(framed, base).drop(G, N)
  }

  /** The common shape: a row_number over the bounded frame. */
  def rank(df: DataFrame, out: String, maxRows: Long, zeroBased: Boolean,
      order: Column*): DataFrame =
    over(df, maxRows) { (d, w) =>
      val rn = row_number().over(w.orderBy(order: _*))
      d.withColumn(out, if (zeroBased) rn - 1 else rn)
    }
}
