package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit (the dbt-test / Deequ-style relationship
  * check): does every foreign key in a child table resolve to a parent
  * row? At corpus scale broken lineage silently drops joins — an
  * inner-join pipeline loses the orphaned rows without an error, so the
  * audit quantifies the loss BEFORE the pipeline runs.
  */
object Integrity {

  /** One-row FK audit of `child.fkCol` against `parent.pkCol`:
    * `(child_rows, nonnull_rows, distinct_fk, orphan_rows, orphan_keys,
    * fk_coverage)` where fk_coverage is the fraction of NON-NULL child
    * rows whose key resolves (NULL keys are excluded from coverage —
    * SQL FK semantics — but reported via child_rows − nonnull_rows).
    *
    * Scale shape: Catalyst specializes each consumer of the per-key
    * frame — the distinct count becomes a plain distinct aggregate (no
    * per-key counts carried), and the orphan branch's anti-join pushes
    * BELOW its aggregate — so every branch is scan → partial agg →
    * scalar, and orphan detection anti-joins against the parent's
    * distinct keys (broadcast or shuffled by AQE at the parent's real
    * size). No branch pays more than one scan + one aggregate. */
  def fkAudit(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val fk = child.select(col(fkCol).as("__fk"))
    val totals = fk.agg(
      count(lit(1)).as("child_rows"),
      count(col("__fk")).as("nonnull_rows"))
    val perKey = fk.filter(col("__fk").isNotNull)
      .groupBy(col("__fk")).agg(count(lit(1)).as("n"))
    val distinctFk = perKey.agg(count(lit(1)).as("distinct_fk"))
    val orphans = perKey
      .join(parent.select(col(pkCol).as("__fk")).distinct(),
        Seq("__fk"), "left_anti")
      .agg(coalesce(sum(col("n")), lit(0L)).as("orphan_rows"),
        count(lit(1)).as("orphan_keys"))
    totals.crossJoin(broadcast(distinctFk)).crossJoin(broadcast(orphans))
      .select(
        col("child_rows").cast("long").as("child_rows"),
        col("nonnull_rows").cast("long").as("nonnull_rows"),
        col("distinct_fk").cast("long").as("distinct_fk"),
        col("orphan_rows").cast("long").as("orphan_rows"),
        col("orphan_keys").cast("long").as("orphan_keys"),
        round(when(col("nonnull_rows") === 0, 1.0)
          .otherwise(lit(1.0) - col("orphan_rows").cast("double") /
            col("nonnull_rows")), 6).as("fk_coverage"))
  }
}
