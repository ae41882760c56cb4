package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

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

  /** Schema-drift audit between two snapshots of "the same" table —
    * the data-contract check an ingest pipeline runs before swapping a
    * new partition in. One row per column in EITHER schema:
    * `(column, type_ref, type_cur, status, null_rate_ref, null_rate_cur,
    * mean_ref, mean_cur)` with status ∈ added | removed | type_changed |
    * ok; means only for numeric columns (NULL otherwise), so a silent
    * unit change (ms → s) surfaces as a mean shift even when the type
    * and null profile look identical.
    *
    * Scale shape: each side pays ONE aggregate computing every column's
    * null count (+ mean for numerics) in a single pass — a 1-row,
    * schema-wide result. The schema comparison itself is metadata.
    * Output is schema-sized (bounded), assembled driver-side. */
  def schemaDrift(ref: DataFrame, cur: DataFrame): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    def profile(df: DataFrame): Map[String, (Double, Option[Double])] = {
      val fields = df.schema.fields
      val exprs = count(lit(1)).cast("double").as("__n") +:
        fields.toSeq.flatMap { f =>
          sum(when(col(f.name).isNull, 1).otherwise(0)).cast("double")
            .as(s"__null_${f.name}") +:
            (if (f.dataType.isInstanceOf[NumericType])
              Seq(avg(col(f.name).cast("double")).as(s"__mean_${f.name}"))
            else Nil)
        }
      val row = df.agg(exprs.head, exprs.tail: _*).head()
      val n = row.getAs[Double]("__n")
      fields.map { f =>
        val nulls = row.getAs[Double](s"__null_${f.name}")
        val rate = if (n > 0) nulls / n else 0.0
        val mean =
          if (f.dataType.isInstanceOf[NumericType])
            Option(row.getAs[Any](s"__mean_${f.name}"))
              .map(_.asInstanceOf[Double])
          else None
        f.name -> (rate, mean)
      }.toMap
    }
    val refTypes = ref.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val curTypes = cur.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rp = profile(ref)
    val cp = profile(cur)
    // HALF_UP to match Spark's round() / the DuckDB oracle's round()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (refTypes.keySet ++ curTypes.keySet).toSeq.sorted.map { c =>
      val status = (refTypes.get(c), curTypes.get(c)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _ => "ok"
      }
      (c, refTypes.get(c), curTypes.get(c), status,
        rp.get(c).map(v => r6(v._1)), cp.get(c).map(v => r6(v._1)),
        rp.get(c).flatMap(_._2).map(r6), cp.get(c).flatMap(_._2).map(r6))
    }
    rows.toDF("column", "type_ref", "type_cur", "status",
      "null_rate_ref", "null_rate_cur", "mean_ref", "mean_cur")
  }
}
