package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations (the Delta Live Tables / Great Expectations
  * pattern): named boolean rules evaluated per row, map-side only — a
  * NULL rule result counts as a violation (an expectation you cannot
  * prove is not met). Three consumers of one annotation:
  * per-rule violation summaries for the quality dashboard, a valid-rows
  * stream for downstream, and a quarantine stream carrying WHY each row
  * failed. One projection, zero shuffles except the summary's single
  * aggregation.
  */
object Expectations {

  /** add `failed_expectations`: the (possibly empty) sorted array of
    * rule names this row violates */
  def annotate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    val flags = rules.map { case (name, cond) =>
      when(coalesce(cond, lit(false)), lit(null).cast("string")).otherwise(lit(name))
    }
    df.withColumn("failed_expectations",
      array_sort(filter(array(flags: _*), x => x.isNotNull)))
  }

  /** per-rule violation counts + fractions over the whole frame.
    * Internal agg columns are indexed (`__v_0` …), never derived from
    * rule names — a name containing dots or backticks (legal for
    * annotate/valid/quarantine) must not break the col() resolution
    * here. */
  def summary(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    val aggs = rules.zipWithIndex.map { case ((_, cond), i) =>
      sum((!coalesce(cond, lit(false))).cast("long")).as(s"__v_$i")
    }
    val counted = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      counted.select(lit(name).as("rule"),
        col(s"__v_$i").as("n_violations"),
        round(col(s"__v_$i") / greatest(col("__n"), lit(1L)), 6)
          .as("violation_frac"),
        col("__n").as("n_rows"))
    }
    rows.reduce(_.union(_))
  }

  /** rows meeting every expectation */
  def valid(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    annotate(df, rules).filter(size(col("failed_expectations")) === 0)
      .drop("failed_expectations")

  /** rows violating at least one, annotated with why */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    annotate(df, rules).filter(size(col("failed_expectations")) > 0)
}
