package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark build function plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Determinism contract (driver hash-compares Spark output vs DuckDB):
  *  - every query ends with a total ORDER BY (unique tiebreaker included)
  *  - float aggregates are round()ed in BOTH implementations
  *  - aggregate/computed columns carry the same alias on both sides
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

trait QueryModule {
  /** ordered (name -> query) pairs */
  def qs: Seq[(String, Q)]

  protected def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(spark, dir, name)
}
