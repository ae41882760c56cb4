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

  /** DuckDB replay of [[graft.operators.Sampling.hashUniform]] — the 31-ary
    * fold of the md5 hex chars of expression `h` (already an md5 hex string),
    * yielding the same uniform in (0, 1] bit-for-bit. Shared by every
    * hash-seeded sampler oracle. */
  protected def uuSql(h: String): String =
    s"(list_reduce(list_prepend(0, list_transform(range(1,33), " +
      s"i -> ascii(substr($h, CAST(i AS INT), 1)))), " +
      s"(a, b) -> (a*31 + b) % 1000003) + 1) / 1000004.0"

  /** DuckDB replay of [[graft.operators.Sampling.hashUniformOpen]] — the
    * open-interval (+0.5) variant Gumbel keys need. */
  protected def uuOpenSql(h: String): String =
    s"(list_reduce(list_prepend(0, list_transform(range(1,33), " +
      s"i -> ascii(substr($h, CAST(i AS INT), 1)))), " +
      s"(a, b) -> (a*31 + b) % 1000003) + 0.5) / 1000004.0"

  /** DuckDB replay of the 60-bit md5-prefix hash key (Spark:
    * `conv(substring(md5(x),1,15),16,10)::long`) — base-16 fold of the
    * first 15 lowercase hex chars of md5 expression `m`, exact in
    * BIGINT. Shared by every KMV-sketch oracle. */
  protected def hex60Sql(m: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1,16), " +
      s"i -> CAST(CASE WHEN ascii(substr($m, CAST(i AS INT), 1)) >= 97 " +
      s"THEN ascii(substr($m, CAST(i AS INT), 1)) - 87 " +
      s"ELSE ascii(substr($m, CAST(i AS INT), 1)) - 48 END AS BIGINT))), " +
      s"(a, b) -> a*16 + b)"
}
