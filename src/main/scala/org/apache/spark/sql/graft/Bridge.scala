package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Classic-runtime bridge between the public Column API and Catalyst
  * Expressions (Spark 4 moved Column onto ColumnNode; the conversion
  * helpers are private[sql], so this shim lives under the sql package —
  * the usual pattern for Spark extension libraries).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a SQL-callable function. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  // ---------------------------------------------------------- Arrow IPC

  /** Serialized Arrow record batches of the frame's plan — Spark's own
    * columnar encoder (the wire path PySpark's toPandas/dataloader rides),
    * one RDD partition per plan partition. Batch height follows
    * `spark.sql.execution.arrow.maxRecordsPerBatch` at CALL time. */
  def arrowBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].toArrowBatchRdd

  /** Write one Arrow IPC STREAM — schema header, the given serialized
    * record batches, end-of-stream — to `out`. Executor-safe (no session
    * state touched). `largeVarTypes` MUST match the session conf the
    * batches were encoded under (`toArrowBatchRdd` reads
    * spark.sql.execution.arrow.useLargeVarTypes): a header declaring
    * VarChar over LargeVarChar payloads makes the stream undecodable. */
  def writeArrowStream(schema: StructType, timeZoneId: String,
      batches: Iterator[Array[Byte]], out: java.io.OutputStream,
      largeVarTypes: Boolean = false): Unit = {
    val w = new ArrowBatchStreamWriter(schema, out, timeZoneId,
      true, largeVarTypes)
    w.writeBatches(batches)
    w.end()
  }

  /** The session's Arrow large-var-types setting — what
    * [[arrowBatchRdd]]'s encoder will use; capture it driver-side and
    * pass to [[writeArrowStream]] in executor tasks. */
  def arrowLargeVarTypes(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.arrowUseLargeVarTypes

  /** The serialized record-batch messages of one IPC stream file
    * (schema header and EOS stripped). */
  def readArrowStream(path: String): Array[Array[Byte]] =
    ArrowConverters.readArrowStreamFromFile(path)

  /** Rebuild a DataFrame from serialized Arrow record batches + the
    * Spark schema JSON they were encoded with. */
  def dataFrameFromArrowBatches(spark: SparkSession, schemaJson: String,
      batches: Iterator[Array[Byte]]): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
