package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge into `private[sql]` streaming internals: a V1 `Source.getBatch`
  * must return a DataFrame whose logical plan is flagged `isStreaming` —
  * MicroBatchExecution asserts it — and the only way to produce one from
  * a batch plan is `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`, which is `private[sql]`. Same technique as
  * [[ColumnBridge]]. */
object StreamBridge {
  /** Re-wrap a batch DataFrame as a streaming-flagged one (the physical
    * work is unchanged — the batch plan's RDD is handed over as-is). */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
