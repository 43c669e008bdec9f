package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Mark a batch DataFrame as streaming output for a V1 `Source.getBatch`.
  *
  * MicroBatchExecution asserts every plan a source returns has
  * `isStreaming = true`, but that flag lives on logical-plan LEAVES and the
  * API to set it (`internalCreateDataFrame(..., isStreaming)`) is
  * `private[sql]` — the same reach-in FileStreamSource and the Delta
  * source use from inside the `sql` package, bridged here for
  * [[graft.sql.GraftStreamSource]] (same rationale as [[SessionBridge]]).
  * The wrap keeps the inner plan's compiled RDD (pushdown and codegen
  * already applied), re-rooted as a streaming LogicalRDD leaf. */
object StreamingBridge {

  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(cs.sparkContext.emptyRDD[InternalRow], schema,
      isStreaming = true)
  }
}
