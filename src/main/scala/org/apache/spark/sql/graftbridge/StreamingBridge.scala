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

  /** The inverse wrap for a V1 `Sink.addBatch`: the micro-batch DataFrame
    * the engine hands a sink still carries `isStreaming = true` leaves, so
    * batch writer APIs refuse it (CALL_ON_STREAMING_DATASET_UNSUPPORTED).
    * Re-root its compiled RDD as a plain batch LogicalRDD — one execution,
    * the same move DeltaSink makes by dropping to FileFormatWriter below
    * the analyzer. */
  def asBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(cs.sparkContext.emptyRDD[InternalRow], schema,
      isStreaming = true)
  }

  /** A V1 `StreamingRelation` leaf for `provider` — what
    * `spark.readStream.format(provider).options(...).load()` plants, built
    * directly so an analyzer rule can swap a catalog-resolved
    * `StreamingRelationV2` onto the V1 source path
    * (`DataSource`/`StreamingRelation` are `private[sql]`). */
  def v1StreamingRelation(spark: SparkSession, provider: String,
                          options: Map[String, String])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    org.apache.spark.sql.execution.streaming.runtime.StreamingRelation(
      org.apache.spark.sql.execution.datasources.DataSource(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        className = provider, options = options))
}
