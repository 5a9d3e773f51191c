package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A v1 streaming `Source.getBatch` must hand MicroBatchExecution a
  * DataFrame whose logical plan carries `isStreaming = true`, and the
  * only public-API-adjacent way to build one from an arbitrary batch
  * plan is the package-private `SparkSession.internalCreateDataFrame` —
  * the same door Delta Lake's own `DeltaSource` walks through. This
  * one-method shim lives under `org.apache.spark.sql` solely to reach
  * it; all real logic stays in `graft.sources.LakeStreamSource`.
  *
  * The batch plan is captured as its compiled RDD
  * (`queryExecution.toRdd`), so the streaming wrapper adds no second
  * planning pass and the rows the micro-batch sees are exactly the rows
  * the underlying lake read plans.
  */
object GraftStreamShim {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse door, for the SINK side: `Sink.addBatch`'s DataFrame
    * wraps the micro-batch's IncrementalExecution, so re-planning it
    * through `df.write` would re-analyze a logical plan that still
    * contains streaming leaves and fail. Rebasing onto the executed RDD
    * (the same trick Delta's `DeltaSink` uses) yields a plain batch
    * frame the lake's commit paths can write — without executing the
    * batch twice.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
