package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one-method bridge a V1 streaming `Source` needs: wrap an
  * ordinary (batch-composed) DataFrame's physical rows as a STREAMING
  * frame so `MicroBatchExecution` accepts it from `Source.getBatch`.
  *
  * `SparkSession.internalCreateDataFrame` is `private[sql]`, which is
  * exactly why this object lives under `org.apache.spark.sql` — the
  * same seam Spark's own external connectors compile against (the
  * Kafka source module sits in `org.apache.spark.sql.kafka010` for
  * this reason). Nothing else in the repo touches Spark-private API;
  * keeping the whole surface to one method in one file makes that
  * auditable.
  *
  * Why this is the right trade for the graft-atomic stream: the
  * table's read semantics are a DataFrame COMPOSITION (manifest-pruned
  * parquet scans, per-sequence-group anti-joins against standing
  * delete vectors — see `AtomicIncrement.readEffective`). A DSv2
  * `MicroBatchStream` would have to reproduce that join inside a
  * partition-local `PartitionReader`, reimplementing the dv algebra
  * row-by-row; handing the composed plan's `InternalRow` RDD to the
  * streaming runtime keeps Catalyst in charge (whole-stage codegen,
  * vectorized parquet, AQE-planned anti-joins) with the source
  * contributing only offsets and the file-window algebra.
  */
object StreamingFrameBridge {

  def streamingFrame(spark: SparkSession, batch: DataFrame,
      schema: StructType): DataFrame = {
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = batch.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.toRdd
    classic.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  /** The INVERSE wrap for a V1 streaming `Sink.addBatch`: the frame
    * the runtime hands in carries the incremental (isStreaming) plan,
    * so any batch action on it throws "streaming sources must be
    * executed with writeStream.start()". Re-wrap its physical rows as
    * a plain batch frame — literally what Spark's own
    * `ForeachBatchSink` does before invoking user code.
    */
  def batchFrame(streaming: DataFrame): DataFrame = {
    val spark = streaming.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = streaming.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema,
      isStreaming = false)
  }

  /** V2 `Predicate` → V1 `Filter`, via Spark's own converter (the one
    * its JDBC connector uses) rather than a hand-rolled re-walk of the
    * expression tree — `PredicateUtils` is `private[sql]`, hence its
    * exposure here. `None` = the predicate has no V1 equivalent; the
    * caller must refuse (DELETE) or treat as residual (scan pruning).
    */
  def toV1Filter(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}
