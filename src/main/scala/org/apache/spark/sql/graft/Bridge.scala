package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-private bridge for the v1 streaming Source contract: the
  * micro-batch engine asserts that `getBatch` frames carry
  * `isStreaming = true`, and the only constructor for such a frame is
  * `SparkSession.internalCreateDataFrame` — `private[sql]`, used the same
  * way by Spark's own `FileStreamSource`. This object exists solely to
  * cross that access boundary for `graft.sources.GraftTableSource`;
  * nothing else in the repo reaches into this package.
  */
object Bridge {

  def streamingDataFrame(s: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
