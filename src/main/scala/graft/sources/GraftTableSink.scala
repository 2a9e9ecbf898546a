package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.streaming.OutputMode

/** Native streaming sink for `format("graft-table")` — the write half of
  * the table's streaming story, so a user's existing Delta-style pipeline
  *
  * {{{
  *   df.writeStream.format("graft-table")
  *     .option("path", tableDir)
  *     .option("checkpointLocation", ckpt)   // or .option("appId", ...)
  *     .outputMode("append")                 // or "complete"
  *     .start()
  * }}}
  *
  * runs unchanged — no `foreachBatch` wiring required ([[GraftTable
  * .sinkInto]] remains for programmatic composition; both share the same
  * commit machinery underneath, so they are interchangeable).
  *
  * A V1 [[Sink]] by the same reasoning as the batch-read split
  * ([[GraftTableV2.capabilities]]): the V1 surface hands `addBatch` a
  * DataFrame, which reuses the table layer's whole commit path — parquet
  * write, per-file manifest stats, additive schema evolution, the
  * (appId, batchId) exactly-once token — where a DSv2 `StreamingWrite`
  * would demand a from-scratch row-at-a-time parquet writer for no
  * behavioral gain (Delta ships the same V1-sink shape). The frame that
  * arrives carries the already-executed incremental plan; re-planning it
  * through `df.write` would throw, so the sink rewraps the computed
  * [[org.apache.spark.sql.catalyst.InternalRow]] RDD as a batch frame
  * ([[GraftShims.internalDf]]) and hands it to the commit.
  *
  * Exactly-once: Append mode routes through [[GraftTable
  * .exactlyOnceAppend]], Complete mode (a continuously-maintained
  * aggregate table) through [[GraftTable.exactlyOnceComplete]] — each
  * records the (appId, batchId) token in the commit manifest, so a
  * micro-batch re-delivered after crash recovery is a no-op. `appId`
  * defaults to a fingerprint of the query's `checkpointLocation` — the
  * one identity that is stable across restarts of the same logical
  * stream and distinct between different streams. Update mode refuses:
  * it re-emits changed ROWS without their old identities, which an
  * append-only commit cannot represent (use `foreachBatch` with
  * [[GraftTable.upsert]] for keyed upsert maintenance).
  */
class GraftTableSink(ctx: SQLContext, dir: String, appId: String,
                     declaredStats: Seq[String], mode: OutputMode)
  extends Sink {

  // The provider's createSink refuses Update mode, but the invariant must
  // hold regardless of construction path (tests and programmatic callers
  // build the sink directly) — Update-mode re-emissions would silently
  // append as duplicate rows.
  require(mode == OutputMode.Append() || mode == OutputMode.Complete(),
    s"graft-table sink supports Append and Complete, not $mode — use " +
      "foreachBatch with GraftTable.upsert for keyed Update maintenance")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val s = ctx.sparkSession
    val batch = GraftShims.internalDf(data.sparkSession,
      data.queryExecution.toRdd, data.schema)
    // first batch of a fresh table honors the declared statsColumns; once
    // the table exists the manifest IS the declaration (batch-writer rule).
    // A BOUNDLESS head (no snapshot's files carry bounds — e.g. batch 0
    // delivered zero rows, so the create wrote no files) yields Nil from
    // statsColsOf: the stream's declaration must survive that, not die on
    // a disagreement check against an empty declaration — otherwise an
    // empty first micro-batch would permanently erase the skipping schema
    // and fail every later batch of the same query.
    val stats = GraftTable.currentVersion(dir) match {
      case None => declaredStats
      case Some(_) =>
        val existing = GraftTable.statsColsOf(dir)
        if (existing.isEmpty) declaredStats
        else {
          require(declaredStats.isEmpty || declaredStats.sorted == existing,
            s"statsColumns ${declaredStats.mkString(",")} disagree with the " +
              s"table's manifest-declared ${existing.mkString(",")} — the " +
              "skipping schema is fixed at create time")
          existing
        }
    }
    if (mode == OutputMode.Complete())
      GraftTable.exactlyOnceComplete(s, dir, batch, appId, batchId, stats)
    else
      GraftTable.exactlyOnceAppend(s, dir, batch, appId, batchId, stats)
    ()
  }
}
