package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export SHARD assignment (round-11 directive #6): give every doc
  * a deterministic `shard_id` by packing docs in stable `doc_id` order
  * until each shard holds ~`targetTokens` tokens — the layout step before
  * writing a tokenized corpus as fixed-budget training shards.
  *
  * Contract (exact integer arithmetic, engine-portable): a doc's shard is
  *   `shard_id = (Σ tokens of all docs with smaller doc_id) DIV target`
  * — the EXCLUSIVE prefix sum, so a doc starts in the shard where its
  * first token lands. Deterministic across engines, runs, partitionings;
  * append-stable for doc_ids appended in increasing order (an arriving doc
  * never moves an existing doc's shard).
  *
  * Scale shape — the distributed prefix sum, NOT a global window: a
  * single `ORDER BY doc_id ROWS UNBOUNDED PRECEDING` window funnels the
  * corpus through ONE partition. Instead:
  *   1. docs roll up to GROUP token totals (`doc_id DIV groupSize` — one
  *      map-side-combined aggregation, corpus/groupSize rows out);
  *   2. group EXCLUSIVE offsets come from a window over the group frame —
  *      the only serial stage, groupSize× smaller than the corpus: at the
  *      default 4096 that is ~2.4M 3-scalar rows for 10^10 docs, a few MB
  *      through one task (recurse the same trick for another groupSize×
  *      if ever needed);
  *   3. the within-group running sum is a doc-ordered window PARTITIONED
  *      by group — fully parallel — plus the broadcast group offset.
  */
object ShardPack {

  /** Adds `shard_id` (BIGINT) to `docs`. `docs` must carry a unique
    * non-negative integral `doc_id` and the token count column `tokCol`.
    * `startTokens` offsets the prefix sum — the carry of everything
    * already exported (see [[appendAssign]]); 0 for a one-shot layout. */
  def assignShards(docs: DataFrame, tokCol: String, targetTokens: Long,
                   groupSize: Long = 4096L, startTokens: Long = 0L): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive: $targetTokens")
    require(groupSize > 0, s"groupSize must be positive: $groupSize")
    require(startTokens >= 0, s"startTokens must be non-negative: $startTokens")
    val g = docs.withColumn("_g", expr(s"doc_id DIV $groupSize"))
    // graft:allow-global-window — the deliberate reduced serial stage of
    // the distributed prefix sum: it runs over corpus/groupSize GROUP rows
    // (3 tiny scalars each; ~2.4M rows for 10^10 docs at the default 4096),
    // after the corpus-sized work was cut down by a map-side-combined
    // rollup. Every corpus-sized window below is partitioned.
    val wGroups = Window.orderBy(col("_g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val groupOffsets = g.groupBy(col("_g"))
      .agg(sum(col(tokCol)).as("_gt"))
      .withColumn("_goff", coalesce(sum(col("_gt")).over(wGroups), lit(0L)))
      .drop("_gt")
    val wInGroup = Window.partitionBy(col("_g"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.join(broadcast(groupOffsets), Seq("_g"))
      .withColumn("_cum0",
        lit(startTokens) + col("_goff") +
          coalesce(sum(col(tokCol)).over(wInGroup), lit(0L)))
      .withColumn("shard_id", expr(s"_cum0 DIV $targetTokens"))
      .drop("_g", "_goff", "_cum0")
  }

  /** CONTINUOUS shard export — the incremental member of the export
    * family (dedup has d14/d16/d18, vectors v10/v11, trajectories t28,
    * retrieval the d21 twin; this is the dataloader end): an ARRIVING doc
    * batch is shard-assigned against everything already exported and
    * appended to the versioned table as one atomic commit.
    *
    * The carry is the table's total token count (one slim column
    * aggregate over the head — exact, append-only), so by construction
    *   appendAssign(b₁); appendAssign(b₂); … ≡ assignShards(b₁ ∪ b₂ ∪ …)
    * — the append-stability theorem p36's contract claims, proven by
    * test. The arriving batch must carry doc_ids strictly above the
    * table's max (the append convention p28/p36 document); anything else
    * would retroactively move exported docs' shards, so it refuses. */
  def appendAssign(s: org.apache.spark.sql.SparkSession, tableDir: String,
                   batch: DataFrame, tokCol: String, targetTokens: Long,
                   groupSize: Long = 4096L): Int = {
    val gt = graft.sources.GraftTable
    val head = gt.currentVersion(tableDir)
    val (carry, maxId) = head match {
      case None => (0L, -1L)
      case Some(_) =>
        val r = gt.read(s, tableDir)
          .agg(sum(col(tokCol)), max(col("doc_id"))).collect()(0)
        (if (r.isNullAt(0)) 0L else r.getLong(0),
         if (r.isNullAt(1)) -1L else r.getLong(1))
    }
    val minNew = batch.agg(min(col("doc_id"))).collect()(0)
    require(!minNew.isNullAt(0), "appendAssign: empty batch")
    require(minNew.getLong(0) > maxId,
      s"appendAssign: batch min doc_id ${minNew.getLong(0)} must exceed the " +
        s"table's max $maxId — out-of-order arrivals would retroactively " +
        "move exported docs' shards")
    val assigned = assignShards(batch, tokCol, targetTokens, groupSize, carry)
      .repartitionByRange(col("shard_id"))
    if (head.isEmpty) gt.create(s, tableDir, assigned, Seq("shard_id"))
    else gt.append(s, tableDir, assigned, Seq("shard_id"))
  }
}
