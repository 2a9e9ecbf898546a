package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MetricUdfs

/** Reference O15 — the flagship query of the DFT system: given a query
  * trajectory, return the k most similar trajectories under Hausdorff or
  * discrete Fréchet distance.
  *
  * Spark-first shape: the 1-row query trajectory is broadcast (the reference
  * broadcasts its query the same way), distances are computed partition-
  * local over the per-user array table, and top-k is
  * `TakeOrderedAndProject` (per-partition heap, driver merges k rows). At
  * 10⁸ trajectories the pair scan gains the reference's bound-seeding: a
  * cheap scalar lower bound in the join condition before the exact kernel —
  * the same bound-then-refine pattern implemented for vectors in
  * VectorOps.cosineSelfJoin.
  */
object TrajectorySearch {

  def topK(s: SparkSession, dir: String, queryUser: Long = 0L, k: Int = 10,
           metric: String = "hausdorff", eventType: String = "purchase"): DataFrame =
    topKOf(Tables.trajArrays(s, dir, eventType), queryUser, k, metric)

  def topKOf(ta: DataFrame, queryUser: Long, k: Int, metric: String): DataFrame = {
    val fn = metricFn(metric)
    val q = ta.filter(col("user_id") === queryUser)
      .select(col("xs").as("qxs"), col("ys").as("qys"))
    ta.filter(col("user_id") =!= queryUser)
      .crossJoin(broadcast(q))
      .select(col("user_id"),
        round(fn(col("xs"), col("ys"), col("qxs"), col("qys")), 6).as("dist"))
      .orderBy(col("dist"), col("user_id"))
      .limit(k)
  }

  private def metricFn(metric: String) = metric match {
    case "hausdorff" => MetricUdfs.hausdorff
    case "frechet" => MetricUdfs.frechet
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** Per-user bounding boxes plus the cheap lower bound against the query's
    * box: `d(boxA, boxB) ≤ min-point-distance ≤ Hausdorff ≤ Fréchet`.
    * Pure scalar arithmetic — evaluated inside codegen, no kernel calls. */
  private def withLowerBound(ta: DataFrame, queryUser: Long): (DataFrame, DataFrame) = {
    val boxed = ta.select(col("user_id"), col("xs"), col("ys"),
      array_min(col("xs")).as("minx"), array_max(col("xs")).as("maxx"),
      array_min(col("ys")).as("miny"), array_max(col("ys")).as("maxy"))
    val q = boxed.filter(col("user_id") === queryUser)
      .select(col("xs").as("qxs"), col("ys").as("qys"),
        col("minx").as("qminx"), col("maxx").as("qmaxx"),
        col("miny").as("qminy"), col("maxy").as("qmaxy"))
    val dx = greatest(lit(0.0), col("minx") - col("qmaxx"), col("qminx") - col("maxx"))
    val dy = greatest(lit(0.0), col("miny") - col("qmaxy"), col("qminy") - col("maxy"))
    val cands = boxed.filter(col("user_id") =!= queryUser)
      .crossJoin(broadcast(q))
      .withColumn("lb", sqrt(dx * dx + dy * dy))
    (cands, q)
  }

  /** Reference O11/O13 bound-seeding + refinement, relationally:
    *
    *  1. SEED: exact-evaluate the `seedFactor·k` candidates with the
    *     smallest box lower bound; the k-th smallest exact distance is an
    *     upper bound `r` on the answer's k-th distance.
    *  2. PRUNE+REFINE: exact kernel only where `lb ≤ r` (+ float margin) —
    *     every discarded candidate has distance ≥ lb > r, so the result is
    *     exactly `topKOf`'s (TrajectorySearchTest asserts equality, and that
    *     pruning actually fires on spatially separated data).
    *
    * The two driver-side values (seed threshold) are bounded scalars — the
    * same driver footprint as the reference's bound seeding.
    */
  def topKPruned(ta: DataFrame, queryUser: Long, k: Int, metric: String,
                 seedFactor: Int = 3): DataFrame = {
    val fn = metricFn(metric)
    val (cands, _) = withLowerBound(ta, queryUser)
    val exact = fn(col("xs"), col("ys"), col("qxs"), col("qys"))

    val seeds = cands.orderBy(col("lb"), col("user_id")).limit(seedFactor * k)
      .select(exact.as("d"))
      .orderBy(col("d")).limit(k)
      .collect()
    if (seeds.length < k) return topKOf(ta, queryUser, k, metric) // tiny data
    val r = seeds.last.getDouble(0)

    cands.filter(col("lb") <= r + 1e-6)
      .select(col("user_id"), round(exact, 6).as("dist"))
      .orderBy(col("dist"), col("user_id"))
      .limit(k)
  }

  /** Candidate count after bound pruning at threshold r — exposed for tests
    * and for explain-level visibility of pruning power. */
  def prunedCandidateCount(ta: DataFrame, queryUser: Long, r: Double): Long = {
    val (cands, _) = withLowerBound(ta, queryUser)
    cands.filter(col("lb") <= r).count()
  }
}
