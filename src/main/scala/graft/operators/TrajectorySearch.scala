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
           metric: String = "hausdorff", eventType: String = "purchase"): DataFrame = {
    val fn = metric match {
      case "hausdorff" => MetricUdfs.hausdorff
      case "frechet" => MetricUdfs.frechet
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }
    val ta = Tables.trajArrays(s, dir, eventType)
    val q = ta.filter(col("user_id") === queryUser)
      .select(col("xs").as("qxs"), col("ys").as("qys"))
    ta.filter(col("user_id") =!= queryUser)
      .crossJoin(broadcast(q))
      .select(col("user_id"),
        round(fn(col("xs"), col("ys"), col("qxs"), col("qys")), 6).as("dist"))
      .orderBy(col("dist"), col("user_id"))
      .limit(k)
  }
}
