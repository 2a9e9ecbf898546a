package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query (SURVEY §2) is one [[DeclaredQuery]] contributed by a
  * group object under `graft.queries`; this object is only the wiring.
  */
object SparkEntry {

  /** All declared queries, in contract order. */
  def declared: Seq[DeclaredQuery] =
    queries_.flatten

  private def queries_ : Seq[Seq[DeclaredQuery]] = Seq(
    graft.queries.Relational.queries,
    graft.queries.Windows.queries,
    graft.queries.SetsAndFuncs.queries,
    graft.queries.EventsQ.queries,
    graft.queries.JsonDocs.queries,
    graft.queries.Trajectories.queries,
    graft.queries.TextPipeline.queries,
    graft.queries.PipelineExtras.queries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    declared.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
