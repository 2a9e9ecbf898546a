package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-13 measurement aid: dump `.explain("formatted")` of named declared
  * queries to files (`plans/r13/<query>_<suffix>.txt`) so plan-shape claims
  * in OPTIMIZATION_r13.md are checkable without running Spark.
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <query>...
  * (suffix is `before` / `after`; env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
  * as in Bench so the plan is produced under the bench session shape).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // pseudo-names for checkpoint-BUILD subtrees, which the final query
    // plans hide behind `Scan ExistingRDD` (r14): dumpable first-class so
    // plan claims about the builds stay checkable without running Spark
    val builds: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "t21_brute_half_build" -> ((s, d) =>
        graft.operators.TrajectorySearch.bruteHalfBuild(
          Tables.trajArrays(s, d, "purchase"), "hausdorff", hintBroadcast = true)),
      "v6_sums_build" -> ((s, d) => graft.queries.JsonDocs.v6SumsBuild(s, d)),
      "r21_valf_build" -> ((s, d) => graft.queries.Relational.r21ValFBuild(s, d)))
    for (n <- names) {
      val df = builds.get(n).map(_(spark, sfDir))
        .getOrElse(SparkEntry.queries(n)(spark, sfDir))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"EXPLAIN_WROTE $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
