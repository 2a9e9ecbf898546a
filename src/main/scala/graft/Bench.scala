package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen spin-up and parquet footer reads, so per-query
    // timings measure the queries rather than session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.table(spark, sfDir, n).schema)
    Tables.cacheHot(spark, sfDir)
    // This box shows intermittent multi-second slowdown phases (BASELINE.md
    // noise note), so every query runs 3x and the reported number is the
    // MEDIAN (min also emitted). The 3 samples come from 3 ROUND-ROBIN
    // passes over the whole suite — back-to-back samples of one query would
    // all land inside the same noise phase; a full pass between samples
    // decorrelates them. A query that throws is reported as -1 and listed
    // under "failed" — never silently counted as a timing.
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"bench query failed: $e"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val runsPer = 3
    // optional args: restrict to the named queries (local iteration aid —
    // the driver always runs the full set)
    val only = args.toSet
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
    val passes = (1 to runsPer).map(_ => ordered.map { case (name, fn) => name -> once(fn) }.toMap)
    val results = ordered.map { case (name, _) =>
      val runs = passes.map(_(name))
      if (runs.exists(!_._2)) (name, -1.0, -1.0)
      else {
        val ts = runs.map(_._1).sorted
        (name, ts(runsPer / 2), ts.head)
      }
    }
    def jmap(sel: ((String, Double, Double)) => Double): String =
      results.map(t => s"\"" + t._1 + "\":" + sel(t)).mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._2)},"queries_min":${jmap(_._3)},"failed":$failed,"runs_per_query":$runsPer,"sf":"$sfDir"}"""
    println(json)
    // Full-fidelity artifact: the driver's log tail truncates long stdout,
    // losing per-query numbers — the complete map is always on disk too
    // (overwritten per run; BENCH_r*.json snapshots it per round).
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
