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
    def fmt(d: Double, decimals: Int): String =
      if (d < 0) "-1"
      else java.lang.String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))
    def jmap(entries: Seq[(String, Double)], decimals: Int): String =
      entries.map { case (n, v) => "\"" + n + "\":" + fmt(v, decimals) }.mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val medians = results.map(t => (t._1, t._2))
    def line(qs: Seq[(String, Double)], extra: String): String =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":${jmap(qs, 3)}$extra,"failed":$failed,"runs_per_query":$runsPer,"sf":"$sfDir"}"""
    // Contract line: EVERY query's median, ms precision (9-decimal medians
    // and the per-query min live in bench_out.json below — full fidelity).
    println(line(medians, ""))
    // The driver reads only the last ~2 KB of the log, and the full map can
    // NEVER fit it (the 191 query names alone are 3.2 KB), so the driver's
    // JSON parse of the contract line failed two rounds running (PERF_r12/13
    // per_query empty). Final line: the same schema restricted to the most
    // expensive queries that fit a 1.5 KB budget — a tail-window parser
    // recovers the suite total plus the per-query numbers that carry the
    // cost; "queries_omitted" counts the cheap rest. Nothing is removed from
    // the measurement: the complete map is the line above and bench_out.json.
    val budget = 1500
    var len = line(Nil, s""","queries_omitted":${results.size}""").length
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    for ((n, med, _) <- results.sortBy(-_._2)) {
      val entryLen = n.length + 4 + fmt(med, 3).length // "n":v plus comma
      if (len + entryLen <= budget) { picked += ((n, med)); len += entryLen }
    }
    println(line(picked.sortBy(_._1).toSeq,
      s""","queries_omitted":${results.size - picked.size}"""))
    // Full-fidelity artifact (overwritten per run; BENCH_r*.json snapshots
    // it per round): all medians and mins at 9 decimals.
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(medians, 9)},"queries_min":${jmap(results.map(t => (t._1, t._3)), 9)},"failed":$failed,"runs_per_query":$runsPer,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
