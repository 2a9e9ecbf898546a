package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftRules

/** The ε-distance-join optimizer rule: the declarative graft_within theta
  * join must (a) plan as a hash equi-join, not BNLJ/cartesian, (b) return
  * exactly the naive join's rows, (c) work through plain spark.sql. */
class DistanceJoinRuleTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkPoints(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, rnd.nextDouble() * 40, rnd.nextDouble() * 40))
      .toDF("id", "x", "y")
  }

  test("rewrite fires: equi-join plan, no nested-loop, results equal the naive join") {
    GraftRules.install(spark)
    val pts = mkPoints(400, 9)
    val a = pts.select($"id".as("ia"), $"x".as("xa"), $"y".as("ya"))
    val b = pts.select($"id".as("ib"), $"x".as("xb"), $"y".as("yb"))

    val declarative = a.join(b,
      $"ia" < $"ib" && expr("graft_within(xa, ya, xb, yb, 2.0)"))
      .select($"ia", $"ib")
    val plan = declarative.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate"), plan) // the 3x3 cell expansion

    val naive = a.crossJoin(b)
      .filter($"ia" < $"ib" &&
        round(sqrt(($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb")), 6) <= 2.0)
      .select($"ia", $"ib")
    val got = declarative.orderBy($"ia", $"ib").collect().map(_.toString).toSeq
    val want = naive.orderBy($"ia", $"ib").collect().map(_.toString).toSeq
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce qualifying pairs")
  }

  test("declarative distance join works through plain spark.sql") {
    GraftRules.install(spark)
    mkPoints(200, 11).createOrReplaceTempView("pts_dj")
    val viaSql = spark.sql(
      """SELECT a.id AS ia, b.id AS ib
        |FROM pts_dj a JOIN pts_dj b
        |  ON a.id < b.id AND graft_within(a.x, a.y, b.x, b.y, 1.5)
        |ORDER BY ia, ib""".stripMargin)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val rows = viaSql.collect()
    // cross-check one pair against the scalar kernel
    val all = mkPoints(200, 11).collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (x1, y1) = all(r.getLong(0)); val (x2, y2) = all(r.getLong(1))
      assert(graft.functions.GeoWithinKernel.within(x1, y1, x2, y2, 1.5))
    }
  }

  test("GeoWithinKernel rounding matches Spark's round(x, 6) exactly") {
    GraftRules.install(spark)
    val rnd = new scala.util.Random(31)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextDouble() * 50, rnd.nextDouble() * 50,
        rnd.nextDouble() * 50, rnd.nextDouble() * 50, rnd.nextDouble() * 30))
    val df = rows.toDF("x1", "y1", "x2", "y2", "eps")
    val out = df.select(
      expr("graft_within(x1, y1, x2, y2, eps)").as("k"),
      (round(sqrt(($"x1" - $"x2") * ($"x1" - $"x2") + ($"y1" - $"y2") * ($"y1" - $"y2")), 6) <= $"eps").as("s"))
      .collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("rule leaves non-spatial joins and already-keyed joins untouched") {
    GraftRules.install(spark)
    val pts = mkPoints(50, 13)
    // equality conjunct present -> guard skips (and the query still works)
    val keyed = pts.select($"id", $"x", $"y", ($"id" % 5).as("g"))
    val j = keyed.as("l").join(keyed.as("r"),
      expr("l.g = r.g") && expr("graft_within(l.x, l.y, r.x, r.y, 5.0)") && expr("l.id < r.id"))
    assert(j.count() >= 0) // executes fine; no rewrite claims needed here
    // plain join: no graft_within, nothing changes
    val plain = pts.as("l").join(pts.as("r"), expr("l.id = r.id")).count()
    assert(plain == 50)
  }
}
