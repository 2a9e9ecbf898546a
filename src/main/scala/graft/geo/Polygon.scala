package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Point-in-polygon by ray casting, in the §2.7b-portable form: per edge the
  * horizontal +x ray from the point crosses iff the point's y lies in the
  * edge's half-open y-span AND the point sits strictly left of the edge at
  * that height — tested with the cross product
  * `t = (py−y1)(x2−x1) − (px−x1)(y2−y1)` (sign matched to the edge's y
  * direction), never a division, so Spark and DuckDB evaluate the identical
  * IEEE multiply/subtract tree and the integer crossing counts hash-match.
  * The half-open span (`y1 ≤ py < y2` upward, mirrored downward) is the
  * standard vertex-safe rule: a ray through a shared vertex counts once,
  * not twice, and horizontal edges never count. Boundary convention that
  * falls out: points ON a left-facing edge test inside, on a right-facing
  * edge outside (deterministic either way — what the parity test pins).
  *
  * The whole predicate is one codegen'd projection per point — no explode,
  * no join, no shuffle: at 100 TB the polygon test rides the scan and the
  * only shuffle is the caller's per-user aggregate.
  */
object Polygon {

  /** Closed ring of vertices → edge list (last vertex connects to first). */
  private def edges(verts: Seq[(Double, Double)]): Seq[((Double, Double), (Double, Double))] = {
    require(verts.length >= 3, s"polygon needs >= 3 vertices, got ${verts.length}")
    verts.zip(verts.tail :+ verts.head)
  }

  /** Crossing count of the +x ray from (`px`,`py`) as a Column (BIGINT). */
  def crossings(verts: Seq[(Double, Double)], px: Column, py: Column): Column =
    edges(verts).map { case ((x1, y1), (x2, y2)) =>
      val t = (py - lit(y1)) * lit(x2 - x1) - (px - lit(x1)) * lit(y2 - y1)
      val cond =
        if (y2 > y1) py >= lit(y1) && py < lit(y2) && t > lit(0.0)
        else if (y2 < y1) py >= lit(y2) && py < lit(y1) && t < lit(0.0)
        else lit(false) // horizontal edge never crosses a horizontal ray
      when(cond, lit(1L)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The SAME crossing count as SQL text over columns `px`/`py` — generated
    * from the same vertex list so the arithmetic matches term for term. */
  def crossingsSql(verts: Seq[(Double, Double)], px: String, py: String): String =
    edges(verts).map { case ((x1, y1), (x2, y2)) =>
      val t = s"(($py - $y1)*${x2 - x1} - ($px - $x1)*${y2 - y1})"
      if (y2 > y1)
        s"CASE WHEN $py >= $y1 AND $py < $y2 AND $t > 0.0 THEN 1 ELSE 0 END"
      else if (y2 < y1)
        s"CASE WHEN $py >= $y2 AND $py < $y1 AND $t < 0.0 THEN 1 ELSE 0 END"
      else "0"
    }.mkString("(", " + ", ")")

  /** Odd crossing parity = inside. */
  def inside(verts: Seq[(Double, Double)], px: Column, py: Column): Column =
    crossings(verts, px, py) % lit(2L) === lit(1L)

  /** Crossing count from an EDGES ARRAY column — the data-driven form for
    * polygon TABLES (t30), where the fence varies per row so the vertex
    * list can't be baked into the expression tree like [[crossings]].
    * `edges` is `ARRAY<STRUCT<x1,y1,x2,y2 DOUBLE>>`; the fold is the same
    * half-open y-span + cross-product sign test, evaluated per
    * (point, fence) row as one codegen'd `aggregate` — no explode, so the
    * blocked join's row count never multiplies by the edge count. The
    * branch order (upward edge, downward edge, else) mirrors
    * [[crossings]]'s three-way split exactly, so a fixed polygon run
    * through either form counts identically (pinned in
    * TrajectoryExprTest). */
  def crossingsEdges(edges: Column, px: Column, py: Column): Column =
    aggregate(edges, lit(0L), (acc, e) => {
      val x1 = e.getField("x1"); val y1 = e.getField("y1")
      val x2 = e.getField("x2"); val y2 = e.getField("y2")
      val t = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
      acc + when(y2 > y1 && py >= y1 && py < y2 && t > lit(0.0), lit(1L))
        .when(y2 < y1 && py >= y2 && py < y1 && t < lit(0.0), lit(1L))
        .otherwise(lit(0L))
    })
}
