package graft.geo

/** t30's geofence TABLE: 100 deterministic non-convex (top-notched)
  * pentagons tiling the pts fixture domain (x = days 0..30, y = value
  * 0..200) on a 10×10 grid, shapes varied per id. Every coordinate is a
  * multiple of 1/8 — exactly representable in binary, so the shortest
  * decimal form round-trips and the Spark DataFrame (built from these
  * Doubles) and the DuckDB `VALUES` text (interpolated from the SAME
  * Doubles) hold bit-identical operands: the ray-cast cross-product trees
  * match term for term (the t29 single-polygon precedent, lifted to a
  * polygon table).
  *
  * The fences deliberately DON'T overlap (3.0/20.0 grid pitch vs ≤ 2.75 ×
  * ≤ 16 extents) — overlap would be handled fine (a point simply lands in
  * several fences), but disjoint fences make per-fence counts easy to
  * eyeball against t29.
  */
object Fences {

  /** One directed polygon edge; `ARRAY<STRUCT<x1,y1,x2,y2>>` on the Spark
    * side, one VALUES row per edge on the oracle side. */
  final case class Edge(x1: Double, y1: Double, x2: Double, y2: Double)

  final case class Fence(fence_id: Int, edges: Seq[Edge],
                         minx: Double, maxx: Double,
                         miny: Double, maxy: Double)

  val all: Seq[Fence] = (0 until 100).map { i =>
    val cx = 1.5 + 3.0 * (i % 10)        // column centers: 1.5 .. 28.5
    val cy = 10.0 + 20.0 * (i / 10)      // row centers: 10 .. 190
    val w = 1.0 + 0.125 * ((i * 3) % 4)  // half-width 1.0 .. 1.375
    val h = 6.0 + 0.5 * ((i * 7) % 5)    // half-height 6.0 .. 8.0
    // top-mid vertex pulled down by 1–3 quarter-heights: always a notch,
    // always simple (notch stays above the bottom edge)
    val notchY = cy + h - 0.25 * h * (1 + (i % 3))
    val verts = Seq((cx - w, cy - h), (cx + w, cy - h), (cx + w, cy + h),
                    (cx, notchY), (cx - w, cy + h))
    val edges = verts.zip(verts.tail :+ verts.head)
      .map { case ((a, b), (c, d)) => Edge(a, b, c, d) }
    Fence(i, edges, cx - w, cx + w, cy - h, cy + h)
  }

  /** DuckDB inline relation: one row per fence EDGE —
    * `(fence_id, x1, y1, x2, y2)`. Pure relational (no list/lambda
    * constructs), so the oracle's crossing count is a plain per-(point,
    * fence) SUM over this table. */
  def edgesSql: String =
    all.flatMap(f => f.edges.map(e =>
        s"(${f.fence_id}, ${e.x1}, ${e.y1}, ${e.x2}, ${e.y2})"))
      .mkString("(VALUES ", ", ", ") AS t(fence_id, x1, y1, x2, y2)")
}
