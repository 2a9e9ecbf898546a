package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity primitives over ARRAY<FLOAT> embedding columns
  * (SURVEY §2.5 v1/v2; LLM-pipeline similarity-search surface).
  *
  * Numeric contract: elements are promoted FLOAT→DOUBLE before arithmetic
  * and accumulated in a strict left-to-right fold — the exact IEEE sequence
  * of the declarative `aggregate(zip_with(...))` form and of DuckDB's
  * `list_sum(list_transform(...))`, so results are interchangeable
  * bit-for-bit. The UDF form exists because for O(n²) pair joins the
  * per-element lambda interpretation of higher-order functions dominates
  * runtime; the UDF runs the same fold as one tight JVM loop.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ, left fold over doubles. */
  val dot = udf { (a: Seq[Float], b: Seq[Float]) =>
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Declarative Σ xᵢ² (higher-order functions; fine for per-row use). */
  def norm2Col(c: String): Column =
    expr(s"aggregate(transform($c, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (s,v) -> s+v)")

  /** Declarative dot product (per-row / small-cardinality use). */
  def dotCol(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (s,v) -> s+v)")

  /** Exact all-pairs cosine-similarity self-join with threshold, in two
    * phases — the relational re-expression of the reference's bound-seeding
    * + refinement (O11/O13):
    *
    *  1. PRUNE: per vector, precompute norm, the first `headDim` components
    *    as scalar DOUBLE columns, and the tail's L2 norm. For a pair,
    *    `headDot + tailNormA·tailNormB ≥ dot` (Cauchy–Schwarz), so
    *    `bound + margin < t·normA·normB` proves the exact cosine can never
    *    reach the threshold. The bound is pure scalar arithmetic inside
    *    whole-stage codegen over the pair join — no arrays, no UDF calls,
    *    no allocation per pair.
    *  2. REFINE: survivors only — full dot via the tight-loop UDF, exact
    *    rounded cosine, exact threshold test.
    *
    * Result is exactly the naive all-pairs answer: the bound (with margin
    * 1e-6 ≫ fold reorder noise ~1e-13) can only over-approximate.
    * Output: (id1, id2, cos_sim) with id1 < id2 and ROUND(cos,6) ≥ t.
    */
  def cosineSelfJoin(em: DataFrame, idCol: String, embCol: String, t: Double,
                     headDim: Int = 16): DataFrame = {
    // out-of-range head slots (dim < headDim) contribute 0 to the head dot;
    // the tail slice is then empty so the bound stays exact
    val heads = (0 until headDim).map(i =>
      expr(s"COALESCE(CAST($embCol[$i] AS DOUBLE), 0.0)").as(s"h$i"))
    val tailSq = s"aggregate(transform(slice($embCol, ${headDim + 1}, 1000000), " +
      "x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (s,v) -> s+v)"
    val stats = em.select(
      Seq(col(idCol).as("vid"), col(embCol).as("emb"),
        sqrt(expr(s"aggregate(transform($embCol, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (s,v) -> s+v)")).as("nrm"),
        sqrt(expr(tailSq)).as("tnrm")) ++ heads: _*)

    def side(p: String) =
      stats.select(stats.columns.toIndexedSeq.map(c => col(c).as(p + c)): _*)
    val a = side("a_")
    val b = side("b_")
    val headDot = (0 until headDim)
      .map(i => col(s"a_h$i") * col(s"b_h$i"))
      .reduce(_ + _)
    // ROUND(cos,6) >= t can hold only if cos >= t - 5e-7; prune when even
    // the upper bound stays below that (margin absorbs float noise).
    val keep = headDot + col("a_tnrm") * col("b_tnrm") + lit(1e-6) >=
      (lit(t) - lit(1e-6)) * col("a_nrm") * col("b_nrm")

    // The refine dot is marked non-deterministic ONLY to stop Catalyst from
    // pushing the >= t filter (and with it the UDF) into the join condition
    // ahead of the cheap bound — the function itself is pure. Without this,
    // the optimizer evaluates the full dot for every pair and the prune is
    // dead code.
    val refineDot = dot.asNondeterministic()

    a.join(b, col("a_vid") < col("b_vid") && keep)
      .select(col("a_vid").as("id1"), col("b_vid").as("id2"),
        round(refineDot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= t)
  }

  /** Greedy Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * SIGIR'98) over a COLLECTED shortlist: at each step pick the candidate
    * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d,s)` (first pick:
    * just `λ·rel`), ties broken by id ascending.
    *
    * Architecture note (100 TB): MMR is inherently sequential in k, so the
    * distributed part of the operator is producing the BOUNDED shortlist
    * (ANN / TakeOrdered top-N); the greedy loop then runs over N rows on
    * the driver — the standard retrieve-then-rerank split. N and k are
    * capped by the caller, never data-sized.
    *
    * Pure function of its input order-independently: candidate similarity
    * uses the same strict left-to-right double fold as [[dot]], and the
    * argmax ordering is (score desc, id asc) — bit-deterministic.
    *
    * @return (rank 1..k, id, mmrScore) in selection order.
    */
  def mmrGreedy(cands: Seq[(Long, Array[Float], Double)], k: Int, lambda: Double)
      : Seq[(Int, Long, Double)] = {
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.map(c => c._1 -> c): _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    while (out.length < k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.valuesIterator.foreach { case (id, emb, rel) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => dotFF(emb, s._2)).max
        val score = lambda * rel - (1 - lambda) * maxSim
        // NaN comparisons are all false — an all-NaN round would leave
        // bestId = -1 and crash opaquely below; fail with the cause instead
        require(!score.isNaN,
          s"mmrGreedy: NaN score for candidate $id (NaN embedding or rel?)")
        if (score > bestScore || (score == bestScore && (bestId < 0 || id < bestId))) {
          bestScore = score; bestId = id
        }
      }
      val (_, emb, _) = remaining.remove(bestId).get
      selected += ((bestId, emb))
      out += ((out.length + 1, bestId, bestScore))
    }
    out.toSeq
  }
}
