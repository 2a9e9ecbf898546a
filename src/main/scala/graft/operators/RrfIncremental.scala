package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** d21's INCREMENTAL serving twin (round-11 directive #8): re-rank
  * ARRIVING docs against the FROZEN corpus retrieval state — the contract
  * a production hybrid-retrieval index serves between rebuilds: the
  * corpus's BM25 statistics (N, avgdl, per-term df), its lexical and
  * dense top-20 lists, and its fused top-10 are all frozen; each arriving
  * doc is scored with those statistics and ranked AS IF inserted, without
  * moving anything already ranked (the d14/v11/t28 stream-static
  * admission pattern, applied to ranking instead of dedup).
  *
  * Rank-if-inserted is EXACT from the top lists alone: with a full
  * 20-entry frozen list, every corpus doc outside it ranks behind entry
  * #20; so if the arrival ranks ahead of fewer than 20 entries, its true
  * corpus-wide rank is (ahead + 1), and otherwise it is > 20 — which
  * under RRF-over-top-20 contributes exactly 0 either way ([[freeze]]
  * requires full lists so this argument never degrades). Admission to the
  * fused top-10 compares the arrival's fused (rrf_micro, doc_id) key
  * against the frozen 10th entry's key. All arithmetic replicates the
  * declared d21/d20 expressions term for term (same IEEE fold order as
  * `graft_dot`, same fixed-point micro-units), pinned by the self-play
  * test: a corpus doc probed against its own frozen state must land
  * exactly its own ranks.
  *
  * Scale shape: the frozen state is QUERY-bounded (|q|·(terms + 20 + 20 +
  * 10) scalars — broadcast as a closure literal, the t28 precedent); the
  * probe is one stateless map over the arrivals, so the streaming twin is
  * watermark-free and the batch form is the identical expression. At
  * 100 TB the corpus freeze reuses the d20/d21 machinery (one posting
  * scan); arrivals never touch the corpus again.
  */
object RrfIncremental {

  /** Frozen per-query retrieval state. Lists are ordered best-first;
    * every list carries (doc_id, score_micro). */
  final case class Frozen(
      queries: Seq[(Long, Array[Float], Seq[String])],
      nDocs: Long, avgdl: Double, termDf: Map[String, Long],
      lex20: Map[Long, Seq[(Long, Long)]],
      den20: Map[Long, Seq[(Long, Long)]],
      fused10: Map[Long, Seq[(Long, Long)]],
      fusedTenth: Map[Long, (Long, Long)])

  private val RrfK = 60
  private val Top = 20
  private val FusedTop = 10

  private def rrfTerm(rank: Int): Long =
    math.floor(1000000.0 / (RrfK + rank)).toLong

  /** Freeze the corpus retrieval state. `corpusDocs` = (doc_id, text),
    * `corpusEmb` = (vec_id, embedding); `querySet` = (query_id, qtext)
    * with the query embedding taken from the corpus row vec_id ==
    * query_id (d21's convention). Driver-side results are all bounded by
    * |q| · Top. */
  def freeze(s: SparkSession, corpusDocs: DataFrame, corpusEmb: DataFrame,
             querySet: Seq[(Long, String)]): Frozen = {
    graft.functions.FloatDotProduct.register(s)
    val qTermList = querySet.map { case (qid, t) =>
      qid -> t.split(" ").filter(_.nonEmpty).distinct.toSeq
    }
    val allTerms = qTermList.flatMap(_._2).distinct

    // corpus lexical statistics (the d20 expressions over the given frame)
    val toks = corpusDocs.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val nDocs = corpusDocs.count()
    val totalTf = tf.agg(sum(col("tf"))).collect()(0).getLong(0)
    val avgdl = totalTf.toDouble / nDocs.toDouble
    val termDf = tf.filter(col("tok").isin(allTerms: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // lexical scores (same IEEE tree as JsonDocs.bm25Micro; the self-play
    // test pins the fused result against the declared d21 output)
    val qt = s.createDataFrame(qTermList.flatMap { case (q, ts) => ts.map(q -> _) })
      .toDF("query_id", "tok")
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfTok = s.createDataFrame(termDf.toSeq).toDF("tok", "df")
    val idf = log(lit(1.0) +
      ((lit(nDocs) - col("df")).cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val sat = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl))))
    val lexScores = tf.join(broadcast(qt), "tok")
      .join(broadcast(dfTok), "tok")
      .join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        floor(idf * sat * lit(1e6) + lit(0.5)).cast("long").as("s_micro"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_micro")).as("score"))

    // dense scores (d21's fixed-point cosine)
    val qEmb = corpusEmb.filter(col("vec_id").isin(querySet.map(_._1): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    querySet.foreach { case (qid, _) =>
      require(qEmb.contains(qid), s"query embedding vec_id=$qid missing from the corpus") }
    val qv = s.createDataFrame(qEmb.toSeq.map { case (q, e) => (q, e.toSeq) })
      .toDF("query_id", "q_emb")
    val sq = "aggregate(transform(%s, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (s,v) -> s+v)"
    val denScores = corpusEmb.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        floor(expr("graft_dot(q_emb, embedding)") /
          (sqrt(expr(sq.format("q_emb"))) * sqrt(expr(sq.format("embedding"))))
          * lit(1e6) + lit(0.5)).cast("long").as("score"))

    def top(scores: DataFrame): Map[Long, Seq[(Long, Long)]] = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      val lists = scores.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= Top)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (q, rs) => q -> rs.sortBy(x => (-x._3, x._2)).map(x => (x._2, x._3)).toSeq }
      querySet.foreach { case (qid, _) =>
        require(lists.get(qid).exists(_.size == Top),
          s"frozen list for query $qid has ${lists.get(qid).map(_.size)} entries — " +
            s"rank-if-inserted is only exact over FULL $Top-entry lists") }
      lists
    }
    val lex20 = top(lexScores)
    val den20 = top(denScores)

    // fused top-10, driver-side over the bounded lists (d21's exact rule)
    val fused10 = querySet.map { case (qid, _) =>
      val l = lex20(qid).zipWithIndex.map { case ((d, _), i) => d -> rrfTerm(i + 1) }.toMap
      val dn = den20(qid).zipWithIndex.map { case ((d, _), i) => d -> rrfTerm(i + 1) }.toMap
      val fused = (l.keySet ++ dn.keySet).toSeq
        .map(d => (d, l.getOrElse(d, 0L) + dn.getOrElse(d, 0L)))
        .sortBy { case (d, sc) => (-sc, d) }
      require(fused.size >= FusedTop, s"query $qid fused list under $FusedTop entries")
      qid -> fused.take(FusedTop)
    }.toMap
    val fusedTenth = fused10.map { case (qid, lst) =>
      val (d10, s10) = lst(FusedTop - 1); qid -> (s10, d10)
    }

    Frozen(querySet.map { case (qid, t) =>
        (qid, qEmb(qid), qTermList.toMap.apply(qid))
      }, nDocs, avgdl, termDf, lex20, den20, fused10, fusedTenth)
  }

  /** Score an arriving-doc frame — `(doc_id, text, embedding)` — against
    * the frozen state. STATELESS: identical over a batch frame and a
    * streaming micro-batch (the equivalence test replays it). Emits one
    * row per (arrival, query): would-be ranks (0 = outside the top-20),
    * the fused score, and the top-10 admission verdict. */
  def rankAgainst(frozen: Frozen, newDocs: DataFrame): DataFrame = {
    val f = frozen
    val probe = udf { (docId: Long, text: String, emb: Seq[Float]) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val dl = toks.length.toDouble
      f.queries.map { case (qid, qEmb, terms) =>
        val sMicro = terms.map { t =>
          val tfv = toks.count(_ == t)
          if (tfv == 0) 0L
          else {
            val dfv = f.termDf.getOrElse(t, 0L)
            val idf = math.log(1.0 + ((f.nDocs - dfv).toDouble + 0.5) / (dfv.toDouble + 0.5))
            val sat = (tfv.toDouble * 2.2) /
              (tfv.toDouble + 1.2 * (0.25 + 0.75 * (dl / f.avgdl)))
            math.floor(idf * sat * 1e6 + 0.5).toLong
          }
        }.sum
        // same fold order as graft_dot / the sq aggregate
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < emb.length) {
          val a = emb(i).toDouble; val b = qEmb(i).toDouble
          dot += b * a; na += a * a; nb += b * b; i += 1
        }
        val cosMicro = math.floor(dot / (math.sqrt(nb) * math.sqrt(na)) * 1e6 + 0.5).toLong
        def rankIf(list: Seq[(Long, Long)], score: Long): Int = {
          val ahead = list.count { case (d, sc) => sc > score || (sc == score && d < docId) }
          if (ahead >= Top) 0 else ahead + 1 // 0 = outside the top-20
        }
        val lexRk = if (sMicro == 0L) 0 else rankIf(f.lex20(qid), sMicro)
        val denRk = rankIf(f.den20(qid), cosMicro)
        val rrf = (if (lexRk > 0) rrfTerm(lexRk) else 0L) +
          (if (denRk > 0) rrfTerm(denRk) else 0L)
        // `<=` makes the rule reflexive so self-play holds at the boundary
        // (the 10th member probed against itself reads admitted); a genuine
        // arrival can never share the 10th entry's doc_id, so for arrivals
        // this is exactly the strict would-displace tie rule
        val (s10, d10) = f.fusedTenth(qid)
        val admitted = rrf > s10 || (rrf == s10 && docId <= d10)
        (qid, lexRk, denRk, rrf, admitted)
      }
    }
    newDocs
      .select(col("doc_id"), explode(
        probe(col("doc_id"), col("text"), col("embedding"))).as("p"))
      .select(col("doc_id"), col("p._1").as("query_id"),
        col("p._2").as("lex_rk"), col("p._3").as("den_rk"),
        col("p._4").as("rrf_micro"), col("p._5").as("admitted"))
  }
}
