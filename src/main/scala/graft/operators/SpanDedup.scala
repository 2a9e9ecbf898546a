package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN detection — the n-gram form of exact
  * substring deduplication (the published training-data technique of Lee et
  * al., "Deduplicating Training Data Makes Language Models Better", ACL
  * 2022: repeated long spans are memorization fuel; documents dominated by
  * them get filtered or trimmed).
  *
  * A token position is DUPLICATED when the k-token shingle starting there
  * also appears in at least one other document. Per document the operator
  * reports total shingle positions, duplicated positions, and their ratio —
  * the trim/keep signal.
  *
  * Scale shape: shingles never leave the row as strings — each gram is
  * collapsed to a 64-bit xxhash64 key before the shuffle (the Lee et al.
  * suffix-array role is played here by a hash join; at 28 k grams/SF the
  * collision odds are ~2⁻⁴⁰ and only doc-level counts could be perturbed).
  * One groupBy on the hashed gram + one equi-join back — no string-keyed
  * shuffle, no all-pairs work.
  */
object SpanDedup {

  /** Tokens in LONG FORM with a DENSE 0-based position among non-empty
    * tokens: (doc_id, pos, tok). Density matters: span coverage arithmetic
    * (pos .. pos+k−1) must count real tokens, not raw split slots. */
  def tokenPositions(docs: DataFrame, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("_pos"))
    docs
      .select(col("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("_pos", "_t0")))
      .filter(col("_t0") =!= "")
      .select(col("doc_id"), (row_number().over(w) - 1).as("pos"), col("_t0").as("tok"))
  }

  /** Exact duplicated-span SURGERY (the removal step [[dupSpanStats]] only
    * measures — Lee et al. 2022's dedup applied to spans): every token
    * covered by a k-gram that also occurs in another document is cut, and
    * the document is rebuilt from the surviving tokens in order.
    *
    * Relational end to end: dense token positions → lead-window grams
    * (64-bit gids) → cross-doc window count over the distinct (doc, gid)
    * frame → coverage explode `sequence(pos, pos+k−1)` → anti join back to
    * the token stream → ordered reconstruction via
    * `array_join(transform(array_sort(collect_list(struct(pos, tok)))))`.
    * Output carries md5 of the rebuilt text so the oracle can compare
    * documents without shipping them.
    */
  def spanSurgery(docs: DataFrame, textCol: String = "text", k: Int = 8): DataFrame = {
    val toks = tokenPositions(docs, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until k).foldLeft(toks.withColumnRenamed("tok", "_t0")) { (df, i) =>
      df.withColumn(s"_t$i", lead(col("_t0"), i).over(w))
    }
    val grams = leads.filter(col(s"_t${k - 1}").isNotNull)
      .select(col("doc_id"), col("pos"),
        xxhash64((0 until k).map(i => col(s"_t$i")): _*).as("gid"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("gid"))
    val dupDocGrams = grams.select(col("doc_id"), col("gid")).distinct()
      .select(col("doc_id"), col("gid"), count(lit(1)).over(wg).as("nd"))
      .filter(col("nd") > 1)
      .select(col("doc_id"), col("gid"))
    val covered = grams.join(dupDocGrams, Seq("doc_id", "gid"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
          " ").as("kept_text"))
    toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_total"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("kept_text"), lit("")).cast("binary")).as("kept_md5"))
  }

  /** One row per k-gram POSITION: (doc_id, gid) with gid = xxhash64 over
    * the k tokens of the shingle. Documents shorter than k tokens contribute
    * no rows.
    *
    * Built in LONG FORM — posexplode to a skinny token stream, k−1 `lead`s
    * over one per-doc window, multi-column xxhash64 — every step
    * whole-stage-codegen. (The array form — `transform` + `slice` +
    * `concat_ws` per position — runs its lambdas INTERPRETED and was
    * measured 8× slower; higher-order functions never belong in a
    * per-position hot path.) */
  def gramPositions(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("_pos"))
    val toks = docs
      .select(col("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("_pos", "_t0")))
      .filter(col("_t0") =!= "")
    val leads = (1 until k).foldLeft(toks) { (df, i) =>
      df.withColumn(s"_t$i", lead(col("_t0"), i).over(w))
    }
    leads.filter(col(s"_t${k - 1}").isNotNull)
      .select(col("doc_id"),
        xxhash64((0 until k).map(i => col(s"_t$i")): _*).as("gid"))
  }

  /** Per-document span-duplication stats: (doc_id, n_grams, n_dup,
    * dup_ratio), dup_ratio rounded to 6 places.
    *
    * Shape: the position stream collapses ONCE to (doc_id, gid, npos) —
    * after that the window-lead build is out of the plan entirely, and the
    * cross-doc test is a plain count over the per-doc frame (one row per
    * (doc, gram): COUNT(*) == doc count — no countDistinct state). Both
    * consumers of the per-doc frame (the dup-gram filter and the join probe)
    * re-shuffle it by gid identically, so the exchange is planned once and
    * reused. */
  def dupSpanStats(docs: DataFrame, textCol: String = "text", k: Int = 8): DataFrame = {
    val pg = gramPositions(docs, textCol, k)
      .groupBy(col("doc_id"), col("gid"))
      .agg(count(lit(1)).as("npos"))
    // cross-doc count as an UNORDERED window over the per-doc gram frame —
    // a LINEAR plan (collapse → window → per-doc agg): the expensive
    // window-lead gram build exists exactly once in the plan, with no
    // self-join subtree for Spark to duplicate (plan-guarded).
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("gid"))
    pg.select(col("doc_id"), col("npos"),
        count(lit(1)).over(wg).as("nd"))
      .groupBy(col("doc_id"))
      .agg(sum(col("npos")).as("n_grams"),
        coalesce(sum(when(col("nd") > 1, col("npos"))), lit(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_ratio"))
  }
}
