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

  /** One row per k-gram POSITION: (doc_id, gid) with gid = xxhash64 of the
    * space-joined k-token shingle. Documents shorter than k tokens
    * contribute no rows. */
  def gramPositions(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(col("doc_id"),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("_toks"))
      .select(col("doc_id"),
        expr(s"""CASE WHEN size(_toks) >= $k
                 |THEN transform(sequence(1, size(_toks) - ${k - 1}),
                 |               i -> concat_ws(' ', slice(_toks, i, $k)))
                 |ELSE CAST(array() AS array<string>) END""".stripMargin.replace("\n", " "))
          .as("grams"))
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gid"))

  /** Per-document span-duplication stats: (doc_id, n_grams, n_dup,
    * dup_ratio), dup_ratio rounded to 6 places. */
  def dupSpanStats(docs: DataFrame, textCol: String = "text", k: Int = 8): DataFrame = {
    val g = gramPositions(docs, textCol, k)
    val dup = g.groupBy(col("gid"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gid"), lit(1).as("isdup"))
    g.join(dup, Seq("gid"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("isdup")).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_ratio"))
  }
}
