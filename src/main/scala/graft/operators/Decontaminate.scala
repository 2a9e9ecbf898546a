package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data pipeline operator that
  * flags corpus documents sharing any word n-gram with a benchmark/eval set
  * (the standard n-gram-overlap contamination check used when preparing LLM
  * training corpora).
  *
  * Scale shape: the benchmark side is SMALL (eval suites are ~10⁴–10⁶
  * shingles) while the corpus is the 100 TB side — so the corpus never
  * shuffles. A Bloom filter built from the benchmark shingles (one
  * distributed aggregation, bounded bits) is broadcast and applied as a
  * map-side prefilter on the corpus scan; only probable hits (fpp-bounded
  * fraction of rows) reach the exact broadcast join that removes false
  * positives. The result is EXACT — the Bloom layer only discards rows the
  * exact join would drop anyway (equivalence asserted in DecontaminateTest).
  * If the blocklist ever outgrows a broadcast, the same two-stage shape
  * works with a shuffle join on the survivors — the prefilter still keeps
  * ~all of the corpus out of the shuffle.
  */
object Decontaminate {

  /** Word n-gram shingles (doc_id, shingle) from (doc_id, text): tokens are
    * space-split with empties dropped, shingle = n consecutive tokens joined
    * by a single space. The HOFs run once per DOCUMENT at build time (never
    * in a join loop). Documents shorter than n tokens yield no shingles. */
  def wordShingles(docs: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame = {
    val parts = (0 until n).map(j => if (j == 0) "ts[i]" else s"' ', ts[i+$j]").mkString(", ")
    docs.withColumn("ts", expr(s"filter(split($textCol, ' '), t -> t <> '')"))
      .withColumn("shingle",
        explode(expr(
          s"CASE WHEN size(ts) >= $n THEN transform(sequence(0, size(ts)-$n), i -> concat($parts)) " +
            "ELSE CAST(array() AS ARRAY<STRING>) END")))
      .drop("ts", textCol)
  }

  /** Exact contamination hits: (doc_id, n_hits = distinct shared shingles)
    * for every corpus doc sharing ≥1 shingle with the benchmark set. */
  def hits(corpusShingles: DataFrame, benchShingles: DataFrame): DataFrame =
    corpusShingles
      .join(broadcast(benchShingles.select(col("shingle")).distinct()), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_hits"))

  /** The STATELESS hit stream behind [[hitsBloom]]: corpus shingle rows
    * thinned by a broadcast Bloom probe (map-side, no shuffle), then the
    * exact broadcast join removes false positives. Emits (doc_id, shingle)
    * hit rows — exactly the rows [[hits]] would aggregate. Works unchanged
    * on a STREAMING corpus side (no state, no watermark — the shape of a
    * continuous ingest filter; the Bloom/benchmark side is static and built
    * once at plan-construction time). */
  def probableHits(corpusShingles: DataFrame, benchShingles: DataFrame,
                   expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val s = corpusShingles.sparkSession
    val bench = benchShingles.select(col("shingle")).distinct()
    val bf = bench.stat.bloomFilter("shingle", expectedItems, fpp)
    val bfB = s.sparkContext.broadcast(bf)
    val mightContain = udf((sh: String) => sh != null && bfB.value.mightContainString(sh))
    corpusShingles
      .filter(mightContain(col("shingle")))
      .join(broadcast(bench), "shingle")
      .select(col("doc_id"), col("shingle"))
  }

  /** Bloom-prefiltered exact contamination hits — identical results to
    * [[hits]]: aggregate of [[probableHits]]. `expectedItems`/`fpp` size the
    * filter; at 10⁶ shingles and 1% fpp the broadcast is ~1.2 MB. */
  def hitsBloom(corpusShingles: DataFrame, benchShingles: DataFrame,
                expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    probableHits(corpusShingles, benchShingles, expectedItems, fpp)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_hits"))
}
