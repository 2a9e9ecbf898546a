package graft.queries

import org.apache.spark.sql.functions._

import graft.{DeclaredQuery, Tables}
import graft.operators.Sketches
import graft.sources.Multimodal

/** LLM-pipeline extras: multimodal binary columns, sketch-based dedup /
  * similarity (randomized → oracle-exempt, recall-tested), and the typed
  * UDAF centroid (exact → shares j3's oracle).
  */
object PipelineExtras {

  val queries: Seq[DeclaredQuery] = Seq(

    DeclaredQuery("m1_media_bytes",
      """SELECT lang, COUNT(*) AS n_media,
        |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
        |       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
        Multimodal.mediaTable(s, dir)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("sum_bytes"),
            max(col("n_bytes")).as("max_bytes"))
          .orderBy(col("lang"))
    },

    // Stubbed decode features: deterministic but bytes-level fold — not
    // SQL-expressible cross-engine; golden-tested in MultimodalTest.
    DeclaredQuery.noOracle("m2_media_features") {
      (s, dir) =>
        Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
          .groupBy(col("lang"), col("kind"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("sum_bytes"),
            sum(col("checksum") % 10007).as("checksum_sum"),
            round(sum(expr("feature[0]")), 4).as("f0_sum"))
          .orderBy(col("lang"), col("kind"))
    },

    DeclaredQuery.noOracle("p5_simhash_neardups") {
      (s, dir) => Sketches.simhashNearDups(s, dir)
    },

    DeclaredQuery.noOracle("p6_minhash_candidates") {
      (s, dir) =>
        Sketches.minhashCandidates(s, dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_candidates"))
          .orderBy(col("lang"))
    },

    DeclaredQuery.noOracle("p7_ann_lsh_knn") {
      (s, dir) => Sketches.annCosineKnn(s, dir)
    },

    // Typed Aggregator path producing exactly j3's numbers (same oracle).
    DeclaredQuery("j3b_centroid_udaf",
      """SELECT label, pos,
        |       ROUND(CAST(SUM(CAST(FLOOR(x*1e6 + 0.5) AS BIGINT)) AS DOUBLE)/COUNT(*)/1e6, 5) AS centroid
        |FROM (SELECT label, t.pos AS pos, CAST(embedding[t.pos+1] AS DOUBLE) AS x
        |      FROM embeddings, range(0,8) t(pos)) q
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        import graft.functions.CentroidAggregator
        Tables.table(s, dir, "embeddings")
          .select(col("label"), col("embedding"))
          .as[(Int, Seq[Float])]
          .groupByKey(_._1)
          .agg(CentroidAggregator.agg.toColumn.name("cb"))
          .toDF("label", "cb")
          .select(col("label"), col("cb.n").as("n"), posexplode(col("cb.sums")).as(Seq("pos", "s")))
          .select(col("label"), col("pos").cast("long").as("pos"),
            round(col("s").cast("double") / col("n") / lit(1e6), 5).as("centroid"))
          .orderBy(col("label"), col("pos"))
    }
  )
}
