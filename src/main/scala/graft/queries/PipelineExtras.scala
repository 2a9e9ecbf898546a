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

    // Real pure-JVM decoders (RIFF/WAV PCM, 24-bpp BMP, byte stats for
    // text) over a mixed-modality binary table; per-byte parsing is not
    // SQL-expressible cross-engine — golden-tested in MultimodalTest.
    DeclaredQuery.noOracle("m2_media_features") {
      (s, dir) =>
        Multimodal.extractFeatures(Multimodal.mediaTableMultiKind(s, dir))
          .groupBy(col("lang"), col("kind"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("sum_bytes"),
            sum(col("checksum") % 10007).as("checksum_sum"),
            round(sum(expr("feature[0]")), 4).as("f0_sum"),
            round(avg(expr("feature[4]")), 4).as("f4_avg"))
          .orderBy(col("lang"), col("kind"))
    },

    // Media transform pipeline: resize BMPs to 4x4, frame-sample WAVs to 64
    // samples, then re-featurize — decode -> transform -> featurize, all
    // per-partition batched. Per-byte parsing is not SQL-expressible
    // cross-engine; transforms are golden-tested in MultimodalTest.
    DeclaredQuery.noOracle("m3_media_transform") {
      (s, dir) =>
        Multimodal.extractFeatures(
          Multimodal.transformMedia(Multimodal.mediaTableMultiKind(s, dir)).toDF())
          .groupBy(col("kind"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("sum_bytes"),
            round(sum(expr("feature[0]")), 4).as("f0_sum"),
            round(sum(expr("feature[7]")), 4).as("f7_sum"))
          .orderBy(col("kind"))
    },

    // Media INGEST over the versioned table — the multimodal member of the
    // incremental family (docs d16/d18, vectors v10/v11, trajectories t28):
    // the media corpus lives in a GraftTable with a BINARY blob column;
    // a batch of new media arrives as ONE atomic append commit, and
    // feature extraction runs ONLY over the manifest changelog (v0→v1) —
    // corpus blobs are never re-read or re-decoded, so ingest cost tracks
    // the arriving batch at 100 TB, not the archive. Per-kind report over
    // the newly featurized batch. No oracle (per-byte decode is not
    // SQL-expressible cross-engine); the changelog ≡ direct-batch feature
    // contract and corpus-untouched property are tested in MultimodalTest.
    DeclaredQuery.noOracle("m4_media_ingest") {
      (s, dir) =>
        val tdir = mediaIngestTable(s, dir)
        Multimodal.extractFeatures(
            graft.sources.GraftTable.readChanges(s, tdir, 0, 1))
          .groupBy(col("kind"))
          .agg(
            count(lit(1)).as("n_new"),
            sum(col("n_bytes")).as("sum_bytes"),
            sum(col("checksum") % 10007).as("checksum_sum"),
            round(sum(expr("feature[0]")), 4).as("f0_sum"))
          .orderBy(col("kind"))
    },

    // Perceptual MEDIA dedup — the multimodal member of the dedup family
    // (lexical d1/d3, semantic d15, spatial t28): kind-dispatched 64-bit
    // fingerprints (image dHash over the parsed pixel grid, scale-invariant
    // audio envelope hash, byte SimHash), candidates by 4×16-bit band
    // equi-join — EXACT for Hamming ≤ 3 by pigeonhole, so unlike the
    // MinHash gates this near-dup join is deterministic and fully recalled
    // — exact bit_count verify on survivors. The fixture plants the two
    // re-encode classes byte hashing cannot see: a one-pixel-corrupted
    // image copy and a 0.9×-re-leveled audio copy. No oracle (per-byte
    // decode is not SQL-expressible); planted-recovery/margin/determinism
    // tested in MultimodalTest.
    DeclaredQuery.noOracle("m5_media_dedup") {
      (s, dir) =>
        Multimodal.nearDupMediaPairs(Multimodal.mediaDedupTable(s, dir))
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("id2")).as("n_dup_items"),
            sum(col("hamming")).as("hamming_sum"),
            // xxhash64 keeps the pair encoding injective for any id range
            // (a fixed-width shift would alias once ids outgrow the slot).
            expr("bit_xor(xxhash64(id1, id2))").as("pair_ck"))
          .orderBy(col("kind"))
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

    // Batch form of p9: top-10 per query for a 5-query set in one job,
    // probe selection fully relational against the shared IVF index.
    DeclaredQuery.noOracle("p11_ann_ivf_batch") {
      (s, dir) => Sketches.annIvfKnnBatch(s, dir, Seq(0L, 1L, 2L, 3L, 4L))
    },

    DeclaredQuery.noOracle("p9_ann_ivf_knn") {
      (s, dir) => Sketches.annIvfKnn(s, dir)
    },

    // FILTERED ANN through the IVF route — v13's metadata predicate
    // composed into p9's approximate path (the production filtered-search
    // layout): route to nprobe lists, restrict candidates to the predicate
    // INSIDE the probed lists (slim id semi-join before the exact re-rank
    // — a post-filtered global shortlist under-fills under selective
    // filters), exact cosine top-k of the survivors. Reuses the SAME
    // build-once IVF artifact as p9/v9/d15. No oracle (seeded k-means);
    // recall vs the exact v13 baseline, all-rows-match-predicate, and
    // determinism tested in SketchesTest.
    DeclaredQuery.noOracle("v14_filtered_ivf") {
      (s, dir) => Sketches.annIvfKnnFiltered(s, dir)
    },

    // IVF-PQ composite ANN (the faiss `IVFx,PQy` production layout): coarse
    // quantizer routes to nprobe lists, ADC scans only those lists' PQ
    // codes, exact cosine re-ranks the bounded shortlist. Reuses the SAME
    // build-once IVF and PQ artifacts as p9/v5 — composition adds routing,
    // not a new build. No oracle (seeded randomized k-means); recall- and
    // determinism-tested in SketchesTest.
    DeclaredQuery.noOracle("v9_ivfpq_ann") {
      (s, dir) => Sketches.annIvfPqKnn(s, dir)
    },

    // Incremental IVF ingestion (round-8 directive #2 — the vector-space
    // analog of d14): coarse centroids fit ONCE on the existing corpus
    // (vec_id % 10 != 0 models it on the frozen fixture), the new batch is
    // routed to those frozen centroids by a broadcast-argmin over the batch
    // rows only, and the routed rows persist as an append DELTA artifact —
    // no refit, no corpus rescan. Output: per-list corpus/appended counts
    // plus an exact id checksum of the appended members (pins the routed
    // assignment, not just its size). No oracle (seeded k-means); append ≡
    // one-shot routing, recall, and no-refit proven in SketchesTest.
    DeclaredQuery.noOracle("v10_ivf_append") {
      (s, dir) =>
        val (_, _, all) = Sketches.ivfIncremental(s, dir)
        all.groupBy(col("list_id"))
          .agg(
            sum(when(col("vec_id") % 10 =!= 0, 1L).otherwise(0L)).as("n_corpus"),
            sum(when(col("vec_id") % 10 === 0, 1L).otherwise(0L)).as("n_appended"),
            coalesce(sum(when(col("vec_id") % 10 === 0, col("vec_id"))), lit(0L))
              .as("ck_appended"))
          .orderBy(col("list_id"))
    },

    // Incremental SEMANTIC-dedup gate — the embedding-space analog of the
    // d14 ingest gate, completing the incremental pair: d14 gates lexical
    // near-dups at ingest, this gates the paraphrase/translation
    // duplicates lexical hashing cannot see (SemDeDup semantics at
    // continuous ingestion). The new batch (vec_id % 10 == 0) routes to
    // the FROZEN corpus quantizer (v10's no-refit routing), and CROSS
    // pairs only (corpus = index side, batch = probe side) reject a new
    // vector whose cluster holds a corpus neighbor at cosine ≥ 0.3.
    // Output: per-cluster admit/reject counts + exact rejected-id
    // checksum. No oracle (seeded k-means); planted-twin rejection and
    // streaming-replay equivalence proven in SketchesTest /
    // StreamingEquivalenceTest.
    DeclaredQuery.noOracle("v11_semantic_gate") {
      (s, dir) => Sketches.semanticGateSummary(s, dir)
    },

    // ANN serving that stays consistent under DELETES — the consumer the
    // change feed exists for: the embeddings live in a versioned table,
    // v1 is a CDC purge delete, v2 a CDC re-embedding upsert (ids ≡ 35
    // mod 70 are deleted THEN re-inserted), and the served assignment is
    // the frozen-quantizer corpus artifact FOLDED with the feed —
    // tombstones anti-join, adds/postimages route against the frozen
    // centers, last change per id wins. Cost tracks the feed (corpus
    // vectors never re-read or re-routed); without it a purged document
    // keeps surfacing from the ANN index. Output: per-list served count,
    // exact id checksum, re-embedded member count. No oracle (seeded
    // k-means); served ≡ head-snapshot routing under the same frozen
    // centers, purged-absent, re-insert-present proven in SketchesTest.
    DeclaredQuery.noOracle("v15_ann_cdc_consistent") {
      (s, dir) => Sketches.annCdcSummary(s, dir)
    },

    // As-of join as a composable operator (union-tag + running last):
    // each event joined to the latest error event of the same user at or
    // before it.
    DeclaredQuery("a1_asof_join",
      """WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |t AS (SELECT user_id, event_id,
        |             LAST_VALUE(CASE WHEN event_type='error' THEN event_id END IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_event_id
        |      FROM e)
        |SELECT user_id, COUNT(*) AS n_matched,
        |       CAST(SUM((event_id*31 + err_event_id) % 1000003) AS BIGINT) AS checksum
        |FROM t WHERE err_event_id IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_id").as("err_event_id"))
        graft.operators.AsOfJoin.asofLatest(
            ev.select(col("user_id"), col("ts_us"), col("event_id")),
            errors,
            keys = Seq("user_id"), order = Seq("ts_us", "event_id"),
            payload = Seq("err_event_id"))
          .filter(col("err_event_id").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_matched"),
            sum((col("event_id") * 31 + col("err_event_id")) % 1000003).as("checksum"))
          .orderBy(col("user_id"))
    },

    // As-of join with a TOLERANCE (point-in-time join with a staleness
    // bound): each event matched to the latest error of its user within the
    // last 600 s; staler errors don't count. Same one-shuffle union-tag
    // plan as a1 — the bound is a scalar post-filter.
    DeclaredQuery("a2_asof_tolerance",
      """WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |t AS (SELECT user_id, event_id, ts_us,
        |             LAST_VALUE(CASE WHEN event_type='error' THEN event_id END IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_event_id,
        |             LAST_VALUE(CASE WHEN event_type='error' THEN ts_us END IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_ts
        |      FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CASE WHEN err_event_id IS NOT NULL AND ts_us - err_ts <= 600000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
        |       CAST(SUM(CASE WHEN err_event_id IS NOT NULL AND ts_us - err_ts <= 600000000
        |                     THEN (event_id*31 + err_event_id) % 1000003 ELSE 0 END) AS BIGINT)
        |         AS checksum
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_id").as("err_event_id"))
        graft.operators.AsOfJoin.asofLatestWithin(
            ev.select(col("user_id"), col("ts_us"), col("event_id")),
            errors,
            keys = Seq("user_id"), order = Seq("ts_us", "event_id"),
            payload = Seq("err_event_id"), tol = 600000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("err_event_id").isNotNull, 1).otherwise(0)).cast("long").as("n_within"),
            sum(when(col("err_event_id").isNotNull,
              (col("event_id") * 31 + col("err_event_id")) % 1000003).otherwise(0L))
              .cast("long").as("checksum"))
          .orderBy(col("user_id"))
    },

    // NEAREST-in-time as-of join (both directions, 600 s tolerance,
    // equidistant ties break to the EARLIER error): the sensor-alignment /
    // nearest-reading join. Backward pass + forward pass over the negated
    // order — ONE user_id exchange reused by two sorts, never the
    // |l.ts−r.ts| ≤ tol range join that enumerates every in-tolerance pair.
    // Oracle replicates both directions with mirrored window frames.
    DeclaredQuery("a3_asof_nearest",
      """WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |t AS (SELECT user_id, event_id, ts_us,
        |        LAST_VALUE(CASE WHEN event_type='error' THEN event_id END IGNORE NULLS)
        |          OVER wb AS b_id,
        |        LAST_VALUE(CASE WHEN event_type='error' THEN ts_us END IGNORE NULLS)
        |          OVER wb AS b_ts,
        |        FIRST_VALUE(CASE WHEN event_type='error' THEN event_id END IGNORE NULLS)
        |          OVER wf AS f_id,
        |        FIRST_VALUE(CASE WHEN event_type='error' THEN ts_us END IGNORE NULLS)
        |          OVER wf AS f_ts
        |      FROM e
        |      WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |m AS (SELECT user_id, event_id,
        |        CASE WHEN b_ts IS NOT NULL AND ts_us - b_ts <= 600000000
        |                  AND (f_ts IS NULL OR f_ts - ts_us > 600000000
        |                       OR ts_us - b_ts <= f_ts - ts_us)
        |             THEN b_id
        |             WHEN f_ts IS NOT NULL AND f_ts - ts_us <= 600000000
        |             THEN f_id END AS m_id
        |      FROM t)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(COUNT(m_id) AS BIGINT) AS n_matched,
        |       CAST(SUM(CASE WHEN m_id IS NOT NULL
        |                     THEN (event_id*31 + m_id) % 1000003 ELSE 0 END) AS BIGINT)
        |         AS checksum
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_id").as("err_event_id"))
        graft.operators.AsOfJoin.asofNearestWithin(
            ev.select(col("user_id"), col("ts_us"), col("event_id")),
            errors,
            keys = Seq("user_id"), order = Seq("ts_us", "event_id"),
            payload = Seq("err_event_id"), tol = 600000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            count(col("err_event_id")).as("n_matched"),
            sum(when(col("err_event_id").isNotNull,
              (col("event_id") * 31 + col("err_event_id")) % 1000003).otherwise(0L))
              .cast("long").as("checksum"))
          .orderBy(col("user_id"))
    },

    // Character 3-gram shingle Jaccard on a bounded doc subset — exercises
    // the generic inverted-index path (shingle vocab ≫ 64) with an oracle.
    DeclaredQuery("p8_ngram_jaccard",
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 500),
        |sh AS (SELECT DISTINCT doc_id, lang, tok FROM
        |        (SELECT doc_id, lang, unnest(list_transform(range(1, length(text)-1),
        |                i -> substring(text, CAST(i AS INT), 3))) AS tok
        |         FROM d) u),
        |sizes AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id d1, b.doc_id d2, a.lang AS lang, COUNT(*) i
        |          FROM sh a JOIN sh b ON a.tok=b.tok AND a.lang=b.lang AND a.doc_id < b.doc_id
        |          GROUP BY a.doc_id, b.doc_id, a.lang)
        |SELECT d1, d2, lang, ROUND(CAST(i AS DOUBLE)/(s1.c + s2.c - i), 6) AS jaccard
        |FROM inter JOIN sizes s1 ON s1.doc_id=d1 JOIN sizes s2 ON s2.doc_id=d2
        |WHERE 2*i >= 1*(s1.c + s2.c - i)
        |ORDER BY ROUND(CAST(i AS DOUBLE)/(s1.c+s2.c-i),6) DESC, d1, d2 LIMIT 50""".stripMargin) {
      (s, dir) =>
        // shingle table is a persisted index artifact (token-dictionary
        // analog): later sessions read parquet instead of re-shingling
        val shingles = graft.sources.IndexStore.materialize(s, dir, "shingles3_doc500") {
          Tables.table(s, dir, "documents")
            .filter(col("doc_id") < 500)
            .select(col("doc_id"), col("lang"),
              explode(expr(
                // sequence(1, n) runs DESCENDING when n < 1, so short docs must
                // yield an empty shingle list (matching DuckDB's range())
                "CASE WHEN length(text) >= 3 THEN transform(sequence(1, length(text)-2), i -> substring(text, i, 3)) " +
                  "ELSE CAST(array() AS ARRAY<STRING>) END")).as("tok"))
            .distinct()
        }._1
        // measured-vocab strategy choice: this corpus has only ~400 distinct
        // 3-gram shingles, so the multi-word bitmap join wins (popcount over
        // 6 longs per pair, no token-level join); a big-vocab corpus routes
        // to the prefix-filtered inverted index instead (both exact-equal to
        // the inverted index — OperatorsTest). The pair frame is memoized
        // per session (r14): vocab probe + group build are deterministic
        // functions of the build-once shingle artifact.
        graft.operators.DocSimilarity
          .jaccardPairsCached(shingles, 1, 2, s"$dir#shingles3_doc500")
          .orderBy(col("jaccard").desc, col("d1"), col("d2"))
          .limit(50)
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

  /** Build-once media table for m4 (the docsTable pattern): v0 = the
    * mixed-modality corpus rows (media_id % 10 != 0), v1 = one atomic
    * append of the arriving batch (media_id % 10 == 0). Guarded: a warm
    * session finds v1 and reads only the changelog. */
  private def mediaIngestTable(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val gt = graft.sources.GraftTable
    val tdir = graft.sources.IndexStore.artifactPath(s, dir, "media_table")
    gt.getOrCreateUpgraded(s, tdir, statsCols = Seq("media_id")) {
      Multimodal.mediaTableMultiKind(s, dir).filter(col("media_id") % 10 =!= 0)
    } {
      gt.append(s, tdir,
        Multimodal.mediaTableMultiKind(s, dir).filter(col("media_id") % 10 === 0),
        statsCols = Seq("media_id"))
    }
  }
}
