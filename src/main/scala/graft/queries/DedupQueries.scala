package graft.queries

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication queries over `documents` (SURVEY.md §2c): exact,
  * MinHash-LSH, SimHash, Jaccard/containment, fuzzy, spans,
  * segments, connected components, incremental ingest.
  *
  * Oracle policy (shared across the query registry): deterministic
  * rational/string computations get full DuckDB oracles
  * (dialect-translated); probabilistic pipelines whose correctness
  * contract is recall vs an exact baseline are covered by ScalaTest
  * brute-force comparisons and registered rows-only.
  */
object DedupQueries {

  private def docs(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d) // registers views + all UDAF/expression families
    s.table("documents")
  }

  private val incrementalIngestOracle: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |         md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS dup_key
      |  FROM documents)
      |SELECT min(doc_id)::BIGINT AS keep_id, dup_key
      |FROM fp WHERE doc_id % 2 = 1 AND dup_key IS NOT NULL
      |  AND dup_key NOT IN (SELECT dup_key FROM fp
      |                      WHERE doc_id % 2 = 0 AND dup_key IS NOT NULL)
      |GROUP BY dup_key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- LSH banding sweep: recall/precision of every (bands, rows)
    // partition of one shared MinHash signature vs the exact truth — the
    // parameter-selection table before a 100 TB run (oracle-checked) ---
    "q_dedup_band_sweep" -> ((s, d) =>
      Dedup.bandSweep(docs(s, d), "doc_id", "text",
        idWindow = 25L, threshold = 0.5)),

    // --- exact dedup on canonicalized word-set key (oracle-checked) ---
    "q_dedup_exact" -> ((s, d) => Dedup.exactGroups(
      docs(s, d), col("doc_id"),
      array_join(array_sort(array_distinct(split(lower(col("text")), " "))), " "))),

    // --- incremental ingest dedup: odd-id docs are the incoming batch,
    // even-id fingerprints the already-ingested store (oracle-checked) ---
    "q_dedup_incremental" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incremental(
        all.where(col("doc_id") % 2 === 1), col("doc_id"),
        TextAnalysis.fingerprint(col("text")),
        all.where(col("doc_id") % 2 === 0)
          .select(TextAnalysis.fingerprint(col("text"))))
    }),

    // --- the same ingest, bloom-prefiltered: probe-negative rows skip the
    // anti-join entirely; answer must be bit-identical to q_dedup_incremental
    // (same oracle) since the bloom only routes rows ---
    "q_dedup_bloom" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incrementalBloom(
        all.where(col("doc_id") % 2 === 1), col("doc_id"),
        TextAnalysis.fingerprint(col("text")),
        all.where(col("doc_id") % 2 === 0)
          .select(TextAnalysis.fingerprint(col("text"))))
    }),

    // --- cross-doc duplicated 8-token spans, the exact-substring dedup
    // tier (oracle-checked) ---
    "q_dedup_spans" -> ((s, d) =>
      Dedup.dupSpans(docs(s, d), "doc_id", "text", spanLen = 8)),

    // --- winnowing (MOSS) fingerprint selection: ~2/(w+1)-density sketch
    // with the w+k-1 shared-run guarantee (oracle-checked) ---
    "q_dedup_winnow" -> ((s, d) =>
      Dedup.winnowFingerprints(docs(s, d), "doc_id", "text", k = 3, w = 4)),

    // --- MOSS match step: doc pairs sharing >= 3 winnowed fingerprints,
    // stop-gram fingerprints capped out of the join (oracle-checked) ---
    "q_dedup_winnow_pairs" -> ((s, d) =>
      Dedup.winnowPairs(docs(s, d), "doc_id", "text", k = 3, w = 4,
        minShared = 3L)),

    // --- cross-source overlap matrix: shared winnow fingerprints per
    // source pair, boilerplate fingerprints capped out, post-cap Jaccard
    // (oracle-checked) ---
    "q_dedup_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(docs(s, d), "doc_id", "text", "source",
        k = 3, w = 4, maxStrata = 10)),

    // --- the strip step completing q_dedup_spans: flagged spans removed,
    // survivors rejoined in token order (oracle replays detect+strip) ---
    "q_dedup_strip" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.stripSpans(dd, "doc_id", "text",
        Dedup.dupSpans(dd, "doc_id", "text", spanLen = 8), spanLen = 8)
    }),

    // --- paragraph/line-level global dedup: consecutive 10-token segments,
    // corpus-wide first occurrence survives, docs reassembled from kept
    // segments (oracle replays fingerprint → winner → rebuild) ---
    "q_dedup_segments" -> ((s, d) =>
      Dedup.dedupSegments(docs(s, d), "doc_id", "text", segLen = 10)),

    // --- intra-doc repeated-segment strip (the Gopher-repetition repair
    // step): winner scope narrowed to (doc, fingerprint) so cross-doc
    // repeats survive (oracle-checked) ---
    "q_dedup_segments_doc" -> ((s, d) =>
      Dedup.dedupSegments(docs(s, d), "doc_id", "text", segLen = 5,
        perDoc = true)),

    // --- soft dedup: 1/family_size loss weights instead of hard drops —
    // corpus stays intact, expected gradient matches the deduped one
    // (oracle-checked) ---
    "q_dedup_soft" -> ((s, d) =>
      Dedup.softWeights(docs(s, d), "doc_id", "text")),

    // --- LSH quality evaluation: banded-MinHash recall/precision vs the
    // exact blocked-Jaccard truth in the same id window — measures the
    // banding parameters on THIS corpus (oracle replays both pipelines) ---
    "q_dedup_minhash_recall" -> ((s, d) =>
      Dedup.minhashRecall(docs(s, d), "doc_id", "text",
        idWindow = 25L, threshold = 0.5)),

    // --- exact 2-gram Jaccard over id-window-blocked pairs (oracle-checked)
    "q_dedup_jaccard" -> ((s, d) => Dedup.jaccardPairs(
      docs(s, d), "doc_id", "text", ngram = 2,
      idWindow = 25L, threshold = 0.5)),

    // --- directed containment pairs: subset-duplication (doc inside doc)
    // the symmetric Jaccard tiers miss; both directions' scores reported
    // (oracle replays the same blocked join + intersection) ---
    "q_dedup_containment" -> ((s, d) => Dedup.containmentPairs(
      docs(s, d), "doc_id", "text", ngram = 2,
      idWindow = 25L, threshold = 0.8)),

    // --- MinHash+LSH near-dup pairs (rows-only; recall-tested in DedupSpec
    // at its own parameters). 16 hashes / 4 bands keeps the same rows-per-
    // band selectivity (r = 4) as 32/8 at half the signature cost — the
    // LSH quality knob is r and the verify threshold, not raw hash count ---
    "q_dedup_minhash" -> ((s, d) => Dedup.minhashPairs(
      docs(s, d), "doc_id", "text", ngram = 2,
      numHashes = 16, bands = 4, threshold = 0.7)),

    // --- exact char-5-gram Jaccard (byte-level dedup robustness; string
    // shingles end to end so the oracle replays without hashing) ---
    "q_dedup_jaccard_char" -> ((s, d) => Dedup.jaccardPairsChar(
      docs(s, d), "doc_id", "text")),

    // --- MinHash+LSH with md5-portable hashes: the SAME pipeline replayed
    // in DuckDB (Dedup.minhashOracleSql shares the hash constants), so the
    // full LSH candidate-generation + verification is hash-checked ---
    "q_dedup_minhash_md5" -> ((s, d) => Dedup.minhashPairsPortable(
      docs(s, d), "doc_id", "text")),

    // --- dedup families: connected components over the portable-minhash
    // pair graph, one min-id representative per family (oracle: recursive
    // transitive closure over the same pairs) ---
    "q_dedup_components" -> ((s, d) => Dedup.connectedComponents(
      Dedup.minhashPairsPortable(docs(s, d), "doc_id", "text"))),

    // --- corpus duplication profile: family-size histogram over the same
    // portable-minhash families + singleton fallback (oracle-checked) ---
    "q_dedup_profile" -> ((s, d) => Dedup.duplicationProfile(docs(s, d),
      Dedup.minhashPairsPortable(docs(s, d), "doc_id", "text"), "doc_id")),

    // --- quality-aware dedup retention: the portable-minhash families with
    // the best-quality member kept (ties to lower id) — what a curation
    // pass does with near-dup families (oracle: recursive closure + the
    // same quality window) ---
    "q_dedup_keep_best" -> ((s, d) => Dedup.keepBest(
      Dedup.minhashPairsPortable(docs(s, d), "doc_id", "text"),
      docs(s, d).select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("score")))),

    // --- batch analogue of the streaming minhash-band dedup state: per
    // band bucket the winning doc + claim count (oracle-checked) ---
    "q_dedup_band_claims" -> ((s, d) => Dedup.minhashBandClaims(
      docs(s, d), "doc_id", "text")),

    // --- fuzzy (edit-distance) near-dup pairs on blocked prefix compare:
    // the record-linkage tier below the Jaccard/MinHash families
    // (oracle-checked — levenshtein is identical unit-cost in DuckDB) ---
    "q_dedup_fuzzy" -> ((s, d) => Dedup.fuzzyPairs(
      docs(s, d), "doc_id", "text")),

    // --- SimHash near-dup pairs (rows-only; custom Catalyst expression) ---
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashPairs(
      docs(s, d), "doc_id", "text", maxHamming = 3)),

    // --- SimHash with md5-portable 60-bit hashes: same band-blocked
    // pipeline replayed in DuckDB (Dedup.simhashOracleSql) → hash-checked ---
    "q_dedup_simhash_md5" -> ((s, d) => Dedup.simhashPairsPortable(
      docs(s, d), "doc_id", "text", maxHamming = 3)),
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_minhash_md5" -> Dedup.minhashOracleSql(),

    "q_dedup_fuzzy" -> Dedup.fuzzyOracleSql(),

    "q_dedup_simhash_md5" -> Dedup.simhashOracleSql(),

    "q_dedup_jaccard_char" -> Dedup.jaccardCharOracleSql(),

    "q_dedup_containment" -> Dedup.containmentOracleSql(),

    "q_dedup_band_claims" -> Dedup.bandClaimsOracleSql(),

    "q_dedup_components" -> Dedup.componentsOracleSql(Dedup.minhashOracleSql()),

    "q_dedup_profile" -> Dedup.duplicationProfileOracleSql(
      Dedup.minhashOracleSql()),

    "q_dedup_keep_best" -> Dedup.keepBestOracleSql(
      Dedup.minhashOracleSql(), TextAnalysis.qualitySql("text")),

    "q_dedup_band_sweep" -> Dedup.bandSweepOracleSql(
      idWindow = 25L, threshold = 0.5),

    "q_dedup_segments" -> Dedup.dedupSegmentsOracleSql(segLen = 10),

    "q_dedup_minhash_recall" ->
      Dedup.minhashRecallOracleSql(idWindow = 25L, threshold = 0.5),

    "q_dedup_soft" -> Dedup.softWeightsOracleSql(),

    "q_dedup_segments_doc" ->
      Dedup.dedupSegmentsOracleSql(segLen = 5, perDoc = true),

    "q_dedup_incremental" -> incrementalIngestOracle,

    // bloom routing is answer-invariant → the SAME oracle string: the two
    // entries can never drift apart
    "q_dedup_bloom" -> incrementalIngestOracle,

    "q_dedup_exact" ->
      """SELECT array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS dup_key,
        |       min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q_dedup_spans" -> Dedup.dupSpansOracleSql(spanLen = 8),

    "q_dedup_strip" -> Dedup.stripSpansOracleSql(spanLen = 8),

    "q_dedup_winnow" -> Dedup.winnowOracleSql(k = 3, w = 4),

    "q_dedup_winnow_pairs" ->
      Dedup.winnowPairsOracleSql(k = 3, w = 4, minShared = 3L),

    "q_dedup_overlap" ->
      Dedup.sourceOverlapOracleSql(k = 3, w = 4, maxStrata = 10),

    "q_dedup_jaccard" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
        |           ELSE list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1]) END) AS sh
        |  FROM (SELECT doc_id,
        |          ${TextAnalysis.toksSql("text")} AS toks
        |        FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       len(list_intersect(a.sh, b.sh))::DOUBLE /
        |         (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE AS jaccard
        |FROM t a JOIN t b
        |  ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 25
        |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::DOUBLE >= 0.5""".stripMargin,
  )
}
