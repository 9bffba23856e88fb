package graft.queries

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis queries over `documents` (SURVEY.md §2c): tokenize /
  * n-grams / tf-idf, quality batteries, tokenizer training (BPE and
  * unigram-LM), LM statistics, PII, contamination, classifiers.
  *
  * Oracle policy (shared across the query registry): deterministic
  * rational/string computations get full DuckDB oracles
  * (dialect-translated); probabilistic pipelines whose correctness
  * contract is recall vs an exact baseline are covered by ScalaTest
  * brute-force comparisons and registered rows-only.
  */
object TextQueries {

  private def docs(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d) // registers views + all UDAF/expression families
    s.table("documents")
  }

  /** Topic lexicons for the keyword-tagging gate — drawn from the synthetic
    * corpus vocabulary so every topic actually fires at gate scale.
    */
  val KeywordTopics: Map[String, Seq[String]] = Map(
    "execution" -> Seq("scan", "join", "agg", "sort", "filter", "hash",
      "merge"),
    "storage" -> Seq("table", "row", "column", "batch"),
    "perf" -> Seq("fast", "slow", "big", "small"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- text analysis: per-doc stats (oracle-checked) ---
    "q_text_stats" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"),
      length(col("text")).cast("long").as("n_chars_real"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.stopwordRatio(TextAnalysis.tokens(col("text"))).as("stopword_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality"))),

    // --- canonical fingerprint (oracle-checked: md5 on both engines) ---
    "q_text_fingerprint" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))),

    // --- BPE merge-pair candidates (oracle-checked): one tokenizer-training
    // iteration's weighted adjacent-pair counts over the distinct-word table ---
    "q_text_bpe_pairs" -> ((s, d) =>
      TextAnalysis.bpePairStats(docs(s, d), "doc_id", "text", topK = 50)),

    // --- full BPE trainer (oracle-checked: the k-round merge loop is
    // deterministic — total tiebreak order — so the oracle unrolls it into
    // a chained-CTE DuckDB replay, TextAnalysis.bpeTrainOracleSql) ---
    "q_text_bpe_merges" -> ((s, d) =>
      TextAnalysis.bpeTrain(docs(s, d), "doc_id", "text", numMerges = 10)),

    // --- distributed BPE encode with the freshly trained merges: per-doc
    // word + subword totals (oracle: shared trainer CTEs + vocab replace
    // chain, so both engines train AND encode identically) ---
    "q_text_bpe_encode" -> ((s, d) =>
      TextAnalysis.bpeEncodeCorpus(docs(s, d), "doc_id", "text", numMerges = 10)),

    // --- per-language tokenizer fertility of the trained merge table: the
    // multilingual tokenizer-equity diagnostic (oracle-checked) ---
    "q_text_fertility" -> ((s, d) =>
      TextAnalysis.tokenizerFertility(docs(s, d), "doc_id", "text", "lang",
        numMerges = 10)),

    // --- unigram-LM (SentencePiece) tokenizer seeding: every char + the
    // top-K frequency-weighted multi-char substrings of the distinct-word
    // vocabulary (oracle-checked) ---
    "q_text_unigram_vocab" -> ((s, d) =>
      TextAnalysis.unigramSeedVocab(docs(s, d), "doc_id", "text",
        maxPieceLen = 5, topK = 120)),

    // --- unigram-LM hard-EM training round: canonical Viterbi path per
    // distinct word (tight-edge + min-j walk, no backpointer state),
    // M-step piece counts — unused pieces drop, UNK chars enter
    // (oracle-checked via recursive-CTE walk) ---
    "q_text_unigram_train" -> ((s, d) =>
      TextAnalysis.unigramTrain(docs(s, d), "doc_id", "text",
        maxPieceLen = 5, topK = 120)),

    // --- k-round hard-EM unigram training (the full SentencePiece loop):
    // each round re-segments under the previous round's counts and
    // re-estimates — unused pieces drop out, segmentations sharpen;
    // replayed round-for-round in the chained-CTE oracle (oracle-checked)
    "q_text_unigram_em" -> ((s, d) =>
      TextAnalysis.unigramTrainEm(docs(s, d), "doc_id", "text",
        rounds = 2, maxPieceLen = 5, topK = 120)),

    // --- unigram-LM Viterbi encode: per-doc piece counts + exact
    // micro-nat NLL of the max-likelihood segmentation under the seeded
    // vocab — min-plus path doubling on the packed (cost, pieces) key,
    // replayed in DuckDB (oracle-checked) ---
    "q_text_unigram_encode" -> ((s, d) => {
      val dd = docs(s, d)
      TextAnalysis.unigramEncode(dd, "doc_id", "text",
        TextAnalysis.unigramSeedVocab(dd, "doc_id", "text",
          maxPieceLen = 5, topK = 120), maxPieceLen = 5)
    }),

    // --- Unicode script-mix profile: code-point range counts + ratios,
    // the model-free mislabeled-language signal (oracle-checked) ---
    "q_text_scripts" -> ((s, d) =>
      TextAnalysis.scriptProfile(docs(s, d), "doc_id", "text")),

    // --- readability battery: fixed-point Flesch / FK-grade / TTR, the
    // curriculum-difficulty axes as one map-only pass (oracle-checked) ---
    "q_text_readability" -> ((s, d) =>
      TextAnalysis.readability(docs(s, d), "doc_id", "text")),

    // --- keyword/topic tagging against a broadcast dictionary: per-doc
    // topic hit counts + deterministic dominant topic (oracle-checked) ---
    "q_text_keywords" -> ((s, d) =>
      TextAnalysis.keywordTag(docs(s, d), "doc_id", "text", KeywordTopics)),

    // --- skip-gram (center, context) pair counts: the word2vec/GloVe
    // training-data generation pass, map-only offsets (oracle-checked) ---
    "q_text_skipgrams" -> ((s, d) =>
      TextAnalysis.skipGrams(docs(s, d), "text", window = 3,
        minCount = 25)),

    // --- χ² feature selection per (token, language): the vocabulary
    // pruner for the NB classifier tier, exact fixed-point contingency
    // arithmetic on the DECIMAL carrier (oracle-checked) ---
    "q_text_chi2" -> ((s, d) =>
      TextAnalysis.chi2Features(docs(s, d), "doc_id", "text", "lang",
        minDf = 10)),

    // --- PII redaction (oracle-checked): the corpus carries no PII, so a
    // deterministic email/phone/IP derived from doc_id is appended on BOTH
    // engines, then scrubbed — placeholders and counts must hash-match ---
    "q_text_redact" -> ((s, d) => {
      val withPii = docs(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-0199 from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7")).as("text"))
      TextAnalysis.redactPii(withPii, "doc_id", "text")
    }),

    // --- rolling-hash fingerprint (order-sensitive Rabin-Karp over tokens;
    // custom codegen expression — rows-only, no 64-bit wrapping-arithmetic
    // equivalent in the oracle engine) ---
    "q_text_rolling_fp" -> ((s, d) => docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        graft.functions.RollingHash.rollingHash64(col("toks")).as("fp64"))),

    // --- portable rolling fingerprint (md5 token hashes, mod-prime fold):
    // same Rabin-Karp structure as above but engine-portable, so it IS
    // oracle-checked (TextAnalysis.rollingFpOracleSql) ---
    "q_text_rolling_fp_mod" -> ((s, d) => docs(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextAnalysis.portableRollingFp(col("toks")).as("fp_mod"))),

    // --- per-doc token-distribution entropy (repetition/diversity quality
    // signal; oracle-checked — sorted in-row fold, 6 dp) ---
    "q_text_entropy" -> ((s, d) =>
      TextAnalysis.tokenEntropy(docs(s, d), "doc_id", "text")),

    // --- Gopher-style repetition filter signals (oracle-checked) ---
    "q_text_repetition" -> ((s, d) =>
      TextAnalysis.repetitionStats(docs(s, d), "doc_id", "text", n = 3)),

    // --- benchmark decontamination: 4-gram overlap counts between the
    // corpus and a probe ("benchmark") slice — every 20th doc plays the
    // benchmark (oracle-checked) ---
    "q_text_contamination" -> ((s, d) => {
      val all = docs(s, d)
      TextAnalysis.contamination(
        all.where(col("doc_id") % 20 =!= 0), "doc_id", "text",
        all.where(col("doc_id") % 20 === 0), "doc_id", "text", n = 4)
    }),

    // --- CCNet-style LM quality filter: per-doc unigram cross-entropy
    // against the corpus distribution (oracle-checked) ---
    "q_text_perplexity" -> ((s, d) =>
      TextAnalysis.unigramCrossEntropy(docs(s, d), "doc_id", "text")),

    // --- bigram-LM cross-entropy: the conditional upgrade of the CCNet
    // filter — word-order scrambles surface here (oracle-checked) ---
    "q_text_bigram_lm" -> ((s, d) =>
      TextAnalysis.bigramCrossEntropy(docs(s, d), "doc_id", "text")),

    // --- PMI collocations: multiword-expression extraction (oracle-checked)
    "q_text_collocations" -> ((s, d) =>
      TextAnalysis.collocations(docs(s, d), "doc_id", "text", minCount = 25)),

    // --- language ID heuristic + confusion counts vs the labeled column ---
    "q_text_langid" -> ((s, d) => docs(s, d)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))),

    // --- Kneser-Ney smoothed bigram LM: absolute discount + continuation
    // back-off as one exact integer rational (oracle-checked) ---
    "q_text_kneser" -> ((s, d) =>
      TextAnalysis.kneserNey(docs(s, d), "text", topN = 100)),

    // --- Hill tail-index of the token-frequency distribution: the
    // heavy-tail exponent next to zipf's OLS slope (oracle-checked) ---
    "q_text_hill" -> ((s, d) =>
      TextAnalysis.hillTailIndex(docs(s, d), "text", k = 100)),

    // --- logistic-regression language classifier trained by batch GD
    // inside the engine: hard-sigmoid forward, exact micro-unit weights,
    // one aggregate per round (oracle replays every round) ---
    "q_text_logreg" -> ((s, d) =>
      TextAnalysis.logisticTrain(docs(s, d), "doc_id", "text", "lang",
        posLabel = "en", iters = 8, lrMicro = 2000000L)),

    // --- TextRank keywords: PageRank centrality over the content-word
    // adjacency graph, exact micro-unit iteration (oracle-checked) ---
    "q_text_textrank" -> ((s, d) =>
      TextAnalysis.textRank(docs(s, d), "doc_id", "text",
        iters = 5, topK = 50)),

    // --- sliding-window chunking for training pipelines (oracle-checked) ---
    "q_text_chunk" -> ((s, d) =>
      TextAnalysis.chunk(docs(s, d), "doc_id", "text", window = 32, stride = 24)),

    // --- tf-idf top terms per doc (oracle-checked; log rounded to 6dp) ---
    "q_text_tfidf" -> ((s, d) =>
      TextAnalysis.tfIdf(docs(s, d), "doc_id", "text", topK = 3)),

    // --- Gopher rule battery (Rae et al. 2021 A1.1): every signal + the
    // composite verdict, one map-only pass (oracle-checked) ---
    "q_text_gopher" -> ((s, d) =>
      TextAnalysis.gopherQuality(docs(s, d), "doc_id", "text", minWords = 20)),

    // --- multinomial Naive Bayes language classifier, trained AND applied
    // on the corpus as one DataFrame program (oracle-checked) ---
    "q_text_nbayes" -> ((s, d) =>
      TextAnalysis.naiveBayes(docs(s, d), "lang", docs(s, d), "doc_id", "text")),

    // --- domain-scoped BOILERPLATE strip (CCNet/RefinedWeb): bigram
    // segments repeated in >= 3 distinct docs of one source are template
    // text, removed from EVERY doc of that source — unlike dedup's
    // winner-keeps; identical text in other sources untouched
    // (oracle-checked) ---
    "q_text_boilerplate" -> ((s, d) =>
      Dedup.stripBoilerplate(docs(s, d), "doc_id", "text", "source",
        segLen = 2, minDocs = 3)),

    // --- per-doc 3-gram novelty of the doc_id % 20 probe batch vs the
    // rest of the corpus: unseen-gram ratio in exact micro-units
    // (oracle-checked) ---
    "q_text_novelty" -> ((s, d) => {
      val all = docs(s, d)
      TextAnalysis.ngramNovelty(
        all.where(col("doc_id") % 20 =!= 0), "doc_id", "text",
        all.where(col("doc_id") % 20 === 0), "doc_id", "text", n = 3)
    }),

    // --- label-noise confusion: corpus-trained Naive Bayes cross-predicts
    // every doc's lang; off-diagonal cells = metadata error estimate
    // (oracle-checked) ---
    "q_text_label_noise" -> ((s, d) =>
      TextAnalysis.labelNoise(docs(s, d), "lang", "doc_id", "text")),

    // --- vocabulary building: corpus-wide token counts with a min-count
    // floor and deterministic rank — the vocab artifact of a tokenizer
    // training step (hash groupBy: map-side combine, scales with distinct
    // tokens, not corpus size) ---
    "q_text_vocab" -> ((s, d) => docs(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .where(col("n") >= 25)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))).cast("long"))),

    // --- Zipf rank-frequency fit: OLS slope/r² over the top-100 terms'
    // log-log curve — rank-sorted sequential fold, deterministic doubles
    // (oracle-checked) ---
    "q_text_zipf" -> ((s, d) =>
      TextAnalysis.zipfFit(docs(s, d), "text", topN = 100)),

    // --- fill-in-the-middle: PSM reordering at deterministic hash cuts,
    // 50% apply rate, verbatim passthrough otherwise (oracle-checked) ---
    "q_text_fim" -> ((s, d) =>
      TextAnalysis.fimTransform(docs(s, d), "doc_id", "text",
        fimRatePct = 50L)),

    // --- T5 span corruption: deterministic hash-selected token spans
    // masked to sentinels, (input, target) training pairs
    // (oracle-checked) ---
    "q_text_span_corrupt" -> ((s, d) =>
      TextAnalysis.spanCorrupt(docs(s, d), "doc_id", "text",
        spanLen = 3, everyK = 12L)),

    // --- content-defined chunking: rolling-hash boundaries (mean ~12
    // tokens), insertion-robust chunk fingerprints for incremental dedup
    // (oracle-checked) ---
    "q_text_chunk_cdc" -> ((s, d) =>
      TextAnalysis.chunkCdc(docs(s, d), "doc_id", "text",
        w = 4, divisor = 12L)),

    // --- Heaps'-law vocabulary-growth fit: β exponent of V ≈ K·n^β over
    // doc-order prefix points, two-level mega-partition-proof cumsum
    // (oracle-checked) ---
    "q_text_heaps" -> ((s, d) =>
      TextAnalysis.heapsFit(docs(s, d), "doc_id", "text",
        sampleEvery = 8L, bucketSize = 64L)),

    // --- Good-Turing frequency-of-frequencies: N_r table + exact-rational
    // adjusted counts r* = (r+1)·N_{r+1}/N_r (oracle-checked) ---
    "q_text_goodturing" -> ((s, d) =>
      TextAnalysis.goodTuring(docs(s, d), "text", maxR = 10, ngram = 3)),

    // --- Luhn mod-10 checksum battery: the payment-card precision gate of
    // a PII detector, run over synthetic variable-length digit runs
    // (13–16) derived from order keys (oracle-checked) ---
    "q_text_luhn" -> ((s, d) => {
      Tables.load(s, d)
      s.table("orders")
        .select(col("o_orderkey"),
          expr("lpad(cast(o_orderkey as string), " +
            "cast(13 + o_orderkey % 4 as int), '0')").as("pan"))
        .select(col("o_orderkey"), col("pan"),
          TextAnalysis.luhnValid(col("pan")).as("luhn_ok"))
    }),

    // --- expected mutual information (token, language) feature ranking:
    // the information-mass selector next to q_text_chi2's significance
    // ranking — exact counts, fixed-order 6-dp log terms (oracle-checked) ---
    "q_text_mi" -> ((s, d) =>
      TextAnalysis.mutualInfo(docs(s, d), "doc_id", "text", "lang",
        minDf = 10)),

    // --- corpus-pair unigram KL divergence vs the 'en' slice: the TEXT
    // drift detector next to the numeric PSI/KS — add-one smoothing,
    // per-term 1e9 fixed-point so the sum is exact in any order
    // (oracle-checked) ---
    "q_text_jsd" -> ((s, d) =>
      TextAnalysis.corpusJsd(docs(s, d), "text", "lang", minCount = 10)),

    "q_text_kl" -> ((s, d) =>
      TextAnalysis.corpusKl(docs(s, d), "text", "lang", base = "en")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_text_entropy" -> TextAnalysis.entropyOracleSql(),

    "q_text_repetition" -> TextAnalysis.repetitionOracleSql(n = 3),

    "q_text_collocations" -> TextAnalysis.collocationsOracleSql(minCount = 25),

    "q_text_perplexity" -> TextAnalysis.crossEntropyOracleSql(),

    "q_text_bigram_lm" -> TextAnalysis.bigramCrossEntropyOracleSql(),

    "q_text_gopher" -> TextAnalysis.gopherOracleSql(minWords = 20),

    "q_text_readability" -> TextAnalysis.readabilityOracleSql(),

    "q_text_keywords" -> TextAnalysis.keywordTagOracleSql(KeywordTopics),

    "q_text_skipgrams" -> TextAnalysis.skipGramsOracleSql(window = 3,
      minCount = 25),

    "q_text_chi2" -> TextAnalysis.chi2OracleSql(minDf = 10),

    "q_text_nbayes" -> TextAnalysis.naiveBayesOracleSql(),

    "q_text_contamination" -> TextAnalysis.contaminationOracleSql(n = 4),

    "q_text_rolling_fp_mod" -> TextAnalysis.rollingFpOracleSql(),

    "q_text_vocab" ->
      s"""SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rank
        |FROM (
        |  SELECT token, count(*) AS n FROM (
        |    SELECT unnest(${TextAnalysis.toksSql("text")}) AS token
        |    FROM documents)
        |  GROUP BY token)
        |WHERE n >= 25""".stripMargin,

    "q_text_zipf" -> TextAnalysis.zipfOracleSql(topN = 100),

    "q_text_hill" -> TextAnalysis.hillOracleSql(k = 100),

    "q_text_kneser" -> TextAnalysis.kneserNeyOracleSql(topN = 100),

    "q_text_heaps" -> TextAnalysis.heapsOracleSql(sampleEvery = 8L),

    "q_text_chunk_cdc" ->
      TextAnalysis.chunkCdcOracleSql(w = 4, divisor = 12L),

    "q_text_span_corrupt" ->
      TextAnalysis.spanCorruptOracleSql(spanLen = 3, everyK = 12L),

    "q_text_fim" -> TextAnalysis.fimOracleSql(fimRatePct = 50L),

    "q_text_goodturing" ->
      TextAnalysis.goodTuringOracleSql(maxR = 10, ngram = 3),

    "q_text_luhn" -> {
      val pan = "lpad(o_orderkey::VARCHAR, (13 + o_orderkey % 4)::INT, '0')"
      s"""SELECT o_orderkey, pan, ${TextAnalysis.luhnSql("pan")} AS luhn_ok
         |FROM (SELECT o_orderkey, $pan AS pan FROM orders)""".stripMargin
    },

    "q_text_boilerplate" -> Dedup.stripBoilerplateOracleSql(segLen = 2,
      minDocs = 3),

    "q_text_label_noise" -> TextAnalysis.labelNoiseOracleSql(),

    "q_text_novelty" ->
      TextAnalysis.ngramNoveltyOracleSql(n = 3, probePred = "id % 20 = 0"),

    "q_text_stats" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, text,
        |         ${TextAnalysis.toksSql("text")} AS toks
        |  FROM documents)
        |SELECT doc_id, lang,
        |       len(toks)::BIGINT AS n_tokens,
        |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS n_subwords,
        |       length(text)::BIGINT AS n_chars_real,
        |       CASE WHEN length(text) = 0 THEN 0.0
        |            ELSE length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE / length(text)::DOUBLE END AS punct_ratio,
        |       CASE WHEN len(toks) = 0 THEN 0.0
        |            ELSE len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for'], x)))::DOUBLE / len(toks)::DOUBLE END AS stopword_ratio,
        |       ${TextAnalysis.qualitySql("text")} AS quality
        |FROM t""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |       md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,

    "q_text_bpe_pairs" -> TextAnalysis.bpeOracleSql(topK = 50),

    // the FULL trainer loop, unrolled to a 10-round CTE chain — the last
    // deterministic rows-only query gained an oracle (VERDICT r03 item 3)
    "q_text_bpe_merges" -> TextAnalysis.bpeTrainOracleSql(numMerges = 10),

    "q_text_bpe_encode" -> TextAnalysis.bpeEncodeOracleSql(numMerges = 10),

    "q_text_unigram_vocab" -> TextAnalysis.unigramSeedVocabOracleSql(
      maxPieceLen = 5, topK = 120),

    "q_text_unigram_encode" -> TextAnalysis.unigramEncodeOracleSql(
      maxPieceLen = 5, topK = 120),

    "q_text_unigram_train" -> TextAnalysis.unigramTrainOracleSql(
      maxPieceLen = 5, topK = 120),

    "q_text_unigram_em" -> TextAnalysis.unigramTrainEmOracleSql(
      rounds = 2, maxPieceLen = 5, topK = 120),

    "q_text_fertility" -> TextAnalysis.fertilityOracleSql("lang",
      numMerges = 10),

    "q_text_scripts" -> TextAnalysis.scriptProfileOracleSql(),

    "q_text_redact" -> TextAnalysis.redactOracleSql(
      "text || ' contact user' || doc_id || '@example.com or call 555-' || " +
        "lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199 from 10.0.' || " +
        "(doc_id % 256)::VARCHAR || '.7'"),

    // faithful DuckDB replication of TextAnalysis.langId: the shared
    // langIdPredCtes fragment (score lists + tie-break CASE generated from
    // langProfiles — ties toward the later code, matching Spark's
    // struct(score, code) array_max ordering; CJK short-circuit, 'und'
    // when nothing scores)
    "q_text_langid" ->
      s"""WITH ${TextAnalysis.langIdPredCtes()}
        |SELECT gold AS lang, pred AS predicted, count(*) AS n
        |FROM p GROUP BY 1, 2""".stripMargin,

    // TextRank: word-adjacency edge build + the shared PageRank
    // chained-CTE iteration, top-k by (rank desc, word)
    "q_text_textrank" -> TextAnalysis.textRankOracleSql(iters = 5, topK = 50),

    // logistic GD trainer: one (gradient, weights) CTE pair per round,
    // identical sign-safe integer division
    "q_text_logreg" -> TextAnalysis.logisticTrainOracleSql(
      "lang", posLabel = "en", iters = 8, lrMicro = 2000000L),

    "q_text_chunk" ->
      s"""WITH t AS (
        |  SELECT doc_id AS doc,
        |         ${TextAnalysis.toksSql("text")} AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc, toks,
        |         CASE WHEN len(toks) <= 32 THEN 1
        |              ELSE (len(toks) - 32 + 24 - 1) // 24 + 1 END AS n_chunks
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc, i AS chunk_id,
        |       array_to_string(toks[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text,
        |       len(toks[i * 24 + 1 : i * 24 + 32])::BIGINT AS n_tokens
        |FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(i)""".stripMargin,

    "q_text_tfidf" ->
      s"""WITH terms AS (
        |  SELECT doc_id AS doc, unnest(
        |    ${TextAnalysis.toksSql("text")}) AS term
        |  FROM documents),
        |tf AS (SELECT doc, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc, tf.term, tf,
        |         tf * ln((n_docs + 1)::DOUBLE / (df_t + 1)::DOUBLE) AS tfidf
        |  FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n),
        |ranked AS (
        |  SELECT doc, term, tfidf,
        |         row_number() OVER (PARTITION BY doc ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |SELECT doc, term, round(tfidf, 6) AS score, rn AS rank
        |FROM ranked WHERE rn <= 3""".stripMargin,

    "q_text_mi" -> TextAnalysis.mutualInfoOracleSql(),

    "q_text_kl" -> TextAnalysis.corpusKlOracleSql("lang", base = "en"),

    "q_text_jsd" -> TextAnalysis.corpusJsdOracleSql("lang", minCount = 10),
  )
}
