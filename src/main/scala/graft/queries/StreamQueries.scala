package graft.queries

import graft.operators.Multimodal
import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-time windowing (batch mode of the unified streaming transforms —
  * the streaming execution of the same code is exercised in StreamingSpec
  * with watermarks) and multimodal binary-column queries.
  *
  * Events oracles cast DuckDB's ns timestamps to micros (`ts::TIMESTAMP`),
  * matching `Tables`' `ts div 1000` conversion; window starts are computed
  * with epoch-microsecond floor division on both engines.
  */
object StreamQueries {

  private def events(s: SparkSession, d: String): DataFrame = {
    Tables.load(s, d)
    s.table("events")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> ((s, d) =>
      EventStreams.tumblingStats(events(s, d), "15 minutes")),

    // per-window KMV distinct-user sketch — the mergeable bottom-k
    // aggregate (O(k) window state); exact below k, floor-division
    // estimate above, both replayed by the oracle (oracle-checked)
    "q_stream_kmv" -> ((s, d) =>
      EventStreams.windowedKmv(events(s, d), "1 hour", col("user_id"),
        k = 64)),

    // per-window portable HLL distinct-user sketch — m-byte register
    // state per window, fixed-point raw estimator, every value (estimate
    // included) hash-checked against the oracle (oracle-checked)
    "q_stream_hll" -> ((s, d) =>
      EventStreams.windowedHll(events(s, d), "1 hour", col("user_id"),
        p = 8)),

    // per-window portable quantile sketch — p50/p90/p99 of event value
    // per hour from the mergeable KllSketch level sample (O(k) window
    // state), every read-off hash-checked against the oracle
    // (oracle-checked)
    "q_stream_kll" -> ((s, d) =>
      EventStreams.windowedKll(events(s, d), "1 hour", col("value"),
        col("event_id"), k = 256, qPermille = Seq(500, 900, 990))),

    // per-window WEIGHTED quantile sketch — unit-weighted p50/p90 of
    // event value per hour from the mergeable KllWeightedSketch survivor
    // sample (O(k) window state; weight = a deterministic 1..9 units
    // column derived from user_id), every read-off hash-checked
    // (oracle-checked)
    "q_stream_kll_w" -> ((s, d) =>
      EventStreams.windowedKllWeighted(events(s, d), "1 hour",
        col("value"), lit(1L) + pmod(col("user_id"), lit(9L)),
        col("event_id"), k = 256, qPermille = Seq(500, 900))),

    // deterministic per-(event_type, hour) rate limiter: first 3 events
    // by (ts, event_id) survive — the ingestion throttle with provenance
    // (oracle-checked; arrival-order streaming twin spec-pinned)
    "q_stream_ratelimit" -> ((s, d) =>
      EventStreams.windowedRateLimit(events(s, d), "1 hour",
        col("event_type"), n = 3)),

    // per-window Misra-Gries heavy hitters — k=8 > the 5 event types, so
    // the sketch is the exact per-window count table (oracle-checked; the
    // approximate regime's bound is spec-tested)
    "q_stream_topk" -> ((s, d) =>
      EventStreams.windowedTopK(events(s, d), "1 hour", col("event_type"),
        k = 8, topN = 3)),

    // inter-arrival burstiness per type: periodic -1 / Poisson 0 / bursty
    // +1 on exact integer gap moments (oracle-checked) ---
    "q_stream_burstiness" -> ((s, d) =>
      EventStreams.interArrivalBurstiness(events(s, d))),

    // per-window exact p50/p95/p99 of value on the explicit ceil(p·n)
    // rank and cents carrier — the comparator-proof percentile convention
    // (oracle-checked)
    "q_stream_latency" -> ((s, d) =>
      EventStreams.windowedPercentiles(events(s, d), "1 hour",
        col("value"))),

    "q_stream_sliding" -> ((s, d) =>
      EventStreams.slidingCounts(events(s, d), "30 minutes", "15 minutes")),

    "q_stream_session" -> ((s, d) =>
      EventStreams.sessionize(events(s, d), "30 minutes")),

    // the reference's monoid UDAF as a windowed event-time aggregate
    // (element-wise array sum per 15-minute window); dump explodes the
    // result array per the driver's scalar-columns contract
    "q_stream_reduce" -> ((s, d) => {
      val ev = events(s, d).select(col("ts"),
        array(col("event_id") % 5, col("user_id") % 7, lit(1L)).as("arr"))
      EventStreams.tumblingArrayReduce(ev, "15 minutes", col("arr"))
        .select(col("win_start"), posexplode(col("red")))
        .select(col("win_start"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("red"))
    }),

    // the custom flatMapGroupsWithState sessionizer, run in batch mode —
    // deterministic, so it goes through the DuckDB gate like any operator
    "q_stream_stateful_sessions" -> ((s, d) => {
      import s.implicits._
      val ds = events(s, d)
        .select(col("user_id"), col("ts"), col("value"))
        .as[EventStreams.Event]
      EventStreams.statefulSessions(ds, gapMs = 30L * 60 * 1000).toDF()
    }),

    // the watermarked stream-stream interval join, run on the batch tables —
    // an equi+range join (equi on user, range on event time)
    "q_range_join" -> ((s, d) => {
      val ev = events(s, d)
      EventStreams.intervalJoin(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "purchase"),
        watermark = "1 hour", lookback = "10 minutes")
        .select(col("click_id"), col("user_id"), col("purchase_ts"),
          col("purchase_value"))
    }),

    // the LEFT OUTER stream-stream interval join on the batch tables: same
    // equi+range join, but clicks with no in-window purchase survive with
    // null purchase columns — the batch replay of the state-expiry outer
    // semantics StreamingSpec exercises with watermarks (deterministic, so
    // it goes through the DuckDB gate like the inner form)
    "q_stream_interval_outer" -> ((s, d) => {
      val ev = events(s, d)
      EventStreams.intervalJoinLeftOuter(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "purchase"),
        watermark = "1 hour", lookback = "10 minutes")
        .select(col("click_id"), col("user_id"), col("purchase_ts"),
          col("purchase_value"))
    }),

    // time-series resample + forward fill: dense 15-min grid per user over
    // their active span, gaps carry the last observed bucket max forward
    // (a 1-in-20 user slice — the full-corpus grid is a 420k-row dump at
    // sf0.01, far past what the gate's comparator needs to prove the op)
    "q_stream_gapfill" -> ((s, d) =>
      graft.operators.Temporal.resampleFill(
        events(s, d).where(col("user_id") % 20 === 0),
        "user_id", "ts", "value", bucketSec = 900L)),

    // --- ordered-sequence funnel: per-user greedy signup→click→purchase
    // subsequence match within 24h of the matched signup, per-step user
    // reach (oracle: the same staged SQL) ---
    "q_stream_funnel" -> ((s, d) =>
      graft.streaming.EventStreams.funnel(events(s, d),
        Seq("signup", "click", "purchase"), maxSpan = Some("24 hours"))),

    // --- weekly cohort retention: signup-week cohorts × activity-week
    // offsets, Monday-aligned in both engines (oracle-checked) ---
    "q_stream_cohorts" -> ((s, d) =>
      graft.streaming.EventStreams.cohortRetention(events(s, d), "signup")),

    // --- first-order Markov transition matrix over per-user journeys:
    // (from, to) counts + row-normalized probability in exact integer
    // micro-units (oracle-checked) ---
    "q_stream_transitions" -> ((s, d) =>
      graft.streaming.EventStreams.transitions(events(s, d))),

    // --- RFM behavioral segmentation: per-user recency/frequency/
    // monetary with global quintile scores on exact integer carriers
    // (oracle-checked) ---
    "q_stream_rfm" -> ((s, d) =>
      graft.streaming.EventStreams.rfmScores(events(s, d), nTiles = 5)),

    // --- last-touch conversion attribution: each purchase credited to
    // the user's nearest click/view within 6h, else 'direct'
    // (oracle-checked) ---
    "q_stream_attribution" -> ((s, d) =>
      graft.streaming.EventStreams.attribution(events(s, d),
        convType = "purchase", touchTypes = Seq("click", "view"),
        lookbackSec = 6L * 3600)),

    // --- ingest-rate anomaly: hourly per-type counts vs their trailing
    // 12-bucket mean in exact micro-units; full-baseline warm-up before
    // any flag fires (oracle-checked) ---
    "q_stream_anomaly" -> ((s, d) =>
      graft.streaming.EventStreams.rateAnomaly(events(s, d),
        bucketSec = 3600L, trail = 12, thresholdMicro = 2000000L)),

    // --- EWMA-forecast anomaly: the drift-adapting companion — each
    // hourly count scored against the exponential baseline of all prior
    // buckets, sequential fold in exact micro-units (oracle-checked) ---
    "q_stream_ewma" -> ((s, d) =>
      graft.streaming.EventStreams.ewmaAnomaly(events(s, d),
        bucketSec = 3600L, halfK = 3, warm = 24,
        thresholdMicro = 2500000L)),

    // --- Mann-Kendall trend + Theil-Sen slope per type: nonparametric
    // monotone-drift detection over the hourly rate series — exact pair
    // counting, micro-floor tau, discrete-median slope (oracle-checked) ---
    "q_stream_trend" -> ((s, d) =>
      graft.streaming.EventStreams.trendTest(events(s, d),
        bucketSec = 3600L)),

    // --- seasonal Mann-Kendall (Hirsch-Slack): pairs restricted to the
    // same hour-of-day so the daily cycle cancels exactly — the correct
    // drift test for cyclic rates (oracle-checked) ---
    "q_stream_trend_seasonal" -> ((s, d) =>
      graft.streaming.EventStreams.trendTestSeasonal(events(s, d),
        bucketSec = 3600L, period = 24)),

    // --- 2x2 chi-square A/B test: user-parity cohorts, purchase
    // conversion, exact cells + the shared IEEE tail (oracle-checked) ---
    "q_stream_abtest" -> ((s, d) =>
      graft.streaming.EventStreams.abTest(events(s, d),
        convType = "purchase")),

    // --- Simpson's-paradox audit: per-stratum vs pooled conversion sign
    // flip across cohorts — the mix-shift trap (oracle-checked) ---
    "q_stream_simpson" -> ((s, d) =>
      graft.streaming.EventStreams.simpsonAudit(events(s, d),
        convType = "purchase", heavyMin = 67L)),

    // --- seasonality matrix: day-of-week x hour-of-day load cells with
    // exact uniform-relative indices — the capacity/baseline heatmap
    // (oracle-checked) ---
    "q_stream_seasonality" -> ((s, d) =>
      graft.streaming.EventStreams.seasonality(events(s, d))),

    // --- Kaplan-Meier survival over user lifetimes: censoring-correct
    // churn curve, exact at-risk counts, sequential factor product
    // (oracle-checked) ---
    "q_stream_survival" -> ((s, d) =>
      graft.streaming.EventStreams.kaplanMeier(events(s, d),
        bucketSec = 86400L, censorSec = 3L * 86400L)),

    // --- OHLC candlestick bars: per-type hourly open/high/low/close on
    // the total (ts, event_id) order + exact cent volume (oracle-checked)
    "q_stream_ohlc" -> ((s, d) =>
      graft.streaming.EventStreams.ohlcBars(events(s, d),
        bucketSec = 3600L)),

    // --- Holt level+trend smoothing: the ramp detector of the
    // forecasting trio — sustained nonzero trend flags immediately
    // (oracle-checked) ---
    "q_stream_holt" -> ((s, d) =>
      graft.streaming.EventStreams.holtTrend(events(s, d),
        bucketSec = 3600L, ka = 3, kb = 3, warm = 24,
        thresholdMicro = 500000L)),

    // --- CUSUM level-shift detection: sustained deviation from the
    // 48-bucket warm-up mean accumulates in two one-sided sums, slack
    // and threshold scaled to the baseline (oracle-checked) ---
    "q_stream_cusum" -> ((s, d) =>
      graft.streaming.EventStreams.cusumShift(events(s, d),
        bucketSec = 3600L, warm = 48, kPct = 10L, hPct = 100L)),

    // --- lead-lag cross-correlation: does click activity lead purchase
    // activity? Pearson corr per lag over the zero-filled hourly grid,
    // exact integer moments (oracle-checked) ---
    "q_stream_lagcorr" -> ((s, d) =>
      graft.streaming.EventStreams.lagCorrelation(events(s, d),
        typeA = "click", typeB = "purchase",
        bucketSec = 3600L, maxLag = 12)),

    // --- 6-hour trending leaderboard: top-3 event types per window,
    // deterministic tie-break, rank filter runs as WindowGroupLimit
    // partial top-k (oracle-checked) ---
    "q_stream_trending" -> ((s, d) =>
      graft.streaming.EventStreams.trendingTopK(events(s, d),
        bucketSec = 21600L, k = 3)),

    // --- peak concurrency per user: the ±1 interval sweep over 30-min
    // event holds — the parallel-session abuse signal (oracle-checked) ---
    "q_stream_concurrency" -> ((s, d) =>
      graft.streaming.EventStreams.peakConcurrency(events(s, d),
        holdSec = 1800L)),

    // --- bot regularity: per-user inter-event-gap CV from exact integer
    // moments; metronomic traces flag below 0.3 (oracle-checked) ---
    "q_stream_bots" -> ((s, d) =>
      graft.streaming.EventStreams.botRegularity(events(s, d),
        minGaps = 20, cvThresholdMicro = 300000L)),

    // as-of join: each click annotated with the user's latest prior purchase
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Temporal.asofJoin(
        clicks, purchases, by = Seq("user_id"), timeCol = "ts",
        valueCols = Seq("pval"))
    }),

    // forward as-of: the next purchase at-or-after each click
    "q_asof_join_fwd" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Temporal.asofJoinForward(
        clicks, purchases, by = Seq("user_id"), timeCol = "ts",
        valueCols = Seq("pval"))
    }),

    // --- nearest-direction as-of: whichever purchase (before or after)
    // is temporally closer, ties backward (pandas direction='nearest') ---
    "q_asof_join_near" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Temporal.asofJoinNearest(
        clicks, purchases, by = Seq("user_id"), timeCol = "ts",
        valueCols = Seq("pval"))
    }),

    // --- as-of with a staleness bound: matches older than 30 minutes are
    // nulled (pandas merge_asof tolerance; oracle post-filters DuckDB's
    // ASOF JOIN on the matched right timestamp) ---
    "q_asof_join_tol" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Temporal.asofJoinTolerance(
        clicks, purchases, by = Seq("user_id"), timeCol = "ts",
        valueCols = Seq("pval"), tolerance = "30 MINUTE")
    }),

    "q_multimodal_meta" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decode(docsBin, "doc_id", "payload")
    }),

    "q_multimodal_frames" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.sampleFrames(docsBin, "doc_id", "payload", stride = 64)
        .groupBy("item_id").agg(count(lit(1)).as("n_frames"))
    }),

    "q_multimodal_resize" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.resize(docsBin, "doc_id", "payload", w = 32, h = 32)
    }),

    // --- feature extraction over binary payloads: none of the synthetic
    // payloads are decodable images, so every row takes the deterministic
    // byte-slice fallback — which the oracle replays exactly (integer byte
    // sums are order-free-exact in doubles; all-ASCII corpus, byte i ==
    // ascii(char i+1) as in the other multimodal oracles). The real-pixel
    // path is spec-tested with in-process PNGs (MultimodalSpec). ---
    "q_multimodal_features" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.imageFeatures(docsBin, "doc_id", "payload")
    }),

    // perceptual-hash (aHash) image dedup groups: collide on the 16-bit
    // grid fingerprint, one representative per visual family
    "q_multimodal_phash" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.perceptualHash(docsBin, "doc_id", "payload")
        .groupBy(col("phash"))
        .agg(min(col("item_id")).as("keep_id"), count(lit(1)).as("copies"))
    }),

    // difference-hash (dHash) dedup groups: adjacent-cell gradient bits —
    // shift-invariant where aHash is not; intersecting both groupings is
    // the high-precision image dedup recipe
    "q_multimodal_dhash" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.differenceHash(docsBin, "doc_id", "payload")
        .groupBy(col("dhash"))
        .agg(min(col("item_id")).as("keep_id"), count(lit(1)).as("copies"))
    }),

    // dHash NEAR-dup pairs: 4×6-bit Hamming banding + exact bit_count
    // verify over the 24-bit gradient fingerprint — catches the
    // near-recompressed copies exact-equality grouping misses
    // (oracle-checked through the shared hammingBandPairs step)
    "q_multimodal_neardup" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.nearDupImages(docsBin, "doc_id", "payload")
    }),

    // --- audio tier: none of the synthetic payloads carry a RIFF header,
    // so every row takes the headerless raw-PCM16LE interpretation — which
    // the oracle replays sample-for-sample (int16 LE pairs from ASCII byte
    // codes; pcm_sum/sum_sq/DC-removed zero crossings all integer-exact,
    // rms one IEEE sqrt on exact integers). The real RIFF/WAVE parse is
    // spec-tested with in-process WAVs (MultimodalSpec). ---
    "q_multimodal_audio" -> ((s, d) => {
      Tables.load(s, d)
      val docsBin = s.table("documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.audioFeatures(docsBin, "doc_id", "payload")
    }),

    // --- LAION-style image-text pair filtering: every 5th caption is
    // swapped for its reverse (a planted mismatch), both towers embed, the
    // cosine + verdict per pair is the curation signal (oracle-checked:
    // stub towers are byte-slice means + the md5 hashing-trick embedding,
    // both engine-portable) ---
    "q_multimodal_pairfilter" -> ((s, d) => {
      Tables.load(s, d)
      val pairs = s.table("documents").select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        when(col("doc_id") % 5 === 0, reverse(col("text")))
          .otherwise(col("text")).as("caption"))
      Multimodal.pairAlignment(pairs, "doc_id", "payload", "caption",
        threshold = 0.0)
    }),
  )

  /** DuckDB mean of byte codes over the 0-based half-open slice [lo, hi) of
    * `text` — replays [[Multimodal.imageFeatures]]'s fallback sliceMean.
    */
  private def byteSliceMeanSql(lo: String, hi: String): String =
    s"CASE WHEN ($hi) <= ($lo) THEN 0.0 ELSE " +
      s"list_sum(list_transform(generate_series(($lo) + 1, $hi), " +
      s"i -> ascii(substr(text, i, 1))))::DOUBLE / (($hi) - ($lo)) END"

  val oracleSql: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """WITH t AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events)
        |SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS win_start,
        |       make_timestamp((epoch_us(ts) // 900000000) * 900000000 + 900000000) AS win_end,
        |       event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
        |FROM t GROUP BY 1, 2, 3""".stripMargin,

    "q_stream_ratelimit" ->
      graft.streaming.EventStreams.windowedRateLimitOracleSql(
        widthSec = 3600L, keyExpr = "event_type", n = 3),

    "q_stream_kmv" -> graft.streaming.EventStreams.windowedKmvOracleSql(
      widthSec = 3600L, keyExpr = "user_id", k = 64),

    "q_stream_hll" -> graft.streaming.EventStreams.windowedHllOracleSql(
      widthSec = 3600L, keyExpr = "user_id", p = 8),

    "q_stream_kll" -> graft.streaming.EventStreams.windowedKllOracleSql(
      widthSec = 3600L, valueExpr = "value", idExpr = "event_id",
      k = 256, qPermille = Seq(500, 900, 990)),

    "q_stream_kll_w" -> graft.streaming.EventStreams
      .windowedKllWeightedOracleSql(
        widthSec = 3600L, valueExpr = "value",
        weightExpr = "1 + (user_id % 9)", idExpr = "event_id",
        k = 256, qPermille = Seq(500, 900)),

    "q_stream_topk" -> graft.streaming.EventStreams.windowedTopKOracleSql(
      widthSec = 3600L, keyExpr = "event_type", topN = 3),

    "q_stream_burstiness" ->
      graft.streaming.EventStreams.burstinessOracleSql(),

    "q_stream_latency" -> graft.streaming.EventStreams
      .windowedPercentilesOracleSql(widthSec = 3600L, valueExpr = "value"),

    "q_stream_funnel" -> graft.streaming.EventStreams.funnelOracleSql(
      Seq("signup", "click", "purchase"), maxSpan = Some("24 hours")),

    "q_stream_cohorts" -> graft.streaming.EventStreams.cohortOracleSql("signup"),

    "q_stream_transitions" ->
      graft.streaming.EventStreams.transitionsOracleSql(),

    "q_stream_attribution" ->
      graft.streaming.EventStreams.attributionOracleSql(
        convType = "purchase", touchTypes = Seq("click", "view"),
        lookbackSec = 6L * 3600),

    "q_stream_rfm" -> graft.streaming.EventStreams.rfmOracleSql(nTiles = 5),

    "q_stream_anomaly" -> graft.streaming.EventStreams.rateAnomalyOracleSql(
      bucketSec = 3600L, trail = 12, thresholdMicro = 2000000L),

    "q_stream_ewma" -> graft.streaming.EventStreams.ewmaAnomalyOracleSql(
      bucketSec = 3600L, halfK = 3, warm = 24, thresholdMicro = 2500000L),

    "q_stream_trend" -> graft.streaming.EventStreams.trendTestOracleSql(
      bucketSec = 3600L),

    "q_stream_trend_seasonal" ->
      graft.streaming.EventStreams.trendTestSeasonalOracleSql(
        bucketSec = 3600L, period = 24),

    "q_stream_lagcorr" ->
      graft.streaming.EventStreams.lagCorrelationOracleSql(
        typeA = "click", typeB = "purchase",
        bucketSec = 3600L, maxLag = 12),

    "q_stream_cusum" -> graft.streaming.EventStreams.cusumOracleSql(
      bucketSec = 3600L, warm = 48, kPct = 10L, hPct = 100L),

    "q_stream_holt" -> graft.streaming.EventStreams.holtOracleSql(
      bucketSec = 3600L, ka = 3, kb = 3, warm = 24,
      thresholdMicro = 500000L),

    "q_stream_ohlc" ->
      graft.streaming.EventStreams.ohlcOracleSql(bucketSec = 3600L),

    "q_stream_survival" ->
      graft.streaming.EventStreams.kaplanMeierOracleSql(
        bucketSec = 86400L, censorSec = 3L * 86400L),

    "q_stream_seasonality" ->
      graft.streaming.EventStreams.seasonalityOracleSql(),

    "q_stream_abtest" ->
      graft.streaming.EventStreams.abTestOracleSql(convType = "purchase"),

    "q_stream_simpson" -> graft.streaming.EventStreams.simpsonOracleSql(
      convType = "purchase", heavyMin = 67L),

    "q_stream_trending" -> graft.streaming.EventStreams
      .trendingTopKOracleSql(bucketSec = 21600L, k = 3),

    "q_stream_concurrency" -> graft.streaming.EventStreams
      .peakConcurrencyOracleSql(holdSec = 1800L),

    "q_stream_bots" -> graft.streaming.EventStreams
      .botRegularityOracleSql(minGaps = 20, cvThresholdMicro = 300000L),

    // grid = generate_series over each user's bucket range; fill = running
    // last_value IGNORE NULLS — same semantics as Spark's last(_, true)
    "q_stream_gapfill" ->
      """WITH e AS (
        |  SELECT user_id AS k,
        |         make_timestamp(epoch_us(ts::TIMESTAMP)
        |           - ((epoch_us(ts::TIMESTAMP) % 900000000 + 900000000) % 900000000)) AS bucket,
        |         value AS v
        |  FROM events WHERE user_id % 20 = 0),
        |pb AS (SELECT k, bucket, count(*) AS n_events, max(v) AS bucket_max
        |       FROM e GROUP BY k, bucket),
        |grid AS (
        |  SELECT k, unnest(generate_series(b0, b1, INTERVAL 900 SECOND)) AS bucket
        |  FROM (SELECT k, min(bucket) AS b0, max(bucket) AS b1 FROM e GROUP BY k))
        |SELECT grid.k AS user_id, grid.bucket, coalesce(n_events, 0) AS n_events,
        |       last_value(bucket_max IGNORE NULLS) OVER (
        |         PARTITION BY grid.k ORDER BY grid.bucket
        |         ROWS UNBOUNDED PRECEDING) AS filled_max
        |FROM grid LEFT JOIN pb ON grid.k = pb.k AND grid.bucket = pb.bucket""".stripMargin,

    // element-wise window reduce = per-(window, position) sum
    "q_stream_reduce" ->
      """WITH t AS (SELECT ts::TIMESTAMP AS ts,
        |                  event_id % 5 AS a1, user_id % 7 AS a2,
        |                  1::BIGINT AS a3 FROM events),
        |u AS (SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS win_start,
        |             unnest([a1, a2, a3]) AS v,
        |             generate_subscripts([a1, a2, a3], 1) AS pos
        |      FROM t)
        |SELECT win_start, pos::BIGINT AS pos, sum(v)::BIGINT AS red
        |FROM u GROUP BY win_start, pos""".stripMargin,

    "q_stream_sliding" ->
      """WITH t AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events),
        |w AS (SELECT event_type,
        |             unnest([(epoch_us(ts) // 900000000) * 900000000,
        |                     (epoch_us(ts) // 900000000) * 900000000 - 900000000]) AS ws
        |      FROM t)
        |SELECT make_timestamp(ws) AS win_start, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,

    // gaps-and-islands replication of session_window semantics: a new
    // session starts when the gap is >= 30 min (Spark merges only
    // strictly-overlapping [ts, ts+gap) intervals); session end = last+gap
    "q_stream_session" ->
      """WITH t AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
        |m AS (SELECT user_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(ts) AS sess_start,
        |       max(ts) + INTERVAL 30 MINUTE AS sess_end,
        |       count(*) AS n_events, min(value) AS mn_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // gaps-and-islands on epoch-millisecond values: the Scala sessionizer
    // compares java.sql.Timestamp.getTime (ms, floored from micros) with a
    // STRICT > gap test, and session end = last event (no gap extension)
    "q_stream_stateful_sessions" ->
      """WITH t AS (SELECT user_id, epoch_ms(ts::TIMESTAMP) AS ms FROM events),
        |m AS (SELECT user_id, ms,
        |        CASE WHEN lag(ms) OVER w IS NULL
        |               OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
        |       count(*)::INTEGER AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_range_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts::TIMESTAMP AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts::TIMESTAMP AS purchase_ts, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, p.purchase_ts, p.purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.purchase_ts <= c.click_ts
        |  AND p.purchase_ts > c.click_ts - INTERVAL 10 MINUTE""".stripMargin,

    "q_stream_interval_outer" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts::TIMESTAMP AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts::TIMESTAMP AS purchase_ts, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, p.purchase_ts, p.purchase_value
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.purchase_ts <= c.click_ts
        |  AND p.purchase_ts > c.click_ts - INTERVAL 10 MINUTE""".stripMargin,

    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS pval FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts, r.pval AS pval_asof
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "q_asof_join_fwd" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS pval FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts, r.pval AS pval_next
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,

    "q_asof_join_near" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS pval FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1, 2),
        |b AS (SELECT l.event_id, l.user_id, l.ts, r.ts AS bts, r.pval AS bval
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.ts AS fts, r.pval AS fval
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT b.event_id, b.user_id, b.ts,
        |       CASE WHEN fts IS NULL THEN bval
        |            WHEN bts IS NOT NULL
        |                 AND epoch_us(b.ts) - epoch_us(bts)
        |                     <= epoch_us(fts) - epoch_us(b.ts) THEN bval
        |            ELSE fval END AS pval_near
        |FROM b JOIN f USING (event_id)""".stripMargin,

    "q_asof_join_tol" ->
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS pval FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts,
        |       CASE WHEN l.ts <= r.ts + INTERVAL 30 MINUTE THEN r.pval END
        |         AS pval_asof
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    // the stub codec's arithmetic re-expressed over the (all-ASCII) text:
    // byte i == ascii(char i+1)
    "q_multimodal_meta" ->
      """SELECT doc_id AS item_id, length(text)::BIGINT AS n_bytes,
        |       16 + ascii(substr(text, 1, 1)) % 128 AS width,
        |       16 + ascii(substr(text, 2, 1)) % 128 AS height,
        |       1 + ascii(substr(text, 3, 1)) % 4 AS channels,
        |       CASE length(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg'
        |            ELSE 'webp' END AS format
        |FROM documents""".stripMargin,

    // length(text) > 0 guard: an empty payload yields no frame offsets on
    // the Spark side (flatMap of an empty range), so the oracle must emit
    // no row either. (Both multimodal oracles assume all-ASCII text, where
    // char count == byte count — true of this corpus by construction.)
    "q_multimodal_frames" ->
      """SELECT doc_id AS item_id,
        |       ((length(text) + 63) // 64)::BIGINT AS n_frames
        |FROM documents WHERE length(text) > 0""".stripMargin,

    // stub-resize math replayed: scale = 1024/(w*h) in double, resized byte
    // count = min(len, max(1, trunc(len*scale))) — empty payloads stay 0;
    // all-ASCII corpus, so char positions == byte positions (same
    // assumption as the other two)
    // same grid means as q_multimodal_features → fixed-order mean → strict
    // per-bit compare → bit sum; dedup groups on the resulting fingerprint
    "q_multimodal_phash" -> {
      val grid = (0 to 3).flatMap(i => (0 to 3).map(j =>
        s"${byteSliceMeanSql(s"n * ${i * 4 + j} // 16", s"n * ${i * 4 + j + 1} // 16")} AS g$i$j"))
        .mkString(",\n         ")
      val cells = for { i <- 0 to 3; j <- 0 to 3 } yield s"g$i$j"
      val mean = cells.mkString("(", " + ", ") / 16.0")
      val bitsum = cells.zipWithIndex.map { case (c, k) =>
        s"(CASE WHEN $c > gmean THEN ${1L << k} ELSE 0 END)" }
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |g AS (SELECT doc_id,
         |         $grid
         |      FROM t),
         |h AS (SELECT doc_id, $mean AS gmean, * FROM g)
         |SELECT phash, min(doc_id)::BIGINT AS keep_id, count(*) AS copies
         |FROM (SELECT doc_id, ($bitsum)::BIGINT AS phash FROM h)
         |GROUP BY phash""".stripMargin
    },

    // dHash replay: same grid means, adjacent-cell strict compares,
    // horizontal bits 0-11 then vertical bits 12-23
    "q_multimodal_dhash" -> {
      val grid = (0 to 3).flatMap(i => (0 to 3).map(j =>
        s"${byteSliceMeanSql(s"n * ${i * 4 + j} // 16", s"n * ${i * 4 + j + 1} // 16")} AS g$i$j"))
        .mkString(",\n         ")
      val hbits = (for { i <- 0 to 3; j <- 0 to 2 } yield (i, j)).zipWithIndex
        .map { case ((i, j), k) =>
          s"(CASE WHEN g$i${j + 1} > g$i$j THEN ${1L << k} ELSE 0 END)" }
      val vbits = (for { i <- 0 to 2; j <- 0 to 3 } yield (i, j)).zipWithIndex
        .map { case ((i, j), k) =>
          s"(CASE WHEN g${i + 1}$j > g$i$j THEN ${1L << (12 + k)} ELSE 0 END)" }
      val bitsum = (hbits ++ vbits).mkString(" + ")
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |g AS (SELECT doc_id,
         |         $grid
         |      FROM t)
         |SELECT dhash, min(doc_id)::BIGINT AS keep_id, count(*) AS copies
         |FROM (SELECT doc_id, ($bitsum)::BIGINT AS dhash FROM g)
         |GROUP BY dhash""".stripMargin
    },

    // same dhash CTE as q_multimodal_dhash, then the hammingBandPairs
    // replay: 4×6-bit band keys, bucket cap via QUALIFY, distinct
    // candidates, exact bit_count(xor) verify
    "q_multimodal_neardup" -> {
      val grid = (0 to 3).flatMap(i => (0 to 3).map(j =>
        s"${byteSliceMeanSql(s"n * ${i * 4 + j} // 16", s"n * ${i * 4 + j + 1} // 16")} AS g$i$j"))
        .mkString(",\n         ")
      val hbits = (for { i <- 0 to 3; j <- 0 to 2 } yield (i, j)).zipWithIndex
        .map { case ((i, j), k) =>
          s"(CASE WHEN g$i${j + 1} > g$i$j THEN ${1L << k} ELSE 0 END)" }
      val vbits = (for { i <- 0 to 2; j <- 0 to 3 } yield (i, j)).zipWithIndex
        .map { case ((i, j), k) =>
          s"(CASE WHEN g${i + 1}$j > g$i$j THEN ${1L << (12 + k)} ELSE 0 END)" }
      val bitsum = (hbits ++ vbits).mkString(" + ")
      val bandSelects = (0 until 4).map(b =>
        s"SELECT id, sh, $b AS band, (sh >> ${b * 6}) & 63 AS key FROM sig")
        .mkString("\n  UNION ALL ")
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |g AS (SELECT doc_id,
         |         $grid
         |      FROM t),
         |sig AS (SELECT doc_id AS id, ($bitsum)::BIGINT AS sh FROM g),
         |banded AS (
         |  $bandSelects),
         |bucketed AS (
         |  SELECT id, sh, band, key FROM banded
         |  QUALIFY count(*) OVER (PARTITION BY band, key) <= 10000),
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
         |  FROM bucketed a JOIN bucketed b
         |    ON a.band = b.band AND a.key = b.key AND a.id < b.id)
         |SELECT id_a, id_b, hamming FROM (
         |  SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
         |  FROM pairs)
         |WHERE hamming <= 3""".stripMargin
    },

    "q_multimodal_features" -> {
      val grid = (0 to 3).flatMap(i => (0 to 3).map(j =>
        s"${byteSliceMeanSql(s"n * ${i * 4 + j} // 16", s"n * ${i * 4 + j + 1} // 16")} AS g$i$j"))
        .mkString(",\n       ")
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents)
         |SELECT doc_id AS item_id, false AS real_decode,
         |       ${byteSliceMeanSql("0", "n // 3")} AS mean_r,
         |       ${byteSliceMeanSql("n // 3", "2 * n // 3")} AS mean_g,
         |       ${byteSliceMeanSql("2 * n // 3", "n")} AS mean_b,
         |       $grid
         |FROM t""".stripMargin
    },

    // raw-PCM16LE replay: sample i (1-based) = c(2i-1) + 256*c(2i) over
    // ASCII byte codes (always < 32768 for ASCII, so no sign wrap on this
    // corpus); zero crossings compare the sign of the integer-exact
    // DC-removed value x*n - sum
    "q_multimodal_audio" ->
      """WITH s AS (
        |  SELECT doc_id, text, (length(text) // 2)::BIGINT AS n FROM documents),
        |samp AS (
        |  SELECT doc_id, n,
        |         list_transform(range(1, (n + 1)::INTEGER), i ->
        |           ascii(substr(text, (2*i - 1)::INTEGER, 1))
        |           + 256 * ascii(substr(text, (2*i)::INTEGER, 1))) AS xs
        |  FROM s WHERE n > 0),
        |agg AS (
        |  SELECT doc_id, n, xs,
        |         list_sum(xs)::BIGINT AS pcm_sum,
        |         list_sum(list_transform(xs, x -> x::BIGINT * x))::BIGINT AS sum_sq
        |  FROM samp)
        |SELECT doc_id AS item_id, n AS n_samples, pcm_sum, sum_sq,
        |       len(list_filter(range(2, (n + 1)::INTEGER), i ->
        |         ((xs[i]::BIGINT * n - pcm_sum) >= 0)
        |          != ((xs[i-1]::BIGINT * n - pcm_sum) >= 0)))::BIGINT AS zero_crossings,
        |       sqrt(sum_sq::DOUBLE / n::DOUBLE) AS rms
        |FROM agg""".stripMargin,

    "q_multimodal_pairfilter" -> {
      val grid = (0 to 3).flatMap(i => (0 to 3).map(j =>
        s"${byteSliceMeanSql(s"n * ${i * 4 + j} // 16", s"n * ${i * 4 + j + 1} // 16")}"))
      val ivec = (Seq(
        byteSliceMeanSql("0", "n // 3"),
        byteSliceMeanSql("n // 3", "2 * n // 3"),
        byteSliceMeanSql("2 * n // 3", "n")) ++ grid)
        .mkString("[", ",\n         ", "]::DOUBLE[]")
      s"""WITH t AS (
        |  SELECT doc_id, text, length(text) AS n,
        |         CASE WHEN doc_id % 5 = 0 THEN reverse(text) ELSE text END AS caption
        |  FROM documents),
        |iv AS (
        |  SELECT doc_id, $ivec AS ivec
        |  FROM t),
        |toksc AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(caption), '\\s+'),
        |           x -> x <> '')) AS tok
        |  FROM t),
        |f AS (
        |  SELECT doc_id,
        |         (('0x' || substr(md5(tok), 1, 15))::BIGINT % 19)::INTEGER AS idx,
        |         CASE WHEN ('0x' || substr(md5(tok), 1, 15))::BIGINT % 38 < 19
        |              THEN 1.0 ELSE -1.0 END AS s
        |  FROM toksc),
        |sp AS (SELECT doc_id, idx, sum(s)::DOUBLE AS v FROM f GROUP BY 1, 2),
        |tm AS (SELECT doc_id, map_from_entries(list({k: idx, v: v})) AS m
        |       FROM sp GROUP BY doc_id),
        |tv AS (SELECT doc_id, list_transform(generate_series(0, 18),
        |                i -> coalesce(element_at(m, i)[1], 0.0)) AS tvec
        |       FROM tm),
        |scored AS (
        |  SELECT iv.doc_id AS item_id,
        |         CASE WHEN tvec IS NULL
        |                   OR sqrt(list_dot_product(ivec, ivec))
        |                      * sqrt(list_dot_product(tvec, tvec)) = 0
        |              THEN '-Infinity'::DOUBLE
        |              ELSE list_dot_product(ivec, tvec) /
        |                   (sqrt(list_dot_product(ivec, ivec))
        |                    * sqrt(list_dot_product(tvec, tvec))) END AS score
        |  FROM iv LEFT JOIN tv ON tv.doc_id = iv.doc_id)
        |SELECT item_id, score, score >= 0.0 AS kept FROM scored""".stripMargin
    },

    "q_multimodal_resize" ->
      """SELECT doc_id AS item_id,
        |       least(length(text), greatest(1,
        |         trunc(length(text) * (1024.0 /
        |           greatest(1, (16 + ascii(substr(text, 1, 1)) % 128)::BIGINT
        |                       * (16 + ascii(substr(text, 2, 1)) % 128))))::BIGINT
        |       ))::BIGINT AS n_bytes_resized,
        |       32 AS width, 32 AS height,
        |       16 + ascii(substr(text, 1, 1)) % 128 AS orig_width,
        |       16 + ascii(substr(text, 2, 1)) % 128 AS orig_height
        |FROM documents""".stripMargin,
  )
}
