package graft.queries

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity-search and embedding-analytics queries over
  * `embeddings` (SURVEY.md §2c): brute/LSH/IVF/PQ/BQ kNN, recall,
  * clustering, coresets, drift and geometry diagnostics.
  *
  * Oracle policy (shared across the query registry): deterministic
  * rational/string computations get full DuckDB oracles
  * (dialect-translated); probabilistic pipelines whose correctness
  * contract is recall vs an exact baseline are covered by ScalaTest
  * brute-force comparisons and registered rows-only.
  */
object EmbedQueries {

  /** Shared DuckDB replay of the IVF top-k (assignment argmax, probe
    * selection, exact re-rank; queryId=0, k=10, centroidEvery=50, nprobe=3)
    * — `q_knn_ivf` and the layout-served `q_knn_ivf_layout` are
    * answer-identical by construction, so both gate entries use it.
    */
  private val ivfOracleSql: String =
    """WITH vecs AS (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
      |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings),
      |cents AS (
      |  SELECT id AS centroid_id, v AS cvec, nrm AS cnrm FROM vecs
      |  WHERE id % 50 = 0),
      |assigned AS (
      |  SELECT id, centroid_id FROM (
      |    SELECT a.id, c.centroid_id,
      |           row_number() OVER (PARTITION BY a.id
      |             ORDER BY list_dot_product(a.v, c.cvec) / (a.nrm * c.cnrm) DESC,
      |                      c.centroid_id) AS rn
      |    FROM vecs a CROSS JOIN cents c)
      |  WHERE rn = 1),
      |q AS (SELECT v AS qvec, nrm AS qnrm FROM vecs WHERE id = 0),
      |probe AS (
      |  SELECT centroid_id FROM cents, q
      |  ORDER BY list_dot_product(cvec, qvec) / (cnrm * qnrm) DESC, centroid_id
      |  LIMIT 3)
      |SELECT id AS vec_id, score FROM (
      |  SELECT a.id, list_dot_product(a.v, q.qvec) / (a.nrm * q.qnrm) AS score
      |  FROM vecs a
      |  JOIN assigned USING (id)
      |  JOIN probe USING (centroid_id), q
      |  WHERE a.id <> 0)
      |ORDER BY score DESC, id LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- k-center coreset (Gonzalez greedy farthest-point): k diverse
    // prototypes on exact fixed-point L2², full trace oracle-replayed
    // round by round (oracle-checked) ---
    "q_embed_coreset" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.kCenterCoreset(s.table("embeddings"), "vec_id",
        "embedding", k = 8)
    }),

    // --- simplified silhouette per fixed-codebook cluster: exact BIGINT
    // squared-L2 a/b, one point×centroid pass, never pairwise
    // (oracle-checked) ---
    "q_embed_silhouette" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.simplifiedSilhouette(s.table("embeddings"), "vec_id",
        "embedding", centroidEvery = 50L)
    }),

    // --- margin-based bitext mining (ratio margin, Artetxe & Schwenk):
    // cluster-bucketed candidates, per-side kNN-mean normalization, exact
    // micro-integer scores (oracle-checked) ---
    "q_embed_margin" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.marginMining(s.table("embeddings"), "vec_id", "embedding",
        centroidEvery = 50L, kNn = 4, topN = 50)
    }),

    // --- pairwise linear-kernel MMD² between label groups: the
    // embedding distribution-shift detector — exact fixed-point group
    // sums, one corpus pass, pair math on the tiny (group × dim)
    // aggregate (oracle-checked) ---
    "q_embed_mmd" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.mmdByGroup(s.table("embeddings"), "label", "embedding")
    }),

    // --- similarity search: exact brute-force top-k (oracle-checked) ---
    "q_knn_brute" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnBrute(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- batch retrieval: top-k for a query SET in one corpus pass ---
    "q_knn_batch" -> ((s, d) => {
      Tables.load(s, d)
      val emb = s.table("embeddings")
      Similarity.knnBatch(emb, "vec_id", "embedding",
        emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .select(col("qid"), col("vec_id"), col("score"), col("rank"))
    }),

    // --- similarity search: LSH ANN top-k (rows-only; recall in spec) ---
    "q_knn_lsh" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnLsh(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- LSH ANN with md5-portable hyperplanes: deterministic multi-probe
    // pipeline replayed in DuckDB (Similarity.knnLshOracleSql) ---
    "q_knn_lsh_md5" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnLshPortable(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- int8-quantized exact top-k (4x smaller vectors; integer sums →
    // deterministic, oracle-replayed) ---
    "q_knn_quantized" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnQuantized(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- binary-quantization ANN: 1-bit/dim mean-thresholded sketch
    // (integer threshold — partition-order-proof), Hamming candidate scan
    // over 32x-compressed words, exact cosine re-rank — deterministic,
    // replayed in DuckDB (Similarity.knnBqOracleSql) ---
    "q_knn_bq" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnBq(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- Matryoshka prefix-dim retrieval: coarse top-(k*4) by prefix
    // cosine on exact integer sums (16 of 64 dims), exact full-dim
    // re-rank — deterministic, replayed in DuckDB
    // (Similarity.knnMatryoshkaOracleSql) ---
    "q_knn_mrl" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnMatryoshka(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- capacity-balanced IVF assignment: every inverted list capped at
    // ceil(n*110%/k); overflow (each list's worst fits) spills to the
    // second-nearest centroid — the serving-skew rebalance, deterministic,
    // replayed in DuckDB (Similarity.balancedIvfAssignOracleSql) ---
    "q_knn_balanced" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.balancedIvfAssign(s.table("embeddings"), "vec_id",
        "embedding", centroidEvery = 50, slackPct = 110)
    }),

    // --- measured IVF recall@k vs exact brute force over a deterministic
    // query sample (every 25th id, nprobe=2 so the number is informative)
    // — the tuning metric an ANN deployment ships on, replayed in DuckDB
    // (Similarity.annRecallIvfOracleSql) ---
    "q_knn_recall" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.annRecallIvf(s.table("embeddings"), "vec_id", "embedding",
        queryEvery = 25L, k = 10, centroidEvery = 50, nprobe = 2)
    }),

    // --- MMR diversification: greedy λ·rel − (1−λ)·maxSim selection over
    // a bounded candidate set — the diversify stage of the retrieval
    // stack, replayed in DuckDB (Similarity.mmrSelectOracleSql) ---
    "q_knn_mmr" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.mmrSelect(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 8, candN = 25, lambdaPct = 70)
    }),

    // --- product-quantization ANN: deterministic sampled codebook, encode
    // + ADC top-k — fully deterministic, replayed in DuckDB
    // (Similarity.knnPqOracleSql); compression/recall trade measured in
    // SimilaritySpec ---
    "q_knn_pq" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnPq(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- IVF-PQ composite (IVFADC): coarse-cell prune + ADC scoring,
    // deterministic end to end, replayed in DuckDB ---
    "q_knn_ivfpq" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnIvfPq(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- similarity search: IVF ANN top-k (oracle-replayed prune + rerank) ---
    "q_knn_ivf" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.knnIvf(s.table("embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // --- IVF served from the centroid-partitioned parquet layout: write
    // the inverted lists as partition dirs, probe through dynamic partition
    // pruning — answer identical to q_knn_ivf (same oracle), the layout's
    // scan bound is pinned in SimilaritySpec ---
    "q_knn_ivf_layout" -> ((s, d) => {
      Tables.load(s, d)
      val path = Tables.scratchDir(s, s"ivf_${d.replaceAll("[^A-Za-z0-9]", "_")}")
      val index = Similarity.writeIvfIndex(s.table("embeddings"), "vec_id",
        "embedding", path)
      // probe selection reads the build-time codebook sidecar
      // (O(centroids)); the inverted-list scan stays partition-pruned
      Similarity.knnIvfIndexed(index, "vec_id", "embedding",
        queryId = 0L, k = 10,
        codebook = Some(Similarity.ivfCodebook(s, path, "vec_id",
          "embedding", 50)))
    }),

    // --- IVF served for a LITERAL query vector (the online pattern: the
    // embedding arrives from outside the corpus at request time): probe
    // selection off the build-time codebook sidecar, lists partition-
    // pruned; the vector here is id 0's (1-row bounded collect) with
    // excludeId=0, so the answer — and the oracle — are exactly
    // q_knn_ivf's ---
    "q_knn_ivf_vec" -> ((s, d) => {
      Tables.load(s, d)
      val path = Tables.scratchDir(s,
        s"ivfvec_${d.replaceAll("[^A-Za-z0-9]", "_")}")
      val index = Similarity.writeIvfIndex(s.table("embeddings"), "vec_id",
        "embedding", path)
      val qvec = s.table("embeddings").where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.knnIvfIndexedVec(index, "vec_id", "embedding", qvec,
        k = 10,
        codebook = Some(Similarity.ivfCodebook(s, path, "vec_id",
          "embedding", 50)),
        excludeId = Some(0L))
    }),

    // --- embedding near-dup pairs above cosine threshold (rows-only) ---
    "q_embed_neardup" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.nearDupPairs(s.table("embeddings"), "vec_id", "embedding",
        threshold = 0.4, bits = 6)
    }),

    // --- embedding near-dup with md5-derived hyperplanes: the full LSH +
    // cosine-verify pipeline replayed in DuckDB (Similarity.nearDupOracleSql
    // shares the sign literals) → hash-checked ---
    "q_embed_neardup_md5" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.nearDupPairsPortable(s.table("embeddings"), "vec_id",
        "embedding", threshold = 0.4)
    }),

    // --- hard-negative mining: per query, top-5 most-similar vectors that
    // are neither self nor a labeled positive (oracle-checked) ---
    "q_embed_hard_negatives" -> ((s, d) => {
      Tables.load(s, d)
      val emb = s.table("embeddings")
      val queries = emb.where(col("vec_id") % 50 === 3)
      // synthetic positive labels for the gate: each query's next two ids
      val positives = queries.select(col("vec_id").as("qid"),
        explode(array(col("vec_id") + 1, col("vec_id") + 2)).as("pos_id"))
      Similarity.mineHardNegatives(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", positives, "qid", "pos_id", k = 5)
    }),

    // --- corpus anisotropy: mean/min/max cosine over hash-bucketed
    // neighbor pairs — the Ethayarajh embedding-collapse diagnostic;
    // exact integer folds, micro-rounded per pair (oracle-checked) ---
    "q_embed_anisotropy" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.anisotropy(s.table("embeddings"), "vec_id", "embedding",
        buckets = 64)
    }),

    // --- Johnson–Lindenstrauss random-sign projection 64 → 16 dims:
    // derived md5 sign matrix, exact BIGINT fixed-point sums
    // (oracle-checked) ---
    "q_embed_jl" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.jlProject(s.table("embeddings"), "vec_id", "embedding",
        dim = 64, outDim = 16)
    }),

    // --- SemDeDup semantic dedup, bit-exact tier: every-50th-id codebook,
    // min-id survivor inside each cluster (oracle-checked; the Lloyd-trained
    // tier is spec-tested) ---
    "q_embed_semdedup" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.semDedupFixed(s.table("embeddings"), "vec_id", "embedding",
        centroidEvery = 50L, threshold = 0.4)
    }),

    // --- per-dim z-score standardization: exact fx-carrier moments, the
    // scale cancels in z = (v·n−s)/√(n·ss−s²) so both engines compute
    // identical doubles (oracle-checked) ---
    "q_embed_standardize" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.standardizeEmbeddings(s.table("embeddings"), "vec_id",
        "embedding")
    }),

    // --- cluster-balanced diversity sample: ≤5 vectors per fixed-codebook
    // cluster in content-stable md5 order — coverage-preserving coreset,
    // rank-limit executed as partial top-k (oracle-checked) ---
    "q_embed_diversity" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.diversitySample(s.table("embeddings"), "vec_id", "embedding",
        centroidEvery = 50L, perCluster = 5)
    }),

    // --- dimension-correlation matrix: pairwise Pearson corr on exact
    // integer moments, pair products generated in codegen inside each row
    // — the PCA/whitening redundancy diagnostic (oracle-checked) ---
    "q_embed_corr" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.correlationMatrix(s.table("embeddings"), "embedding")
    }),

    // --- top principal component: power method on the exact integer
    // scatter matrix, L-infinity micro renormalization — the dominant
    // direction anisotropy correction strips (oracle-checked) ---
    "q_embed_pca" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.pcaPower(s.table("embeddings"), "embedding", iters = 6)
    }),

    // --- grid-blocked exact DBSCAN on the 2-D JL sketch: density
    // clusters + border/noise labeling, Chebyshev balls on exact BIGINT
    // coordinates (oracle-checked) ---
    "q_embed_dbscan" -> ((s, d) => {
      Tables.load(s, d)
      Similarity.dbscanGrid(s.table("embeddings"), "vec_id", "embedding",
        dim = 64, epsFx = 200000L, minPts = 6)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_embed_neardup_md5" -> Similarity.nearDupOracleSql(threshold = 0.4),

    "q_embed_semdedup" ->
      Similarity.semDedupOracleSql(centroidEvery = 50L, threshold = 0.4),

    "q_embed_diversity" ->
      Similarity.diversityOracleSql(centroidEvery = 50L, perCluster = 5),

    "q_embed_standardize" -> Similarity.standardizeOracleSql(),

    "q_embed_corr" -> Similarity.correlationMatrixOracleSql(),

    "q_embed_pca" -> Similarity.pcaPowerOracleSql(iters = 6),

    "q_embed_dbscan" -> Similarity.dbscanGridOracleSql(
      dim = 64, epsFx = 200000L, minPts = 6),

    "q_embed_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 50 = 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         CASE WHEN sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |                   * sqrt(list_dot_product(q.qv, q.qv)) = 0
        |              THEN '-Infinity'::DOUBLE
        |              ELSE list_dot_product(e.embedding::DOUBLE[], q.qv) /
        |           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |            sqrt(list_dot_product(q.qv, q.qv))) END AS score
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.qid
        |    AND e.vec_id <> q.qid + 1 AND e.vec_id <> q.qid + 2),
        |ranked AS (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)::BIGINT AS rank
        |  FROM scored)
        |SELECT qid, vec_id, score, rank FROM ranked WHERE rank <= 5""".stripMargin,

    "q_knn_lsh_md5" -> Similarity.knnLshOracleSql(queryId = 0L, k = 10),

    "q_knn_quantized" -> Similarity.knnQuantizedOracleSql(queryId = 0L, k = 10),

    "q_knn_bq" -> Similarity.knnBqOracleSql(queryId = 0L, k = 10),

    "q_knn_mrl" -> Similarity.knnMatryoshkaOracleSql(queryId = 0L, k = 10),

    "q_knn_balanced" -> Similarity.balancedIvfAssignOracleSql(
      centroidEvery = 50, slackPct = 110),

    "q_knn_recall" -> Similarity.annRecallIvfOracleSql(queryEvery = 25L,
      k = 10, centroidEvery = 50, nprobe = 2),

    "q_knn_mmr" -> Similarity.mmrSelectOracleSql(queryId = 0L, k = 8,
      candN = 25, lambdaPct = 70),

    "q_knn_pq" -> Similarity.knnPqOracleSql(queryId = 0L, k = 10),

    "q_knn_ivfpq" -> Similarity.knnIvfPqOracleSql(queryId = 0L, k = 10),

    "q_embed_coreset" -> Similarity.kCenterOracleSql(k = 8),

    "q_embed_silhouette" ->
      Similarity.silhouetteOracleSql(centroidEvery = 50L),

    "q_embed_margin" -> Similarity.marginMiningOracleSql(
      centroidEvery = 50L, kNn = 4, topN = 50),

    "q_embed_jl" -> Similarity.jlProjectOracleSql(dim = 64, outDim = 16),

    "q_embed_anisotropy" -> Similarity.anisotropyOracleSql(buckets = 64),

    "q_embed_mmd" -> Similarity.mmdOracleSql("label"),

    // q_knn_ivf is deterministic end to end (every-Nth-id centroids, double
    // folds, unique tiebreakers) → full DuckDB replay: assignment argmax,
    // probe selection, exact re-rank. Constants mirror the queries entry
    // (queryId=0, k=10, centroidEvery=50, nprobe=3). The layout-served
    // variant is answer-identical by construction (same assignment, same
    // probes, same re-rank — only the storage layout differs), so both
    // gate entries replay the one oracle.
    "q_knn_ivf" -> ivfOracleSql,

    "q_knn_ivf_layout" -> ivfOracleSql,

    "q_knn_ivf_vec" -> ivfOracleSql,

    "q_knn_batch" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         list_dot_product(e.embedding::DOUBLE[], q.qv) /
        |           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |            sqrt(list_dot_product(q.qv, q.qv))) AS score
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |ranked AS (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, vec_id, score, rank FROM ranked WHERE rank <= 5""".stripMargin,

    "q_knn_brute" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       list_dot_product(embedding::DOUBLE[], qv) /
        |         (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |          sqrt(list_dot_product(qv, qv))) AS score
        |FROM embeddings, q
        |WHERE vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
  )
}
