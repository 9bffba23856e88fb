package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SKETCH SIDECAR LIFECYCLE — persist the portable sketches' mergeable
  * state (HLL registers, KMV bottom-k samples, KLL level samples) as
  * parquet tables and fold each ingest batch in incrementally, so a
  * corpus-wide distinct/quantile profile updates in O(batch) instead of
  * an O(corpus) rescan (VERDICT r13 item 5 — the `_graft_codebook`
  * sidecar posture from [[Similarity.streamingIvfRefresh]] applied to
  * the sketch rack).
  *
  * Every state here is a pure function of the input MULTISET and merges
  * associatively/commutatively, so fold order over batches can never
  * change the published estimate — the merged sidecar's read-off is
  * spec-pinned EQUAL to the one-shot operator over the full corpus
  * ([[Profile.hllDistinct]] / [[Profile.kmvDistinct]] /
  * [[Profile.kllQuantile]]), which is what makes the merge chain itself
  * oracle-checkable: the gate replays three deterministic ingest batches
  * through the fold and hash-checks against the FULL-corpus DuckDB
  * replay.
  *
  * Scale shape: a batch state build is one scan of the BATCH (never the
  * corpus) down to model-sized rows (≤2^p registers, ≤k hashes, ≤k+ε
  * level samples); a merge moves only state rows. The parquet update is
  * write-to-temp + rename-swap (the [[Similarity.compactIvfIndex]]
  * discipline), so a concurrent reader sees the old state or the new —
  * never a partial table.
  */
object SketchSidecar {

  // ---------------------------------------------------------------- HLL

  /** HLL register state of ONE batch: (reg, mj) rows, the same md5
    * family / bin()-ρ math as [[Profile.hllDistinct]] (whose scaladoc
    * carries the derivation). ≤ 2^p rows regardless of batch size.
    */
  def hllState(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")
    val wBits = 60 - p
    df.select(col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
      .select(Dedup.portableHash(concat(lit("hll:"), col("key"))).as("h"))
      .select(expr(s"h DIV ${1L << wBits}").as("reg"),
        pmod(col("h"), lit(1L << wBits)).as("w"))
      .select(col("reg"),
        when(col("w") === 0L, lit((wBits + 1).toLong))
          .otherwise(lit((wBits + 1).toLong) -
            length(ltrim(bin(col("w")), "0"))).as("rho"))
      .groupBy(col("reg")).agg(max(col("rho")).as("mj"))
  }

  /** Register-table merge: per-register max — the HLL monoid. */
  def mergeHll(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("reg")).agg(max(col("mj")).as("mj"))

  /** Estimate read-off from a (merged) register state — identical
    * fixed-point fold to [[Profile.hllDistinct]] minus its exact-count
    * twin; returns one row (m, v_zero, t_fx, est_raw).
    */
  def hllEstimate(state: DataFrame, p: Int = 8): DataFrame = {
    val m = 1L << p
    val wBits = 60 - p
    val alphaMicro = Profile.hllAlphaMicro(p)
    state.agg(
        count(lit(1)).as("n_present"),
        coalesce(sum(expr(
            s"shiftleft(CAST(1 AS BIGINT), CAST(${wBits + 1} - mj AS INT))")),
          lit(0L)).as("t_present"))
      .select(lit(m).as("m"),
        (lit(m) - col("n_present")).as("v_zero"),
        (col("t_present") +
          (lit(m) - col("n_present")) * lit(1L << (wBits + 1))).as("t_fx"))
      .select(col("m"), col("v_zero"), col("t_fx"),
        expr(s"CAST((CAST($alphaMicro AS DECIMAL(38,0)) * ${m * m} * " +
          s"${1L << (wBits + 1)}) div t_fx div 1000000 AS BIGINT)")
          .as("est_raw"))
  }

  // ---------------------------------------------------------------- KMV

  /** KMV bottom-k state of ONE batch: the k smallest distinct 60-bit
    * hashes, (h) rows — [[Profile.kmvDistinct]]'s sample.
    */
  def kmvState(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2)
    df.select(col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
      .select(Dedup.portableHash(concat(lit("kmv:"), col("key"))).as("h"))
      .distinct().orderBy(col("h")).limit(k)
  }

  /** Bottom-k merge: union, dedup, keep the k smallest — the classic
    * KMV merge (bottom-k of a union = bottom-k of the union of
    * bottom-ks, since any hash outside a side's bottom-k is dominated
    * by k smaller ones already in the union).
    */
  def mergeKmv(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).distinct().orderBy(col("h")).limit(k)

  /** Estimate read-off from a (merged) bottom-k state — identical
    * integer math to [[Profile.kmvDistinct]] minus the exact twin;
    * returns one row (n_kept, h_k, est_distinct).
    */
  def kmvEstimate(state: DataFrame, k: Int): DataFrame =
    state.agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .select(col("n_kept"), col("h_k"),
        when(col("n_kept") < k, col("n_kept")).otherwise(
          expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976)" +
            " div h_k AS BIGINT)")).as("est_distinct"))

  // ---------------------------------------------------------------- KLL

  /** KLL level-sample state of ONE batch: `cur_level` plus the (lvl, v)
    * survivor rows at that level — the same (l*, S_l*) state as
    * [[graft.functions.KllSketch]]'s buffer, as a DataFrame. cur_level
    * rides on every row (state tables are self-contained parquet; an
    * empty batch is an empty table, cur_level 0 implicitly).
    */
  def kllState(df: DataFrame, valueCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val lv = Caching.persist(df
      .select(col(valueCol).as("v"),
        Dedup.portableHash(
          concat(lit("kll:"), col(idCol).cast("string"))).as("h"))
      .where(col("v").isNotNull && col("h").isNotNull)
      .select(col("v"),
        when(col("h") === 0L, lit(60L))
          .otherwise(lit(60L) - length(ltrim(bin(col("h")), "0")))
          .as("lvl")))
    val levels = spark.range(0L, 62L).toDF("l")
    val sizes = levels
      .join(broadcast(lv.groupBy(col("lvl")).agg(count(lit(1)).as("c"))),
        col("lvl") >= col("l"), "left")
      .groupBy(col("l")).agg(coalesce(sum(col("c")), lit(0L)).as("sz"))
    val lstar = sizes.where(col("sz") <= k)
      .agg(min(col("l")).as("ls"))
    lv.crossJoin(broadcast(lstar)).where(col("lvl") >= col("ls"))
      .select(col("ls").as("cur_level"), col("lvl"), col("v"))
  }

  /** Level-sample merge: the new level is the smallest l at or above
    * both sides' cur_level whose union survivor count fits in k — at
    * such l the union's (lvl ≥ l) rows are COMPLETE (each side kept
    * everything at or above its own level), and levels below max
    * cur_level were already proven over-full on one side's inputs alone,
    * so this reproduces exactly the full-input state: merge order can
    * never change the result (the [[graft.functions.KllSketch]] merge,
    * as relational algebra).
    */
  def mergeKll(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = Caching.persist(a.unionByName(b))
    val spark = u.sparkSession
    import spark.implicits._
    val levels = spark.range(0L, 62L).toDF("l")
    val curMax = u.agg(coalesce(max(col("cur_level")), lit(0L)).as("cm"))
    val sizes = levels
      .join(broadcast(u.groupBy(col("lvl")).agg(count(lit(1)).as("c"))),
        col("lvl") >= col("l"), "left")
      .groupBy(col("l")).agg(coalesce(sum(col("c")), lit(0L)).as("sz"))
    val lstar = sizes.crossJoin(broadcast(curMax))
      .where(col("l") >= col("cm") && col("sz") <= k)
      .agg(min(col("l")).as("ls"))
    u.crossJoin(broadcast(lstar)).where(col("lvl") >= col("ls"))
      .select(col("ls").as("cur_level"), col("lvl"), col("v"))
  }

  /** Quantile read-off from a (merged) level-sample state — identical
    * type-1 integer-rank math to [[Profile.kllQuantile]]; returns one
    * row per point (q_pm, est_v, lvl, n_sample).
    */
  def kllEstimate(state: DataFrame, qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      "quantile points are per-mille in [1,1000]")
    val spark = state.sparkSession
    import spark.implicits._
    val ranked = state.select(col("v"), col("cur_level").as("ls"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy()).as("n_sample"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("v"))).as("rn"))
    val qs = qPermille.map(_.toLong).toDF("q_pm")
    ranked.join(broadcast(qs),
        col("rn") === greatest(lit(1L),
          expr("(q_pm * n_sample + 999) div 1000")))
      .select(col("q_pm"), col("v").as("est_v"), col("ls").as("lvl"),
        col("n_sample"))
  }

  // ---------------------------------------------------- parquet lifecycle

  /** Fold one batch's state into the parquet sidecar at `path` and
    * return the merged state (read back from the published table).
    * First call creates the sidecar; every later call reads the current
    * state, merges, writes to a temp directory and atomically
    * rename-swaps it in (a concurrent reader sees old state or new,
    * never partial; on a failed swap-in the old state is rolled back).
    * O(batch + state) work per ingest — never an O(corpus) rescan.
    */
  def updateSidecar(path: String, batchState: DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val spark = batchState.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(target)) {
      batchState.write.mode("overwrite").parquet(path)
    } else {
      val merged = merge(spark.read.parquet(path), batchState)
      val tmp = new org.apache.hadoop.fs.Path(path + "_graft_tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      val old = new org.apache.hadoop.fs.Path(path + "_graft_old")
      if (fs.exists(old)) fs.delete(old, true)
      if (!fs.rename(target, old))
        throw new java.io.IOException(s"sidecar: cannot swap out $path")
      if (!fs.rename(tmp, target)) {
        fs.rename(old, target) // roll back — old state intact
        throw new java.io.IOException(s"sidecar: cannot swap in $path")
      }
      fs.delete(old, true)
    }
    spark.read.parquet(path)
  }
}
