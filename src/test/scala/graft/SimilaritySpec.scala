package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("cosine: known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("zero-norm vectors rank LAST, never first via NaN") {
    // an all-zero embedding (failed encode / padding row) has undefined
    // cosine; 0/0 = NaN would sort ABOVE every real score in Spark and put
    // the garbage row at rank 1 of every top-k
    val withZero = emb.select("vec_id", "embedding")
      .union(Seq((999999L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val top = Similarity.knnBrute(withZero, "vec_id", "embedding", 0L, 10)
      .collect()
    assert(!top.map(_.getLong(0)).contains(999999L))
    assert(top.forall(r => !r.getDouble(1).isNaN))
    // a zero-norm QUERY scores everything -inf deterministically (no NaN)
    val qz = Similarity.knnBrute(withZero, "vec_id", "embedding", 999999L, 3)
      .collect()
    assert(qz.forall(r => r.getDouble(1) == Double.NegativeInfinity))
  }

  test("knnBrute: self excluded, scores descending, k respected") {
    val res = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(res.length == 10)
    assert(!res.map(_.getLong(0)).contains(0L))
    val scores = res.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  /** Corpus with 10 planted near-duplicates of vec 0 (small deterministic
    * per-dimension perturbation → cosine ≈ 1): the genuine "near neighbor"
    * regime ANN structures exist for. The base synthetic embeddings are
    * near-orthogonal (max pairwise cosine ≈ 0.47), so unplanted top-k is
    * noise, not neighborhood.
    */
  private lazy val planted = {
    val dups = (1 to 10).map { i =>
      emb.where(col("vec_id") === 0L)
        .select(lit(100000L + i).as("vec_id"),
          transform(col("embedding"),
            x => x + lit(i.toFloat / 1000.0f)).as("embedding"),
          lit(99).as("label"))
    }.reduce(_ union _)
    emb.select("vec_id", "embedding", "label").union(dups).cache()
  }

  test("knnLsh recall vs brute force on planted near-duplicates") {
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.forall(_ > 100000L), "brute-force top-10 should be the planted dups")
    val approx = Similarity.knnLsh(planted, "vec_id", "embedding", 0L, 10, bits = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall@10 = $recall")
  }

  test("knnIvf recall vs brute force on planted near-duplicates") {
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnIvf(planted, "vec_id", "embedding", 0L, 10,
      centroidEvery = 50, nprobe = 3).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall@10 = $recall")
  }

  test("pqEncode: m codes per vector, codes within codebook range") {
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
      m = 8, dim = 64, codes = 16)
    assert(cb.count() == 8 * 16)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", cb,
      m = 8, dim = 64)
    val n = emb.count()
    assert(enc.count() == n * 8, "one code per (vector, subspace)")
    val perVec = enc.groupBy("id").count().select("count").distinct().collect()
    assert(perVec.length == 1 && perVec(0).getLong(0) == 8L)
    val codeIds = cb.select("code").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(enc.select("code").distinct().collect()
      .map(_.getLong(0)).forall(codeIds.contains))
  }

  test("knnPq recall vs brute force on planted near-duplicates") {
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnPq(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ ADC recall@10 = $recall")
    // ADC distances come back ascending (nearest first)
    val d = Similarity.knnPq(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getDouble(1))
    assert(d.sameElements(d.sorted))
  }

  test("knnIvfPq recall vs brute force on planted near-duplicates") {
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnIvfPq(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ recall@10 = $recall")
  }

  test("knnIvfPq: candidate set is IVF-pruned, scores are PQ ADC") {
    // the top-3 probed cells for query 0, built from the same public pieces
    val q = emb.where(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val probed = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      .join(broadcast(q))
      .select(col("centroid_id"),
        Similarity.cosine(col("cvec"), col("qvec")).as("cs"))
      .orderBy(col("cs").desc, col("centroid_id")).limit(3)
      .collect().map(_.getLong(0)).toSet
    val cellOf = Similarity.ivfAssign(emb, "vec_id", "embedding", 50L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullPq = Similarity.knnPq(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Similarity.knnIvfPq(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, d) =>
      // every returned id lives in a probed cell…
      assert(probed.contains(cellOf(id)), s"id $id outside probed cells")
      // …and carries exactly the full-corpus PQ ADC distance for that id
      fullPq.get(id).foreach(fd => assert(math.abs(fd - d) < 1e-12))
    }
  }

  test("knnPq: results invariant under partition layout (bit-exact)") {
    // the distributed-correctness contract: argmin (exact min over doubles)
    // and the sub-ordered sequential fold make every stage independent of
    // how rows are split across partitions
    def run(parts: Int): Seq[(Long, Double)] =
      Similarity.knnPq(emb.repartition(parts), "vec_id", "embedding", 0L, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val base = run(1)
    assert(run(7) == base)
    assert(run(32) == base)
  }

  test("ivfTrain + knnIvfTrained: k centroids, full-dim codebook, recall holds") {
    val cents = Similarity.ivfTrain(planted, "vec_id", "embedding", k = 12,
      iters = 2)
    assert(cents.count() == 12)
    val dim = planted.select(org.apache.spark.sql.functions.size(col("embedding")))
      .first().getInt(0)
    assert(cents.select("cvec").collect()
      .forall(_.getSeq[Double](0).length == dim))
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnIvfTrained(planted, "vec_id", "embedding",
      cents, 0L, 10, nprobe = 3).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"trained-IVF recall@10 = $recall")
  }

  test("knnBatchChunked equals single-pass knnBatch") {
    val qs = emb.where(col("vec_id") < 9)
    val single = Similarity.knnBatch(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 5)
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val chunked = Similarity.knnBatchChunked(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 5, chunkSize = 3) // forces 3 chunks
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(chunked == single)
  }

  test("knnBatchChunked: empty query set returns empty frame, same schema") {
    // zero chunks used to crash reduce on an empty iterator (ADVICE r02)
    val out = Similarity.knnBatchChunked(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 0), "vec_id", "embedding", k = 5)
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("qid", "vec_id", "score", "rank"))
  }

  test("sizeCentroidEvery: sqrt-growth sizing rule") {
    assert(Similarity.sizeCentroidEvery(0L) == 1L)
    assert(Similarity.sizeCentroidEvery(100L) == 10L)
    assert(Similarity.sizeCentroidEvery(50000L) == 224L)
    // the property that kills the quadratic: cells k = n / stride ≈ sqrt(n)
    val n = 1000000L
    val k = n / Similarity.sizeCentroidEvery(n)
    assert(math.abs(k - 1000L) <= 1L)
  }

  test("sizeBits: log-growth sizing rule, clamped") {
    import graft.operators.Similarity.sizeBits
    assert(sizeBits(100, 256) == 4)          // below target → min clamp
    assert(sizeBits(256 * 64, 256) == 6)     // 64 buckets → 6 bits
    assert(sizeBits(256L * (1L << 30), 256) == 24) // max clamp
    // 10x the corpus adds ~log2(10) ≈ 3-4 bits — occupancy stays constant
    val b1 = sizeBits(2000, 256)
    val b10 = sizeBits(20000, 256)
    assert(b10 - b1 >= 3 && b10 - b1 <= 4)
  }

  test("nearDupPairsAuto: subset of brute-force pairs, threshold respected") {
    import graft.operators.Similarity
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.4, bits = 0, maxBucket = Int.MaxValue) // 1 bucket = all pairs
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Similarity.nearDupPairsAuto(emb, "vec_id", "embedding",
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact), "LSH candidates are exact-verified")
  }

  test("knnBq recall vs brute force on planted near-duplicates") {
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnBq(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"BQ recall@10 = $recall")
  }

  test("bqEncoded: packed words within [0, 2^32), query Hamming-0 to itself") {
    val enc = Similarity.bqEncoded(emb, "vec_id", "embedding", 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(enc.nonEmpty)
    // 32 bits per word keeps every packed value positive on BOTH engines —
    // the no-sign-bit invariant the oracle parity relies on
    assert(enc.forall { case (_, ws) =>
      ws.length == 2 && ws.forall(w => w >= 0L && w < (1L << 32))
    })
    // identical vectors encode identically (Hamming 0): planted id 100001
    // differs from 0 by a constant shift, most bits should agree too
    val byId = enc.toMap
    assert(byId(0L) == byId(0L))
    val dims = enc.head._2.length * 32
    assert(dims >= 64)
  }

  test("knnMatryoshka with mDim = dim equals knnBrute exactly") {
    // full-prefix coarse ranking is a superset of the exact top-k at 4x
    // oversample, so the exact re-rank must reproduce knnBrute verbatim
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mrl = Similarity.knnMatryoshka(emb, "vec_id", "embedding", 0L, 10,
        mDim = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mrl == brute)
  }

  test("knnMatryoshka recall vs brute force on planted near-duplicates") {
    // planted dups are near-parallel in EVERY prefix, so the 16-dim coarse
    // phase must surface them all
    val exact = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnMatryoshka(planted, "vec_id", "embedding",
        0L, 10).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"MRL recall@10 = $recall")
  }

  test("knnQuantized: int8 ranking agrees closely with full-precision") {
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val quant = Similarity.knnQuantized(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exact & quant).size
    assert(overlap >= 7, s"int8 top-10 overlap with fp32 = $overlap/10")
  }

  test("quantizeInt8: values within [-127, 127], zero vector stays zero") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(q(1L) == Seq(64, -127, 32)) // round(0.5/ (1/127)) = 64 (half up)
    assert(q(2L) == Seq(0, 0, 0))
    assert(q.values.flatten.forall(v => v >= -127 && v <= 127))
  }

  test("knnBatch: per-query ranks agree with single-query knnBrute") {
    val queries = emb.where(col("vec_id") < 3)
    val batch = Similarity.knnBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      }
    for (q <- 0L to 2L) {
      val single = Similarity.knnBrute(emb, "vec_id", "embedding", q, 5)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(q) == single, s"query $q")
    }
  }

  test("ivfAssign: every vector gets exactly one centroid") {
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", 50L)
    assert(assigned.count() == emb.count())
    assert(assigned.groupBy("vec_id").count().where(col("count") > 1).count() == 0)
  }

  test("balancedIvfAssign: caps hold, spills go second-nearest, minimal") {
    val n = emb.count()
    val kc = emb.where(col("vec_id") % 50 === 0).count()
    val cap = (n * 110 + kc * 100 - 1) / (kc * 100)
    val out = Similarity.balancedIvfAssign(emb, "vec_id", "embedding",
      centroidEvery = 50, slackPct = 110).cache()
    assert(out.count() == n) // one row per vector, none lost
    // un-spilled rows sit exactly where plain assignment puts them
    val natural = Similarity.ivfAssign(emb, "vec_id", "embedding", 50L)
      .withColumnRenamed("centroid_id", "nat_centroid")
    assert(out.where(col("spilled") === 0).join(natural, "vec_id")
      .where(col("centroid_id") =!= col("nat_centroid")).count() == 0)
    // primary (un-spilled) load never exceeds the cap
    val overCap = out.where(col("spilled") === 0)
      .groupBy("centroid_id").count().where(col("count") > cap).count()
    assert(overCap == 0, s"primary list over cap=$cap")
    // spill count is exactly the sum of the natural lists' overflow —
    // the single-pass minimum
    val expectedSpills = natural.groupBy("nat_centroid").count()
      .agg(sum(greatest(col("count") - cap, lit(0L)))).head().getLong(0)
    assert(out.where(col("spilled") === 1).count() == expectedSpills)
    // every spilled row lands on its SECOND-nearest centroid
    val cents = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val second = emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        Similarity.cosine(col("embedding"), col("cvec")).as("cs"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cs").desc, col("centroid_id"))))
      .where(col("rn") === 2)
      .select(col("vec_id"), col("centroid_id").as("snd"))
    assert(out.where(col("spilled") === 1).join(second, "vec_id")
      .where(col("centroid_id") =!= col("snd")).count() == 0)
    out.unpersist()
  }

  test("balancedIvfAssign: partition-layout invariant; single centroid " +
      "never spills") {
    val a = Similarity.balancedIvfAssign(emb, "vec_id", "embedding", 50, 110)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Similarity.balancedIvfAssign(emb.repartition(7), "vec_id",
        "embedding", 50, 110)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
    // one centroid (stride past max id): nothing to spill to — everything
    // stays primary even though the single list is over any cap
    val one = Similarity.balancedIvfAssign(emb, "vec_id", "embedding",
      centroidEvery = 1000000L, slackPct = 110)
    assert(one.where(col("spilled") =!= 0).count() == 0)
    assert(one.select("centroid_id").distinct().count() == 1)
  }

  test("mmrSelect: pure relevance equals brute order, diversity demotes " +
      "planted near-dups") {
    // λ=100: the penalty term vanishes — MMR must reproduce knnBrute
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 8)
      .collect().map(_.getLong(0)).toSeq
    val pure = Similarity.mmrSelect(emb, "vec_id", "embedding", 0L, k = 8,
        candN = 25, lambdaPct = 100)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(pure == brute)
    // planted near-identical copies of id 0 dominate pure relevance, but
    // at λ=50 the mutual ~1.0 similarity must break the clone run: the
    // 8 picks cannot be 8 clones
    val relTop = Similarity.knnBrute(planted, "vec_id", "embedding", 0L, 8)
      .collect().map(_.getLong(0)).toSeq
    assert(relTop.count(_ >= 100000L) == 8, "clones should own pure top-8")
    val mmr = Similarity.mmrSelect(planted, "vec_id", "embedding", 0L,
        k = 8, candN = 25, lambdaPct = 50)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(mmr.count(_ >= 100000L) < 8,
      s"diversification must demote some clones, got $mmr")
    // rank 1 is always the top-relevance hit, and selection is
    // partition-layout invariant
    assert(mmr.head == relTop.head)
    val again = Similarity.mmrSelect(planted.repartition(7), "vec_id",
        "embedding", 0L, k = 8, candN = 25, lambdaPct = 50)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(again == mmr)
  }

  test("mmrSelect: corpus-sized candN fails fast; k=1 oracle SQL has no " +
      "dangling fragment") {
    // the greedy loop collects a candN² pair matrix — a mis-sized call
    // must error with a message, never drive toward a driver OOM (the
    // require fires before any job runs)
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(emb, "vec_id", "embedding", 0L, k = 8,
        candN = Similarity.MaxMmrCandidates + 1)
    }
    assert(e.getMessage.contains("candidate bound"))
    // k=1 leaves the rounds fragment empty: the CTE list must close
    // cleanly after sel1 (no dangling comma) and select from sel1
    val sql1 = Similarity.mmrSelectOracleSql(0L, k = 1)
    assert(sql1.contains("LIMIT 1)\nSELECT id AS"), sql1.takeRight(200))
    assert(sql1.contains("FROM sel1"))
    assert(!sql1.contains("sel2"))
    // k>1 still chains rounds
    assert(Similarity.mmrSelectOracleSql(0L, k = 3).contains("FROM sel3"))
    // kCenterOracleSql shares the pattern: k=1 must not leave a dangling
    // comma after b1 or a bare trailing UNION ALL
    val kc1 = Similarity.kCenterOracleSql(1)
    assert(kc1.contains("c1 c)\nSELECT 1::BIGINT AS rank"),
      kc1.takeRight(200))
    assert(kc1.trim.endsWith("FROM c1"))
    assert(Similarity.kCenterOracleSql(3).contains("FROM c3"))
  }

  test("annRecallIvf: probing every list gives recall 100, fields consistent") {
    val kc = emb.where(col("vec_id") % 50 === 0).count().toInt
    val full = Similarity.annRecallIvf(emb, "vec_id", "embedding",
      queryEvery = 100L, k = 10, centroidEvery = 50, nprobe = kc)
      .collect()
    assert(full.length == emb.where(col("vec_id") % 100 === 0).count())
    // all lists probed ⇒ the approximate side IS brute force
    assert(full.forall(_.getLong(2) == 100L), "full-probe recall must be 100")
    // partial probe: hits ≤ k, recall_pct = hits*100 div k, and at least
    // one query below 100 (otherwise nprobe=1 would be uninformative here)
    val part = Similarity.annRecallIvf(emb, "vec_id", "embedding",
      queryEvery = 100L, k = 10, centroidEvery = 50, nprobe = 1)
      .collect()
    assert(part.forall(r => r.getLong(1) <= 10 &&
      r.getLong(2) == r.getLong(1) * 100 / 10))
    assert(part.exists(_.getLong(2) < 100L))
  }

  test("standardizeEmbeddings: per-dim mean 0 / unit variance, constant dim → 0") {
    val df = Seq(
      (1L, Seq(1.0f, 5.0f, 7.0f)),
      (2L, Seq(3.0f, 5.0f, 1.0f)),
      (3L, Seq(5.0f, 5.0f, 4.0f))).toDF("vec_id", "embedding")
    val z = Similarity.standardizeEmbeddings(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // dim 1: values 1,3,5 → mean 3, population std sqrt(8/3)
    val s1 = math.sqrt(8.0 / 3.0)
    assert(math.abs(z((1L, 1L)) - (-2.0 / s1)) < 1e-6)
    assert(math.abs(z((2L, 1L)) - 0.0) < 1e-6)
    assert(math.abs(z((3L, 1L)) - (2.0 / s1)) < 1e-6)
    // constant dim 2 → all zeros, not NaN
    assert(Seq(1L, 2L, 3L).forall(i => z((i, 2L)) == 0.0))
    // every dim's z-values sum to ~0 (mean removed)
    val byDim = z.groupBy(_._1._2).view.mapValues(_.values.sum)
    assert(byDim.values.forall(s => math.abs(s) < 1e-5))
  }

  test("diversitySample: quota per cluster, full coverage, partial top-k plan") {
    val ds = Similarity.diversitySample(emb, "vec_id", "embedding",
      centroidEvery = 50L, perCluster = 3)
    val rows = ds.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // quota respected inside every cluster, ranks are 1..n
    val byCluster = rows.groupBy(_._1)
    assert(byCluster.values.forall(_.length <= 3))
    assert(byCluster.values.forall(g =>
      g.map(_._3).sorted.toSeq == (1L to g.length).toSeq))
    // coverage: every populated cluster is represented (the property a
    // global top-k sample does NOT have)
    val populated = Similarity.ivfAssign(emb, "vec_id", "embedding", 50L)
      .select("centroid_id").distinct().collect().map(_.getLong(0)).toSet
    assert(byCluster.keySet == populated)
    // scale pin: the rank-limit window runs as per-partition PARTIAL
    // top-k (WindowGroupLimit) before the cluster shuffle
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("nearDupPairs: planted duplicate vector is found with score ~1") {
    val planted = emb.limit(1)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.select("vec_id", "embedding", "label").union(planted)
    val pairs = Similarity.nearDupPairs(withDup, "vec_id", "embedding",
      threshold = 0.99, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._2 == p._1 + 100000L && p._3 > 0.999))
  }

  test("mineHardNegatives: positives and self excluded, still k results") {
    val queries = emb.where(col("vec_id") === 3L)
    // label this query's two nearest neighbors as positives: the mined
    // negatives must be the brute top-k AFTER skipping exactly those two
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 3L, 7)
      .collect().map(_.getLong(0))
    val positives = Seq((3L, brute(0)), (3L, brute(1))).toDF("qid", "pos_id")
    val mined = Similarity.mineHardNegatives(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", positives, "qid", "pos_id", k = 5)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(mined.length == 5)
    assert(mined.toSeq == brute.drop(2).take(5).toSeq,
      "negatives must be the next-best candidates after the positives")
    assert(!mined.contains(3L) && !mined.contains(brute(0)) && !mined.contains(brute(1)))
  }

  test("hashEmbed: deterministic, layout-invariant, sign-balanced") {
    val df = Seq((1L, "alpha beta gamma alpha"), (2L, "alpha beta"),
      (3L, "delta")).toDF("id", "text")
    def vecs(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      Similarity.hashEmbed(d, Seq("id"), "text", dim = 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val v = vecs(df)
    assert(v(1).length == 16)
    // integer-valued components; repeated token doubles its contribution
    assert(v.values.flatten.forall(x => x == math.rint(x)))
    assert(v(1).map(math.abs).sum == 4.0 || v(1).map(math.abs).sum == 2.0,
      "alpha twice + beta + gamma: |sum| 4 unless colliding indexes cancel")
    // same content → same vector regardless of partition layout
    assert(vecs(df.repartition(5)) == v)
  }

  test("hashEmbed: randomized docs match the md5 reference exactly") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val dim = 8
    val docs = (0L until 12L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def refVec(text: String): Seq[Double] = {
      val v = Array.fill(dim)(0.0)
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        v((h % dim).toInt) += (if (h % (2 * dim) < dim) 1.0 else -1.0)
      }
      v.toSeq
    }
    val got = Similarity.hashEmbed(docs.toDF("id", "text"), Seq("id"), "text", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    docs.foreach { case (id, text) => assert(got(id) == refVec(text), s"doc $id") }
  }

  test("retrieveChunks: verbatim-copied chunk is its probe's rank-1 hit") {
    // doc 100 copies doc 7's text; probing with doc 7 must retrieve the
    // copy's chunk first, with cosine exactly 1.0
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((7L, base), (100L, base),
      (101L, (50 to 90).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis.chunk(
      docs.where(col("doc_id") =!= 7L), "doc_id", "text",
      window = 40, stride = 40)
    val got = Similarity.retrieveChunks(chunks, "doc", "chunk_id",
      "chunk_text", docs.where(col("doc_id") === 7L)
        .select(col("doc_id").as("probe_id"), col("text")),
      "probe_id", "text", dim = 32, k = 2)
      .orderBy("rank").collect()
    assert(got(0).getLong(1) == 100L && math.abs(got(0).getDouble(3) - 1.0) < 1e-12)
    assert(got(1).getLong(1) == 101L && got(1).getDouble(3) < 0.9)
  }

  test("semDedup (trained): planted exact duplicates dropped, originals kept") {
    // clone the first 5 vectors under high ids: k-means puts a clone in its
    // original's cluster (identical vector ⇒ identical assignment scores,
    // min centroid_id tie-break), so all 5 clones must drop and every
    // original survive
    val planted = emb.limit(5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val withDup = emb.select("vec_id", "embedding").union(planted)
    val kept = Similarity.semDedup(withDup, "vec_id", "embedding",
      k = 8, threshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert((0L until 5L).forall(kept.contains))
    assert((100000L until 100005L).forall(id => !kept.contains(id)))
    // nothing else disappears at a ~identity threshold unless it has a
    // genuine near-identical twin; sanity floor on survivor count
    assert(kept.size >= emb.count() - 5)
  }

  test("semDedupFixed: min-id survivor rule, capped clusters never lossy") {
    // 3 identical vectors in one cluster: 10 survives, 11/12 drop
    val v = Seq.fill(4)(1.0f)
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), // centroid row (id % 2 == 0 picks 0, 2, ...)
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (10L, v), (11L, v), (12L, v),
      (13L, Seq(-1.0f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedupFixed(df, "vec_id", "embedding",
      centroidEvery = 2L, threshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(10L) && !kept.contains(11L) && !kept.contains(12L))
    // a maxBucket smaller than the dup cluster exempts it from PAIRING:
    // its members all come back — conservative, never silently lossy
    val keptCapped = Similarity.semDedupFixed(df, "vec_id", "embedding",
      centroidEvery = 2L, threshold = 0.999, maxBucket = 2)
      .collect().map(_.getLong(0)).toSet
    assert(Set(10L, 11L, 12L).subsetOf(keptCapped))
  }

  test("knnIvfIndexed: layout-served answer matches knnIvf, scan is pruned") {
    val dir = s"/tmp/graft_ivf_spec_${spark.sparkContext.applicationId}"
    val index = Similarity.writeIvfIndex(emb, "vec_id", "embedding", dir)
    val total = index.count()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = rows(Similarity.knnIvf(emb, "vec_id", "embedding",
      queryId = 0L, k = 10))
    val served = Similarity.knnIvfIndexed(index, "vec_id", "embedding",
      queryId = 0L, k = 10)
    assert(rows(served) == direct)
    // the inverted-list scan must be partition-pruned to the probed lists:
    // its FileSourceScanExec reads strictly fewer rows than the corpus
    // (3 probed lists of ~centroidEvery vectors each, not all of them).
    // Materialize first so AQE finalizes, then walk THROUGH the adaptive
    // wrapper (collectLeaves stops at AdaptiveSparkPlanExec)
    served.collect() // populate metrics through THIS plan
    val scans = collectWithSubqueries(served.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // the list scan is the one carrying a partition filter on centroid_id
    val pruned = scans.filter(_.partitionFilters.nonEmpty)
    assert(pruned.nonEmpty,
      s"expected a partition-filtered scan, got: ${scans.map(_.partitionFilters)}")
    val scannedRows = pruned.map(_.metrics("numOutputRows").value).max
    assert(scannedRows > 0 && scannedRows * 2 < total,
      s"probed scan read $scannedRows of $total rows — not pruned")
    // probe selection through the build-time codebook sidecar must give
    // the IDENTICAL answer (the sidecar holds exactly the id-recipe rows);
    // at 100 TB this is the difference between O(centroids) and O(index)
    // input per query's probe step
    val cb = Similarity.ivfCodebook(spark, dir, "vec_id", "embedding", 50L)
    assert(cb.count() == index.where(col("vec_id") % 50 === 0).count(),
      "sidecar must hold exactly the centroid-recipe rows")
    val servedCb = Similarity.knnIvfIndexed(index, "vec_id", "embedding",
      queryId = 0L, k = 10, codebook = Some(cb))
    assert(rows(servedCb) == direct,
      "codebook-served probe selection must not change the answer")
    // the literal-vector serving path (online pattern: query embedding
    // from outside the corpus) with excludeId must answer identically to
    // the by-id path for the same vector
    val qvec = emb.where(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val servedVec = Similarity.knnIvfIndexedVec(index, "vec_id",
      "embedding", qvec, k = 10, codebook = Some(cb), excludeId = Some(0L))
    assert(rows(servedVec) == direct,
      "vector-literal serving must equal by-id serving for the same vector")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("correlationMatrix: perfect/anti/zero correlation and constant-dim " +
      "guard, upper triangle only") {
    import spark.implicits._
    // dim1 = x, dim2 = -x (corr -1), dim3 = const (corr 0 by guard),
    // dim4 chosen orthogonal-ish to x
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 5.0f, 1.0f)),
      (2L, Seq(2.0f, -2.0f, 5.0f, -1.0f)),
      (3L, Seq(3.0f, -3.0f, 5.0f, 1.0f)),
      (4L, Seq(4.0f, -4.0f, 5.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.correlationMatrix(df, "embedding").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(3)).toMap
    assert(r((1L, 1L)) == 1.0)   // self-correlation exact
    assert(r((1L, 2L)) == -1.0)  // perfect anti-correlation
    assert(r((1L, 3L)) == 0.0 && r((3L, 3L)) == 0.0) // zero variance guard
    assert(math.abs(r((1L, 4L))) < 0.5) // weakly correlated
    // upper triangle only: no (2,1)
    assert(!r.contains((2L, 1L)))
    assert(r.size == 10) // 4*5/2 pairs
  }

  test("jlProject: linearity, partition invariance, derived sign matrix") {
    import graft.operators.Similarity
    val a = Seq((0L, Seq(1.0f, 2.0f, -3.0f, 0.5f)),
                (1L, Seq(0.0f, -1.0f, 4.0f, 2.5f)))
    // row 2 = row0 + row1 elementwise → projection must be the exact sum
    val both = a :+ (2L, a(0)._2.zip(a(1)._2).map { case (x, y) => x + y })
    val df = both.toDF("vec_id", "embedding")
    val p = Similarity.jlProject(df, "vec_id", "embedding", dim = 4, outDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p.size == 24)
    for (j <- 0L until 8L)
      assert(p((2L, j)) == p((0L, j)) + p((1L, j)), s"j=$j")
    // shuffling the input across partitions cannot change exact sums
    val p2 = Similarity.jlProject(df.repartition(7), "vec_id", "embedding", 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p2 == p)
  }

  test("anisotropy: known cosines over in-bucket neighbor pairs") {
    import graft.operators.Similarity
    // buckets=1 → pairs are consecutive ids: (1,2) parallel → 1e6,
    // (2,3) orthogonal → 0
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(0.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.anisotropy(vecs, "vec_id", "embedding", buckets = 1)
      .collect()(0)
    assert(r.getLong(0) == 2L)        // n_pairs
    assert(r.getLong(1) == 500000L)   // mean
    assert(r.getLong(2) == 0L)        // min
    assert(r.getLong(3) == 1000000L)  // max
  }


  test("jlProject and anisotropy: empty and singleton inputs are safe") {
    import graft.operators.Similarity
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.jlProject(empty, "vec_id", "embedding", 4, 4).count() == 0)
    val one = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = Similarity.anisotropy(one, "vec_id", "embedding", 1).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L) // no pairs, mean 0
    // a zero-norm (dead) vector pins cos = 0 instead of NaN-crashing
    val withZero = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.anisotropy(withZero, "vec_id", "embedding", 1)
      .collect()(0)
    assert(z.getLong(0) == 1L && z.getLong(1) == 0L)
  }

  test("dbscanGrid: cores, border, noise on a planted 1-D layout") {
    // vectors (t, 0): the JL sign matrix maps them to (±t_fx, ±t_fx), so
    // projected L∞ distance == |Δt|·1e6 exactly — geometry is controlled.
    // 8 points at t=0, one at 0.9 (within eps=1.0 of the pile), one at
    // 1.8 (within eps of 0.9 only), one far singleton.
    val pts = ((1L to 8L).map(i => (i, Seq(0.0f, 0.0f))) ++ Seq(
      (20L, Seq(0.9f, 0.0f)), (30L, Seq(1.8f, 0.0f)),
      (99L, Seq(50.0f, 0.0f)))).toDF("vec_id", "embedding")
    val got = Similarity.dbscanGrid(pts, "vec_id", "embedding", dim = 2,
      epsFx = 1000000L, minPts = 9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // pile + 0.9 are cores (9 and 10 neighbors incl. self), one cluster
    // labeled by the min id; 1.8 is border via core 20; 99 is noise
    for (i <- 1L to 8L) assert(got(i) == ((1L, "core")), s"pt $i")
    assert(got(20L) == ((1L, "core")))
    assert(got(30L) == ((1L, "border")))
    assert(got(99L) == ((-1L, "noise")))

    // minPts = 1: the self-count alone cores every point — the isolated
    // far point becomes its own singleton cluster, never noise
    val solo = Similarity.dbscanGrid(pts, "vec_id", "embedding", dim = 2,
      epsFx = 1000000L, minPts = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(solo(99L)._2 == "core" && solo(99L)._1 == 99L)
    assert(solo.values.forall(_._2 == "core"))
  }

  test("pcaPower: recovers the planted dominant direction") {
    // variance concentrated on dim 1 (±1.0), slight correlated dim-2
    // noise, dim 3 near-constant → the top component is ≈ ±e1 and the
    // L∞-normalized output pins |v_micro(1)| = 1e6
    val vecs = Seq(
      (1L, Seq(1.0f, 0.1f, 0.01f)),
      (2L, Seq(-1.0f, -0.1f, 0.01f)),
      (3L, Seq(0.9f, 0.05f, 0.0f)),
      (4L, Seq(-0.9f, -0.05f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaPower(vecs, "embedding", iters = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), BigInt(r.getString(2)), BigInt(r.getString(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(math.abs(got(1L)._1) == 1000000L)
    // dim 2 loads at ~0.08 of dim 1, dim 3 at ~0
    assert(math.abs(got(2L)._1) < 200000L && math.abs(got(3L)._1) < 50000L)
    // the two big components agree in sign with the planted correlation
    assert(got(1L)._1.signum == got(2L)._1.signum)
    // Rayleigh quotient of the scatter is strictly positive (the digit
    // strings parse as exact integers — no scientific notation, no dot)
    assert(got(1L)._2.signum > 0 && got(1L)._3.signum > 0)
  }

  test("rerankMaxSim: token coverage beats bag overlap at the re-rank") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // probe asks for "alpha bravo charlie …"; doc 10 repeats alpha (big
    // bag-of-words overlap), doc 20 covers every query token once. The
    // MaxSim re-rank must put the covering doc first regardless of the
    // first-stage bag score.
    val filler = (1 to 20).map(i => s"zz$i").mkString(" ")
    val docsDf = Seq(
      (1L, "alpha bravo charlie delta echo " + filler),
      (10L, ("alpha " * 25).trim),
      (20L, "alpha bravo charlie delta echo " +
        (1 to 20).map(i => s"qq$i").mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis.chunk(
      docsDf, "doc_id", "text", window = 32, stride = 24)
    val probes = docsDf.where(col("doc_id") === 1)
      .select(col("doc_id").as("probe_id"),
        lit("alpha bravo charlie delta echo").as("text"))
    val got = graft.operators.Similarity.rerankMaxSim(
      chunks, "doc", "chunk_id", "chunk_text",
      probes, "probe_id", "text", dim = 64, firstK = 10, k = 3)
      .orderBy(col("rank")).collect()
    assert(got(0).getAs[Long]("doc") == 20L,
      s"covering doc must out-rank the repeat doc: ${got.toSeq}")
    // every query token matches exactly somewhere in doc 20 → its MaxSim
    // is the 5-token perfect score; doc 10 matches only 'alpha'
    val byDoc = got.map(r => r.getAs[Long]("doc") ->
      r.getAs[Long]("maxsim_micro")).toMap
    assert(byDoc(20L) == 5000000L)
    assert(byDoc(10L) < 2000000L)
  }

  test("kCenterCoreset: planted blobs covered one pick each, then interior") {
    // vectors (t, 0) quantize directly to (t_fx, 0) — L2² distances are
    // exact: three well-separated blobs on a line — greedy farthest-point
    // must land its first 3 picks one per blob, and every later pick adds
    // strictly less covering radius than the one before (Gonzalez
    // monotonicity: best_sq is non-increasing in rank)
    val pts = Seq(
      (1L, Seq(0.00f, 0.0f)), (2L, Seq(0.01f, 0.0f)), (3L, Seq(0.02f, 0.0f)),
      (11L, Seq(5.00f, 0.0f)), (12L, Seq(5.01f, 0.0f)),
      (21L, Seq(9.00f, 0.0f)), (22L, Seq(9.02f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(pts, "vec_id", "embedding", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 5)
    // start = min id (blob A); pick 2 = farthest point overall (9.02, blob
    // C, ties broken toward min id are irrelevant here); pick 3 = blob B
    assert(got(0) == ((1L, 1L, 0L)))
    assert(got(1)._2 == 22L)
    assert(Set(11L, 12L).contains(got(2)._2))
    val blob = (id: Long) => id / 10L
    assert(got.take(3).map(p => blob(p._2)).toSet.size == 3,
      "first 3 picks must cover all 3 blobs")
    // covering radius (best_sq of the NEXT pick) never increases
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"best_sq must be non-increasing: ${radii.toSeq}")
    // rank-2 residual = exact fixed-point distance 9.02e6² to the start
    assert(got(1)._3 == 9020000L * 9020000L)
  }

  test("simplifiedSilhouette: tight planted blobs score near 1, " +
      "single-centroid corpus yields no rows") {
    // two tight blobs around the two codebook points (ids 0 and 10 with
    // centroidEvery = 10): every member's own-centroid distance is tiny
    // vs the cross-blob distance, so s ≈ 1e6 for all; exact n per cluster
    val blobA = (0L to 4L).map(i => (i, Seq(1.0f + i * 0.001f, 0.0f)))
    val blobB = (10L to 14L).map(i => (i, Seq(-1.0f - i * 0.001f, 0.0f)))
    val pts = (blobA ++ blobB).toDF("vec_id", "embedding")
    val got = Similarity.simplifiedSilhouette(pts, "vec_id", "embedding",
        centroidEvery = 10L)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == Seq((0L, 5L), (10L, 5L)))
    assert(got.forall(_._3 > 900000L),
      s"tight blobs must score near 1e6: ${got.toSeq}")
    // one centroid → no second-nearest exists → empty result, not a crash
    val solo = Similarity.simplifiedSilhouette(
      blobA.toDF("vec_id", "embedding"), "vec_id", "embedding", 10L)
    assert(solo.collect().isEmpty)
  }

  test("marginMining: margin re-ranks raw cosine by neighborhood density " +
      "(the hubness correction)") {
    // one cluster around centroid id 0 at (1, 0). Ids 2/3 (src/tgt) share
    // the exact same vector — the raw-cosine winner (cos = 1e6) — but sit
    // in a DENSE neighborhood (4, 5, 7 are all similar to them), while
    // the (6, 5) pair is merely similar (cos ≈ 0.9e6) in a SPARSE
    // neighborhood. The ratio margin must therefore rank (6, 5) ABOVE the
    // identical pair: similarity relative to what each side considers
    // similar, not absolute cosine — the correction that makes mined
    // bitext usable.
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f)), // centroid
      (2L, Seq(0.9f, 0.4f)), (3L, Seq(0.9f, 0.4f)), // identical pair
      (4L, Seq(1.0f, 0.1f)), (5L, Seq(1.0f, -0.1f)),
      (6L, Seq(0.8f, -0.5f)), (7L, Seq(0.7f, 0.6f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.marginMining(pts, "vec_id", "embedding",
        centroidEvery = 50L, kNn = 2, topN = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // raw-cosine winner is the identical pair…
    assert(got.maxBy(_._3)._3 == 1000000L)
    assert((got.maxBy(_._3)._1, got.maxBy(_._3)._2) == ((2L, 3L)))
    // …but margin rank 1 is the sparse-neighborhood pair
    assert((got.head._1, got.head._2) == ((6L, 5L)),
      s"margin must promote the sparse-neighborhood pair: ${got.toSeq}")
    // the identical pair still clears 1e6 (better than its neighborhood)
    val planted = got.find(g => g._1 == 2L && g._2 == 3L).get
    assert(planted._4 > 1000000L, s"identical pair margin: $planted")
    // output is sorted by margin desc and every denom was > 0
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
    assert(got.forall(_._4 > 0))
  }

  test("kCenterCoreset: empty input and k > n contracts") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.kCenterCoreset(empty, "vec_id", "embedding", 3)
      .collect().isEmpty)
    // k > |pts|: once all points are picked, residuals are 0 and the
    // (best DESC, id ASC) argmax re-picks min id — documented duplicates
    val two = Seq((5L, Seq(0.0f, 0.0f)), (7L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(two, "vec_id", "embedding", 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).toSeq == Seq(5L, 7L, 5L, 5L))
    assert(got.drop(2).forall(_._3 == 0L))
  }

  test("dbscanGrid: pruneEmptyCells path is value-identical to direct probe") {
    def run(prune: Boolean) = Similarity.dbscanGrid(emb, "vec_id",
        "embedding", dim = 64, epsFx = 200000L, minPts = 3,
        pruneEmptyCells = prune)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val direct = run(false)
    val pruned = run(true)
    assert(pruned == direct)
    assert(direct.nonEmpty)
  }

  test("mmdByGroup: single group and empty input yield no pairs") {
    import spark.implicits._
    val one = Seq(("a", Seq(1.0f, 0.0f))).toDF("g0", "vec")
    assert(Similarity.mmdByGroup(one, "g0", "vec").collect().isEmpty)
    val none = Seq.empty[(String, Seq[Float])].toDF("g0", "vec")
    assert(Similarity.mmdByGroup(none, "g0", "vec").collect().isEmpty)
  }

  test("mmdByGroup: orthogonal-mean hand value, identical groups at zero") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(1.0f, 0.0f)),
      ("b", Seq(0.0f, 1.0f)), ("b", Seq(0.0f, 1.0f)),
      ("c", Seq(1.0f, 0.0f)), ("c", Seq(1.0f, 0.0f)))
      .toDF("g0", "vec")
    val out = Similarity.mmdByGroup(df, "g0", "vec")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a vs b: s_A=(2e6,0), s_B=(0,2e6), n=2 each
    // num = (2e6·2)² + (2e6·2)² = 3.2e13; ·1e6 / (2·2)² = 2e18
    assert(out(("a", "b")) == ((2L, 2L, 2000000000000000000L)))
    // identical distributions: exactly zero
    assert(out(("a", "c")) == ((2L, 2L, 0L)))
    assert(out(("b", "c"))._3 == out(("a", "b"))._3)
    assert(out.size == 3) // each unordered pair exactly once
  }

}
