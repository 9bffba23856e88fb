package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(1.5)),
    (5L, None, None)
  ).toDF("id", "s", "v")

  test("profileExact: per-column nulls, distincts, ranges in one row each") {
    val got = Profile.profileExact(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(got("id") == ((0L, 5L, "1", "5")))
    assert(got("s") == ((2L, 2L, "a", "b")))
    assert(got("v") == ((2L, 2L, "1.5", "2.5")))
  }

  test("profile (HLL tier): same shape, cardinalities within rsd regime") {
    val got = Profile.profile(df, Seq("id", "s"), rsd = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // 5 and 2 true distincts — at this cardinality HLL is exact
    assert(got("id") == 5L && got("s") == 2L)
  }

  test("profile is one job / one scan regardless of column count") {
    val plan = Profile.profileExact(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    // a single aggregate tree — no unioned per-column subplans
    assert(!plan.contains("Union"))
  }

  test("histogram: fixed edges, closed upper edge, out-of-range guards, null skip") {
    import spark.implicits._
    val data = Seq(Some(-1.0), Some(0.0), Some(2.5), Some(5.0), Some(7.5),
      Some(10.0), Some(11.0), None).toDF("x")
    val got = Profile.histogram(data, "x", lo = 0.0, hi = 10.0, bins = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -1.0 → guard -1; 0.0, 2.5 → bucket 0; 5.0, 7.5 → bucket 1;
    // 10.0 == hi → last bucket (closed); 11.0 → guard 2; null skipped
    assert(got == Map(-1L -> 1L, 0L -> 2L, 1L -> 3L, 2L -> 1L))
  }

  test("psiDrift: identical snapshots ≈ 0, shifted snapshot alarms, symmetric") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i % 10).toDouble).toDF("x")
    val b = (1 to 1000).map(i => ((i % 10) + 4).toDouble).toDF("x")
    def psi(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame): Double =
      Profile.psiDrift(l, r, "x", lo = 0.0, hi = 10.0, bins = 5)
        .select("psi").head().getDouble(0)
    assert(psi(a, a) == 0.0)             // identical distribution
    val drifted = psi(a, b)
    assert(drifted > 0.25, s"a 4-bucket shift must alarm, got $drifted")
    // PSI is symmetric by construction
    assert(math.abs(psi(a, b) - psi(b, a)) < 1e-9)
    // the out-of-range guard bucket carries the shifted mass: bucket 5
    // (above hi) must show cur-side counts
    val rows = Profile.psiDrift(a, b, "x", 0.0, 10.0, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(5L) > 0)
    // the output is ALWAYS the full bins+2 fixed grid — even for empty
    // snapshots the monitoring path reads a stable psi = 0, never 0 rows
    assert(rows.keySet == (-1L to 5L).toSet)
    val empty = a.limit(0)
    val deg = Profile.psiDrift(empty, empty, "x", 0.0, 10.0, 5)
      .select("psi").distinct().collect()
    assert(deg.length == 1 && deg(0).getDouble(0) == 0.0)
  }

  test("ksDrift: identical → 0, disjoint → 1, hand-checked shift") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    assert(Profile.ksDrift(a, a, "x").head().getDouble(2) == 0.0)
    val disjoint = Seq(10.0, 11.0).toDF("x")
    assert(Profile.ksDrift(a, disjoint, "x").head().getDouble(2) == 1.0)
    // a = {1..4}, b = {3..6}: at v=2 ECDFs are 2/4 vs 0/4 → D = 0.5
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    val r = Profile.ksDrift(a, b, "x").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((4L, 4L, 0.5)))
  }

  test("ksDriftQuantized: bounded window over a continuous high-card column") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    // every value distinct (the exact tier's worst case): uniform [0,1)
    // vs uniform [0.5,1.5) via deterministic hash-derived fractions
    val n = 20000
    val base = spark.range(n)
      .select((pmod(hash(col("id")), lit(10000)).cast("double") / 10000.0
        + col("id").cast("double") / 1e12).as("x"))
    val curr = base.select((col("x") + 0.5).as("x"))
    val r = Profile.ksDriftQuantized(base, curr, "x", 0.0, 2.0, 40).head()
    assert((r.getLong(0), r.getLong(1)) == ((n.toLong, n.toLong)))
    // true D = 0.5 for a half-width shift of uniforms; the quantized stat
    // is a lower bound that is tight here (edges align with the shift)
    assert(math.abs(r.getDouble(2) - 0.5) < 0.02)
    // identical snapshots → exactly 0 through the quantized path too
    assert(Profile.ksDriftQuantized(base, base, "x", 0.0, 2.0, 40)
      .head().getDouble(2) == 0.0)
    // the cumulative window's input is the bucket table: ≤ bins+2 rows
    // regardless of corpus cardinality — lower-bound property vs exact tier
    val exact = Profile.ksDrift(base, curr, "x").head().getDouble(2)
    assert(r.getDouble(2) <= exact + 1e-9)
  }

  test("outliersMad: Hampel filter flags spikes, ignores robust spread") {
    import spark.implicits._
    // group a: tight cluster at 10 ± 1 plus one spike at 1000 —
    // med = 10, MAD = 1, |1000-10| > 3·1 → exactly one outlier.
    // group b: all-identical values → MAD = 0, nothing flagged.
    val df = (Seq(("a", 9.0), ("a", 9.0), ("a", 10.0), ("a", 11.0),
      ("a", 11.0), ("a", 1000.0)) ++ Seq.fill(4)(("b", 7.0))).toDF("g", "v")
    val r = Profile.outliersMad(df, "g", "v").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))).toMap
    assert(r("a") == ((6L, 1L, 10.0, 1.0)))
    assert(r("b") == ((4L, 0L, 7.0, 0.0)))
  }

  test("calibrateScores: per-group empirical CDF, ties share a rank") {
    import spark.implicits._
    val df = Seq(("a", 1L, 0.2), ("a", 2L, 0.4), ("a", 3L, 0.4),
      ("a", 4L, 0.9), ("b", 5L, 100.0)).toDF("src", "id", "q")
    val r = Profile.calibrateScores(df, "src", "id", "q").collect()
      .map(x => x.getLong(1) -> x.getDouble(2)).toMap
    // group a: ranks 1,2,2,4 over n=4 → (rank-1)/(n-1) = 0, 1/3, 1/3, 1
    assert(r(1L) == 0.0 && r(4L) == 1.0)
    assert(r(2L) == r(3L) && math.abs(r(2L) - 1.0 / 3) < 1e-6)
    // singleton group: percent_rank = 0 regardless of magnitude
    assert(r(5L) == 0.0)
  }

  test("truncationReport: exact token accounting per stratum") {
    import spark.implicits._
    val d = Seq(("a", 30L), ("a", 80L), ("a", 50L), ("b", 120L))
      .toDF("s", "ntok")
    val r = Profile.truncationReport(d, "s", org.apache.spark.sql.functions.col("ntok"), 50L)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getDouble(6))).toMap
    // a: 3 docs, one over (80 → 50, loses 30); 160 total, 130 kept
    assert(r("a") == ((3L, 1L, 160L, 130L, 30L, 18.75)))
    // b: one doc fully over: 120 total, 50 kept, 70 lost
    assert(r("b") == ((1L, 1L, 120L, 50L, 70L, 58.333333)))
  }

  test("curriculumBuckets: quantile buckets, ties share, no global window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // scores 1..8 twice → quartile cutpoints are data values; ties (both
    // copies of each score) must land in the same bucket
    val d = ((1 to 8) ++ (1 to 8)).zipWithIndex
      .map { case (s, i) => (i.toLong, s.toDouble) }.toDF("id", "sc")
    val got = Profile.curriculumBuckets(d, "id", "sc", nBuckets = 4)
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    // buckets are monotone in score and cover 1..4
    val byScore = got.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    assert(byScore.values.forall(_.size == 1)) // ties share a bucket
    val ordered = byScore.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered == ordered.sorted && ordered.toSet == Set(1L, 2L, 3L, 4L))
    // scale shape: no single-partition global window in the plan
    val plan = Profile.curriculumBuckets(d, "id", "sc", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("winsorize: clips to order-statistic bounds, exact integer cents") {
    import spark.implicits._
    // 1..10 in one group: the ceil(p·n) ranks land on data values 2 and
    // 8 (rank ceil(0.2·10)=2, ceil(0.8·10)=8); the two tails clip onto
    // them
    val df = ((1 to 10).map(i => ("g", Some(i.toDouble))) :+ (("g", None)))
      .toDF("grp", "v")
    val r = Profile.winsorize(df, "grp", "v", pLo = 0.2, pHi = 0.8).head()
    // the NULL row is excluded entirely — n stays 10 and the clipped sum
    // is NOT inflated by a phantom hi-clip
    assert(r.getLong(1) == 10L)            // n
    assert(r.getLong(2) == 1L && r.getLong(3) == 2L) // 1 below lo=2, 9+10 above hi=8
    assert(r.getLong(4) == 200L)           // lo_cents
    assert(r.getLong(5) == 800L)           // hi_cents
    // clipped sum: 2 + 2..8 + 8 + 8 = 2+35+16 = 53 → 5300 cents, exact
    // digit string
    assert(r.getString(6) == "5300")
  }

  test("curriculumBucketsBy: per-stratum terciles, global cut would differ") {
    import graft.operators.Profile
    // stratum a scores 1-6, stratum b scores 101-106: per-stratum terciles
    // split each language internally; a global cut would put ALL of b in
    // the top bucket
    val df = ((1 to 6).map(i => (i.toLong, "a", i.toDouble)) ++
      (1 to 6).map(i => (100L + i, "b", 100.0 + i)))
      .toDF("id", "lang", "score")
    val r = Profile.curriculumBucketsBy(df, "id", "lang", "score", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) == 1L && r(2L) == 1L)   // a: {1,2}→1, {3,4}→2, {5,6}→3
    assert(r(3L) == 2L && r(4L) == 2L)
    assert(r(5L) == 3L && r(6L) == 3L)
    assert(r(101L) == 1L && r(106L) == 3L) // b buckets internally too
  }

  test("datasetCard: integer metrics on a tiny corpus") {
    import graft.operators.Profile
    val docs = Seq(
      (0L, "the cat sat", "en", "web"),
      (1L, "the cat sat", "en", "web"),   // exact dup of doc 0
      (2L, "une phrase ici quatre", "fr", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val card = Profile.datasetCard(docs, "doc_id", "text", "lang", "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") == 3L)
    assert(card("n_tokens") == 10L)
    assert(card("exact_dup_docs") == 1L)
    assert(card("docs:lang=en") == 2L)
    assert(card("docs:lang=fr") == 1L)
    assert(card("docs:source=books") == 1L)
    assert(card("tokens_p50") == 3L)
  }


  test("datasetCard: empty corpus emits zero-valued totals, no error") {
    import graft.operators.Profile
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val card = Profile.datasetCard(empty, "doc_id", "text", "lang", "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") == 0L && card("quality_mean_micro") == 0L)
    assert(card("n_tokens") == 0L && card("tokens_p50") == 0L)
  }

  test("agreementKappa: hand-computed confusion, perfect, and degenerate") {
    import graft.operators.Profile
    // 2x2 confusion: gold a,a,a,b  pred a,a,b,b
    // N=4, agree=3, rows a=3 b=1, cols a=2 b=2, pe_w=3*2+1*2=8
    // num = 4*3-8 = 4, den = 16-8 = 8 → kappa = 0.5
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("gold", "pred")
    val r = Profile.agreementKappa(df, "gold", "pred").collect()(0)
    assert(r.getAs[Long]("n_rows") == 4L && r.getAs[Long]("agree") == 3L)
    assert(r.getAs[Long]("kappa_num") == 4L &&
      r.getAs[Long]("kappa_den") == 8L)
    assert(r.getAs[Long]("kappa_micro") == 500000L)

    // systematic disagreement → negative kappa, trunc-toward-zero micro:
    // gold a,b  pred b,a: N=2 agree=0 pe_w=1+1=2, num=-2 den=2 → -1
    val neg = Seq(("a", "b"), ("b", "a")).toDF("gold", "pred")
    val rn = Profile.agreementKappa(neg, "gold", "pred").collect()(0)
    assert(rn.getAs[Long]("kappa_micro") == -1000000L)

    // degenerate: single label both sides → den = 0 → convention 1e6
    val one = Seq(("x", "x"), ("x", "x")).toDF("gold", "pred")
    val ro = Profile.agreementKappa(one, "gold", "pred").collect()(0)
    assert(ro.getAs[Long]("kappa_den") == 0L &&
      ro.getAs[Long]("kappa_micro") == 1000000L)
  }

  test("linearFit: exact recovery of an integer-planted plane; singular→0") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.col
    // y = 2 + 3*x1 + 5*x2 exactly → Cramer recovers integers exactly
    val pts = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 1L))
      .map { case (a, b) => (a, b, 2L + 3L * a + 5L * b) }
      .toDF("x1", "x2", "y")
    val got = Profile.linearFit(pts, col("y"), col("x1"), col("x2"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("b0" -> 2000000L, "b1" -> 3000000L, "b2" -> 5000000L))

    // collinear features → singular normal equations → micro 0, den "0"
    val bad = Seq((1L, 2L, 5L), (2L, 4L, 8L), (3L, 6L, 11L))
      .toDF("x1", "x2", "y")
    val sing = Profile.linearFit(bad, col("y"), col("x1"), col("x2"))
      .collect()
    assert(sing.forall(_.getLong(3) == 0L))
    assert(sing.forall(_.getString(2) == "0"))
  }

  test("functionalDependency / inclusionDependency: hand cases incl. nulls") {
    import graft.operators.Profile
    // a->b: det 1 maps to {x}, det 2 to {x, y} (violates), det 3 to
    // {x, NULL} — NULL is a value of its own, so 3 violates too
    val fd = Seq((1L, Some("x")), (1L, Some("x")), (2L, Some("x")),
      (2L, Some("y")), (3L, Some("x")), (3L, None))
      .toDF("a", "b")
    val r = Profile.functionalDependency(fd, "a", "b").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getBoolean(2))
    // a determined column passes
    val ok = Profile.functionalDependency(
      Seq((1L, "x"), (2L, "y"), (1L, "x")).toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(ok.getLong(1) == 0L && !ok.getBoolean(2))

    // FK: child {1,2,9}, parent {1,2,3} → one orphan; NULL child ignored
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(2L), None)
      .toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val fk = Profile.inclusionDependency(child, "k", parent, "p")
      .collect()(0)
    assert(fk.getLong(0) == 3L && fk.getLong(1) == 1L && fk.getBoolean(2))
  }

  test("expectations: exact violation counts per kind, one-pass") {
    import graft.operators.Profile
    val df = Seq(
      (1L, Some("a"), 5.0), (2L, Some("b"), -1.0), (2L, None, 50.0),
      (4L, Some("zz"), 200.0))
      .toDF("id", "s", "v")
    val got = Profile.expectations(df, Seq(
      ("not_null", "s", ""),           // 1 null
      ("unique", "id", ""),            // id 2 twice → 1 violation
      ("min_at_least", "v", "0"),      // -1.0 → 1
      ("max_at_most", "v", "100"),     // 200.0 → 1
      ("accepted_values", "s", "a,b"), // "zz" → 1 (null not counted)
      ("matches_regex", "s", "^[ab]$") // "zz" → 1
    )).collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got(0L) == ((1L, false)) && got(1L) == ((1L, false)))
    assert(got(2L) == ((1L, false)) && got(3L) == ((1L, false)))
    assert(got(4L) == ((1L, false)) && got(5L) == ((1L, false)))
    // a clean corpus passes everything
    val clean = Profile.expectations(
      Seq((1L, "a", 5.0)).toDF("id", "s", "v"),
      Seq(("not_null", "s", ""), ("unique", "id", ""),
        ("min_at_least", "v", "0"))).collect()
    assert(clean.forall(_.getBoolean(4)))
  }

  test("benfordAudit: conforming sample scores low, uniform digits high") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val conforming = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46).zipWithIndex
      .flatMap { case (c, i) => Seq.fill(c)((i + 1).toDouble * 10) }
      .toDF("v")
    val cf = Profile.benfordAudit(conforming, col("v")).collect()
    assert(cf.length == 9)
    val chiConf = cf.head.getDouble(3)
    // sub-1 values are excluded from the digit extraction
    val withSmall = (Seq(0.5, 0.01) ++ Seq.fill(10)(23.0)).toDF("v")
    val ws = Profile.benfordAudit(withSmall, col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ws(2L) == 10L && ws.values.sum == 10L)
    // uniform digits: a strong Benford violation
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(d.toDouble))
      .toDF("v")
    val chiUni = Profile.benfordAudit(uniform, col("v"))
      .collect().head.getDouble(3)
    assert(chiConf < 1.0, s"conforming chi2 $chiConf")
    assert(chiUni > 50.0 && chiUni > 20 * chiConf, s"uniform chi2 $chiUni")
  }

  test("bootstrapMean: constant corpus pins every replicate; weights ~ Poisson(1)") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val const = spark.range(1000).select(col("id"), lit(7L).as("v"))
    val reps = Profile.bootstrapMean(const, "id", col("v"), reps = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(reps.length == 16)
    // constant value → every replicate mean is exactly 7e6
    assert(reps.forall(_._3 == 7000000L))
    // Poisson(1) total weight concentrates near n (±20% at n=1000)
    assert(reps.forall(r => r._2 > 800L && r._2 < 1200L))
    // the hash-derived draws actually differ across replicates
    assert(reps.map(_._2).distinct.length > 8)

    // a 0/1000 half-split corpus: replicate means scatter around 5e8
    // with genuine spread (the error bar is nonzero)
    val half = spark.range(1000).select(col("id"),
      (col("id") % 2 * 1000).as("v"))
    val means = Profile.bootstrapMean(half, "id", col("v"), reps = 16)
      .collect().map(_.getLong(3))
    assert(means.distinct.length > 8)
    assert(means.forall(m => m > 450000000L && m < 550000000L))
  }

  test("conformalPValues: hand-checked ranks, validity bound, no-join shape") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    // calibration scores 10,20,30,40 (ids 2,4,6,8); tests 5,25,40,99
    val rows = Seq((2L, 10L, true), (4L, 20L, true), (6L, 30L, true),
      (8L, 40L, true), (1L, 5L, false), (3L, 25L, false),
      (5L, 40L, false), (7L, 99L, false))
      .toDF("id", "s", "cal")
    val got = Profile.conformalPValues(rows, "id", col("s"), col("cal"),
      bucketWidth = 16L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // ge counts calibration scores >= s; p = (1+ge)*1e6 div 5
    assert(got(1L) == ((4L, 1000000L)))  // 5: all 4 cal >= → p = 1
    assert(got(3L) == ((2L, 600000L)))   // 25: {30,40} → 3/5
    assert(got(5L) == ((1L, 400000L)))   // 40: ties count (>= includes 40)
    assert(got(7L) == ((0L, 200000L)))   // 99: none → the min p = 1/(n+1)
  }

  test("kAnonymity: group sizes, l-diversity, violation flags") {
    import graft.operators.Profile
    val rows = Seq(
      // (nation, segment, sensitive): group (1,"A") has 3 rows, 2 distinct
      (1, "A", 10L), (1, "A", 10L), (1, "A", 20L),
      // group (2,"B") has 1 row, 1 distinct → violates both k=2 and l=2
      (2, "B", 30L))
      .toDF("nat", "seg", "s")
    val got = Profile.kAnonymity(rows, Seq("nat", "seg"), "s", k = 2L, l = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got((1, "A")) == ((3L, 2L, false, false)))
    assert(got((2, "B")) == ((1L, 1L, true, true)))
  }

  test("skyline: exact Pareto front, duplicates kept, dominated dropped") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.col
    // front: (1,9), (5,5), (9,1); dominated: (1,5) by (1,9)&(5,5),
    // (4,4) by (5,5); duplicate frontier point (5,5) kept twice
    val df = Seq((1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L), (4L, 1L, 5L),
      (5L, 4L, 4L), (6L, 5L, 5L)).toDF("id", "x", "y")
    val got = Profile.skyline(df, "id", col("x"), col("y"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("skyline: cross-bucket domination and null exclusion") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.col
    // x values straddle the 1024 bucket edge: (2000, 3) dominates (10, 2)
    // across buckets; a null coordinate row is excluded, not crashed on
    val df = Seq((1L, Some(2000L), Some(3L)), (2L, Some(10L), Some(2L)),
      (3L, Some(10L), None), (4L, Some(5L), Some(9L)))
      .toDF("id", "x", "y")
    val got = Profile.skyline(df, "id", col("x"), col("y"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 4L))
  }

  test("lorenzShares: whole-group prefixes, exact micro shares") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.col
    // weights 100, 10, 10, 1 (n=4, total=121). Desc groups: {100}, {10,10},
    // {1}. p=25 → first group (1 doc = 25%): share 100/121.
    // p=50 → needs 2 docs → through the tied 10s = 3 docs, share 120/121.
    val df = Seq(100L, 10L, 10L, 1L).toDF("w")
    val got = Profile.lorenzShares(df, col("w"), levels = Seq(25, 50, 100))
      .collect().map(r => r.getAs[Long]("p") ->
        (r.getAs[Long]("docs_thru"), r.getAs[Long]("docfrac_micro"),
          r.getAs[Long]("share_micro"))).toMap
    assert(got(25L) == ((1L, 250000L, 826446L)))   // 100/121
    assert(got(50L) == ((3L, 750000L, 991735L)))   // 120/121
    assert(got(100L) == ((4L, 1000000L, 1000000L)))
  }

  test("lorenzShares: null weights are excluded, not zero-counted") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(10L), None, Some(30L)).toDF("w")
    val got = Profile.lorenzShares(df, col("w"), levels = Seq(50))
      .collect()(0)
    assert(got.getAs[Long]("docs_thru") == 1L)      // of n=2, 1 doc = 50%
    assert(got.getAs[Long]("share_micro") == 750000L) // 30/40
  }

  test("dpNoisyCounts: seeded noise is deterministic, scaled by 1/eps, " +
      "floored at zero") {
    import org.apache.spark.sql.functions.col
    val df = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ Seq("c"))
      .toDF("g")
    def run(eps: Long) = Profile.dpNoisyCounts(df, "g", eps)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val r1 = run(500000L)
    // deterministic: same seed, same release
    assert(run(500000L) == r1)
    // noise actually moved the counts (Lap(2) at micro resolution is
    // never exactly 0 on an md5 uniform)
    assert(r1("a") != 100000000L && r1("b") != 50000000L)
    // Lap(1/eps=2) noise: |noise| < 40 micro-units of 2e6 with
    // overwhelming margin — sanity-band the release
    assert(math.abs(r1("a") - 100000000L) < 40000000L, s"a: ${r1("a")}")
    // floor at zero: a count of 1 with eps tiny (huge noise scale) can go
    // negative pre-floor — the release must clamp, not publish < 0
    val tiny = run(1L)
    assert(tiny.values.forall(_ >= 0L))
    // larger eps → smaller noise: eps=10 release is closer to exact
    val sharp = run(10000000L)
    assert(math.abs(sharp("a") - 100000000L)
      < math.abs(r1("a") - 100000000L))
  }

  test("tCloseness: hand TV distances, absent values count, NULLs drop") {
    // global {a:4, b:4}; g1 {a:3, b:1} and g2 {a:1, b:3} are both TV=1/4
    val rows = (Seq.fill(3)(("g1", "a")) ++ Seq(("g1", "b")) ++
      Seq(("g2", "a")) ++ Seq.fill(3)(("g2", "b"))).toDF("grp", "s")
    val got = Profile.tCloseness(rows, Seq("grp"), "s", tMicro = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("g1") == ((4L, 250000L, true)))
    assert(got("g2") == ((4L, 250000L, true)))
    // a value ABSENT from a group still contributes its global mass:
    // global {a:4, b:2}, g3 = {a:2} -> TV = 1/3
    val rows2 = (Seq(("g3", "a"), ("g3", "a"), ("g4", "a"), ("g4", "a"),
      ("g4", "b"), ("g4", "b"))).toDF("grp", "s")
    val g3 = Profile.tCloseness(rows2, Seq("grp"), "s", tMicro = 500000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g3("g3") == 333333L)
    // g4 {a:2,b:2} vs global {a:4,b:2}: Σ|n·N−p·Ng| = 4+4, /(2·4·6) = 1/6
    assert(g3("g4") == 166666L)
    // NULL sensitive rows join neither distribution
    val withNull = rows.unionByName(
      Seq(("g1", null.asInstanceOf[String])).toDF("grp", "s"))
    val gn = Profile.tCloseness(withNull, Seq("grp"), "s", 200000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gn("g1") == 4L) // the null row did not inflate the group size
  }
}
