package graft

import graft.operators.Eval
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---- rocAuc ----------------------------------------------------------

  test("rocAuc: separable scores give AUC 1, anti-separable give 0") {
    val perfect = Seq((1L, true), (2L, true), (0L, false))
      .toDF("s", "y")
    val r = Eval.rocAuc(perfect, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("auc_micro") == 1000000L)
    assert(r.getAs[Long]("gini_micro") == 1000000L)
    val inverted = Eval.rocAuc(perfect, -col("s"), col("y")).collect()(0)
    assert(inverted.getAs[Long]("auc_micro") == 0L)
    assert(inverted.getAs[Long]("gini_micro") == -1000000L)
  }

  test("rocAuc: ties take half credit (all-equal scores = 0.5)") {
    val flat = Seq((7L, true), (7L, false), (7L, true), (7L, false))
      .toDF("s", "y")
    val r = Eval.rocAuc(flat, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("auc_micro") == 500000L)
    assert(r.getAs[Long]("gini_micro") == 0L)
  }

  test("rocAuc: hand case with a tie — pairs (win,tie,loss)=(3,1,0) of 4") {
    // pos scores {3, 2}, neg scores {2, 1}: wins 3 (3>2, 3>1, 2>1),
    // tie 1 (2=2) → U = 3.5 of 4 → AUC = 0.875
    val df = Seq((3L, true), (2L, true), (2L, false), (1L, false))
      .toDF("s", "y")
    val r = Eval.rocAuc(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("auc_micro") == 875000L)
  }

  test("rocAuc: single-class input reports 0 without dividing by zero") {
    val df = Seq((1L, true), (2L, true)).toDF("s", "y")
    val r = Eval.rocAuc(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("n_neg") == 0L && r.getAs[Long]("auc_micro") == 0L)
  }

  test("rocAuc/spearman: null scores are excluded, null labels count negative") {
    val df = Seq((Some(3L), true), (None, true), (Some(1L), false))
      .toDF("s", "y")
    val r = Eval.rocAuc(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("auc_micro") == 1000000L)
    val sp = Seq((Some(1L), Some(10L)), (None, Some(20L)), (Some(3L), None),
      (Some(2L), Some(20L))).toDF("x", "y")
    assert(Eval.spearman(sp, col("x"), col("y")).collect()(0)
      .getAs[Long]("n") == 2L)
  }

  test("rocAuc: values spanning bucket boundaries match the flat formula") {
    // scores 0..4999 step 1 across many 1024-buckets; label = s >= 2500
    val df = spark.range(5000).select(col("id").as("s"),
      (col("id") >= 2500).as("y"))
    val r = Eval.rocAuc(df, col("s"), col("y")).collect()(0)
    assert(r.getAs[Long]("auc_micro") == 1000000L) // perfectly separable
  }

  test("rocAucBy: per-group AUC isolates an inverted subgroup") {
    // group A: score predicts label perfectly; group B: perfectly inverted
    val df = Seq(("A", 2L, true), ("A", 1L, false),
      ("B", 1L, true), ("B", 2L, false)).toDF("g", "s", "y")
    val got = Eval.rocAucBy(df, "g", col("s"), col("y")).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("auc_micro")).toMap
    assert(got("A") == 1000000L && got("B") == 0L)
    // pooled over the same rows: the inversion cancels to 0.5
    assert(Eval.rocAuc(df, col("s"), col("y")).collect()(0)
      .getAs[Long]("auc_micro") == 500000L)
  }

  test("rocAucBy: a single-class group reports 0, others unaffected") {
    val df = Seq(("A", 2L, true), ("A", 1L, false), ("C", 5L, true))
      .toDF("g", "s", "y")
    val got = Eval.rocAucBy(df, "g", col("s"), col("y")).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("auc_micro")).toMap
    assert(got("A") == 1000000L && got("C") == 0L)
  }

  // ---- spearman --------------------------------------------------------

  test("spearman: exact monotone relation gives rho 1, reversed gives -1") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    assert(Eval.spearman(up, col("x"), col("y"))
      .collect()(0).getAs[Double]("rho6") == 1.0)
    assert(Eval.spearman(up, col("x"), -col("y"))
      .collect()(0).getAs[Double]("rho6") == -1.0)
  }

  test("spearman: ties get average ranks (hand-checked value)") {
    // x: 1,2,2,3 → ranks 1, 2.5, 2.5, 4; y: 10,20,30,30 → ranks 1,2,3.5,3.5
    // doubled ranks pair rows as a=(2,5,5,8), b=(2,4,7,7):
    // n=4 sa=20 sb=20 sab=4+20+35+56=115 saa=118 sbb=118
    // num=4*115-400=60, d1=4*118-400=72, d2=72 → rho=60/72=0.833333
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 30L)).toDF("x", "y")
    assert(Eval.spearman(df, col("x"), col("y"))
      .collect()(0).getAs[Double]("rho6") == 0.833333)
  }

  test("spearman: constant column reports 0 (zero variance), not NaN") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(Eval.spearman(df, col("x"), col("y"))
      .collect()(0).getAs[Double]("rho6") == 0.0)
  }

  // ---- decisionStump ---------------------------------------------------

  test("decisionStump: finds the clean threshold with zero impurity") {
    // feature <= 10 all positive, > 10 all negative → perfect stump at 10
    val df = Seq((5L, true), (10L, true), (11L, false), (20L, false))
      .toDF("v", "y")
    val r = Eval.decisionStump(df, col("v"), col("y")).collect()(0)
    assert(r.getAs[Long]("threshold") == 10L)
    assert(r.getAs[Long]("giniw_micro") == 0L)
    assert((r.getAs[Long]("nl"), r.getAs[Long]("pl")) == ((2L, 2L)))
    assert((r.getAs[Long]("nr"), r.getAs[Long]("pr")) == ((2L, 0L)))
    // root: p=2 n=4 → 2e6·2·2/4/4 = 500000
    assert(r.getAs[Long]("root_gini_micro") == 500000L)
  }

  test("decisionStump: tie on impurity breaks to the smaller threshold") {
    // y constant → every split has impurity 0; the v-minimum must win
    val df = Seq((1L, true), (2L, true), (3L, true)).toDF("v", "y")
    val r = Eval.decisionStump(df, col("v"), col("y")).collect()(0)
    assert(r.getAs[Long]("threshold") == 1L)
    assert(r.getAs[Long]("giniw_micro") == 0L)
  }

  test("decisionStump: the all-left degenerate split never wins") {
    val df = Seq((1L, true), (2L, false)).toDF("v", "y")
    val r = Eval.decisionStump(df, col("v"), col("y")).collect()(0)
    assert(r.getAs[Long]("threshold") == 1L) // v=2 (nl=n) excluded
  }

  test("rocAuc invariance: any strictly monotone score transform is a no-op") {
    // AUC is rank-only — affine and nonlinear monotone rescalings must
    // reproduce the SAME micro value (the property that makes rank metrics
    // robust where Brier is not)
    val df = spark.range(200).select(
      ((col("id") * 37) % 101).as("s"),
      ((col("id") % 3) === 0).as("y"))
    val base = Eval.rocAuc(df, col("s"), col("y")).collect()(0)
      .getAs[Long]("auc_micro")
    assert(Eval.rocAuc(df, col("s") * 1000 + 7, col("y")).collect()(0)
      .getAs[Long]("auc_micro") == base)
    assert(Eval.rocAuc(df, col("s") * col("s") * 3, col("y")).collect()(0)
      .getAs[Long]("auc_micro") == base) // s >= 0 → s² monotone
  }

  test("spearman invariance: monotone transforms preserve rho exactly") {
    val df = spark.range(100).select(
      ((col("id") * 13) % 97).as("x"),
      ((col("id") * 29) % 89).as("y"))
    val base = Eval.spearman(df, col("x"), col("y")).collect()(0)
      .getAs[Double]("rho6")
    assert(Eval.spearman(df, col("x") * 500 + 3, col("y")).collect()(0)
      .getAs[Double]("rho6") == base)
    assert(Eval.spearman(df, col("x"), col("y") * col("y")).collect()(0)
      .getAs[Double]("rho6") == base)
  }

  // ---- brierDecomposition ---------------------------------------------

  test("brier: perfect confident forecasts score 0 everywhere but UNC=RES") {
    // p=1e6 for all positives, 0 for all negatives → BS=0, REL=0,
    // RES=UNC=ō(1−ō)=0.25
    val df = Seq((1000000L, true), (1000000L, true), (0L, false),
      (0L, false)).toDF("p", "y")
    val r = Eval.brierDecomposition(df, col("p"), col("y")).collect()(0)
    assert(r.getAs[Long]("brier_micro") == 0L)
    assert(r.getAs[Long]("rel_micro") == 0L)
    assert(r.getAs[Long]("res_micro") == 250000L)
    assert(r.getAs[Long]("unc_micro") == 250000L)
  }

  test("brier: base-rate forecast has zero resolution, REL by miscalibration") {
    // constant p=0.5 on a 50% base rate: perfectly calibrated (REL=0),
    // zero resolution, BS = UNC = 0.25
    val df = Seq((500000L, true), (500000L, false)).toDF("p", "y")
    val r = Eval.brierDecomposition(df, col("p"), col("y")).collect()(0)
    assert(r.getAs[Long]("brier_micro") == 250000L)
    assert(r.getAs[Long]("rel_micro") == 0L)
    assert(r.getAs[Long]("res_micro") == 0L)
    assert(r.getAs[Long]("unc_micro") == 250000L)
    assert(r.getAs[Long]("n_bins") == 1L)
  }

  test("brier: miscalibrated constant forecast shows up in REL exactly") {
    // p=0.9 everywhere, base rate 0.5: REL=(0.9−0.5)²=0.16,
    // BS=(0.4²+0.9²)/2... per-row: pos (0.1)²=0.01, neg (0.9)²=0.81 →
    // BS=0.41 = REL − RES + UNC = 160000 − 0 + 250000 = 410000
    val df = Seq((900000L, true), (900000L, false)).toDF("p", "y")
    val r = Eval.brierDecomposition(df, col("p"), col("y")).collect()(0)
    assert(r.getAs[Long]("brier_micro") == 410000L)
    assert(r.getAs[Long]("rel_micro") == 160000L)
    assert(r.getAs[Long]("res_micro") == 0L)
    assert(r.getAs[Long]("unc_micro") == 250000L)
  }

  // ---- rrfFuse ---------------------------------------------------------

  test("rrfFuse: agreement keeps order; k damping and micro units exact") {
    val df = Seq(("q1", "a", 3.0, 30.0), ("q1", "b", 2.0, 20.0),
      ("q1", "c", 1.0, 10.0)).toDF("q", "item", "sa", "sb")
    val got = Eval.rrfFuse(df, "q", "item", col("sa"), col("sb"), k = 60,
      topN = 10).collect().map(r => (r.getAs[String]("item"),
      r.getAs[Long]("rrf_micro"), r.getAs[Long]("fused_rank")))
    // rank 1 both: 2·(1e6 div 61) = 2·16393 = 32786
    assert(got.toSeq.sortBy(_._3) == Seq(("a", 32786L, 1L),
      ("b", 32258L, 2L), ("c", 31746L, 3L)))
  }

  test("rrfFuse: disagreement fuses mid-ranks above split extremes") {
    // a: 1st by A, 3rd by B; b: 2nd/2nd; c: 3rd/1st →
    // a,c: 1e6div61+1e6div63=16393+15873=32266; b: 2·16129=32258 — the
    // consistent middle loses to either extreme pair here, and the a/c tie
    // breaks on item asc
    val df = Seq(("q1", "a", 3.0, 10.0), ("q1", "b", 2.0, 20.0),
      ("q1", "c", 1.0, 30.0)).toDF("q", "item", "sa", "sb")
    val got = Eval.rrfFuse(df, "q", "item", col("sa"), col("sb"))
      .collect().map(r => (r.getAs[String]("item"),
        r.getAs[Long]("fused_rank"))).toSeq.sortBy(_._2)
    assert(got == Seq(("a", 1L), ("c", 2L), ("b", 3L)))
  }

  test("rrfFuse: queries rank independently and topN truncates per query") {
    val df = (1 to 5).map(i => ("q1", s"i$i", i.toDouble, i.toDouble)) ++
      Seq(("q2", "z", 1.0, 1.0))
    val got = Eval.rrfFuse(df.toDF("q", "item", "sa", "sb"), "q", "item",
      col("sa"), col("sb"), k = 60, topN = 2)
    assert(got.where(col("q") === "q1").count() == 2)
    assert(got.where(col("q") === "q2").collect()(0)
      .getAs[Long]("fused_rank") == 1L)
  }

  // ---- needleEval ------------------------------------------------------

  test("needleEval: a verbatim needle retrieves its source doc at rank 1") {
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, words), (2L, other), (3L, (1 to 60)
      .map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val got = Eval.needleEval(df, "doc_id", "text", lit(true),
      skip = 8, take = 24, window = 32, stride = 24, dim = 32, k = 3)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("hits_in_topk"), r.getAs[Long]("first_rank"),
          r.getAs[Long]("mrr_micro"))).toMap
    assert(got.keySet == Set(1000001L, 1000002L, 1000003L))
    got.values.foreach { case (hits, first, mrr) =>
      assert(hits >= 1L && first == 1L && mrr == 1000000L)
    }
  }

  test("needleEval: short docs are excluded as probes, not zero-padded") {
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words), (2L, "too short")).toDF("doc_id", "text")
    val got = Eval.needleEval(df, "doc_id", "text", lit(true),
      skip = 8, take = 24, window = 32, stride = 24, dim = 32, k = 3)
    assert(got.collect().map(_.getAs[Long]("probe_id")).toSet
      == Set(1000001L))
  }

  test("needleEval: a miss reports first_rank 0 and mrr 0") {
    // needle from doc 1 but doc 1's text is swapped out of the corpus via
    // an id the probe can't match: probe for doc 4 built from unique words
    // not present in other docs still finds ITS source; to force a miss,
    // k=1 with a decoy doc sharing the needle words exactly (lower doc id
    // wins the tie-break? no — identical chunk scores tie-break on doc, so
    // the decoy (doc 0) outranks the true source (doc 5))
    val needleWords = (1 to 60).map(i => s"n$i").mkString(" ")
    val df = Seq((0L, needleWords), (5L, needleWords)).toDF("doc_id", "text")
    val got = Eval.needleEval(df, "doc_id", "text", col("doc_id") === 5,
      skip = 8, take = 24, window = 32, stride = 24, dim = 32, k = 1)
      .collect()(0)
    assert(got.getAs[Long]("probe_id") == 1000005L)
    assert(got.getAs[Long]("hits_in_topk") == 0L)
    assert(got.getAs[Long]("first_rank") == 0L)
    assert(got.getAs[Long]("mrr_micro") == 0L)
  }

  test("averagePrecision: hand-computed ranks incl. tie block, " +
      "degenerate contracts") {
    // desc order (score, id asc): (90,y1) r1, (80,y0) r2, (70,id3,y1) r3,
    // (70,id4,y0) r4, (60,y1) r5 → terms 1e6 + 666666 + 600000,
    // ap = 2266666 div 3 = 755555
    val df = Seq((1L, 90L, true), (2L, 80L, false), (3L, 70L, true),
      (4L, 70L, false), (5L, 60L, true)).toDF("id", "s", "y")
    val got = Eval.averagePrecision(df, "id", col("s"), col("y"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((3L, 5L, 755555L)))
    // tie order matters for AP and is pinned by id: flip the tie block's
    // labels and the positive lands at rank 4 → 2/4 term
    val flipped = Seq((1L, 90L, true), (2L, 80L, false), (3L, 70L, false),
      (4L, 70L, true), (5L, 60L, true)).toDF("id", "s", "y")
    val g2 = Eval.averagePrecision(flipped, "id", col("s"), col("y"))
      .collect().head
    assert(g2.getLong(2) == (1000000L + 500000L + 600000L) / 3)
    // no positives → ap 0 with counts visible; empty input → all zero
    val nopos = Seq((1L, 10L, false)).toDF("id", "s", "y")
    val g3 = Eval.averagePrecision(nopos, "id", col("s"), col("y"))
      .collect().head
    assert((g3.getLong(0), g3.getLong(1), g3.getLong(2)) == ((0L, 1L, 0L)))
    val g4 = Eval.averagePrecision(
      Seq.empty[(Long, Long, Boolean)].toDF("id", "s", "y"),
      "id", col("s"), col("y")).collect().head
    assert((g4.getLong(0), g4.getLong(1), g4.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("calibrationCurve: hand-computed bins, gaps, and weighted ECE") {
    // bins = 2 (w = 500000):
    //   bin 0: p ∈ {100000, 300000}, y ∈ {0, 1} → mean_p = 200000,
    //          rate = 500000, gap = 300000
    //   bin 1: p ∈ {800000, 900000, 900000}, y ∈ {1, 1, 0} →
    //          mean_p = 2600000/3 = 866666, rate = 2000000/3 = 666666,
    //          gap = 200000
    //   ece = (2·300000 + 3·200000) div 5 = 240000
    val df = Seq((100000L, false), (300000L, true), (800000L, true),
      (900000L, true), (900000L, false)).toDF("p", "y")
    val got = Eval.calibrationCurve(df, col("p"), col("y"), bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 2L, 200000L, 500000L, 300000L, 240000L),
      (1L, 3L, 866666L, 666666L, 200000L, 240000L)))
    // a perfectly calibrated corpus has zero gaps and zero ECE
    val perfect = Seq((0L, false), (1000000L, true)).toDF("p", "y")
    val p = Eval.calibrationCurve(perfect, col("p"), col("y"), bins = 2)
      .collect().map(r => (r.getLong(4), r.getLong(5)))
    assert(p.forall(_ == ((0L, 0L))))
    // empty input: no rows, no division crash
    assert(Eval.calibrationCurve(
      Seq.empty[(Long, Boolean)].toDF("p", "y"), col("p"), col("y"))
      .collect().isEmpty)
  }

  test("new eval operators: empty inputs yield empty frames, no crashes") {
    val empty = Seq.empty[(Long, Boolean)].toDF("s", "y")
    assert(Eval.prCurve(empty, col("s"), col("y")).collect().isEmpty)
    val emptyG = Seq.empty[(String, Long, Long, Long)]
      .toDF("g0", "id", "r", "sc")
    assert(Eval.ndcgAtK(emptyG, "g0", "id", col("r"), col("sc"), k = 3)
      .collect().isEmpty)
    val emptyC = Seq.empty[(String, String)].toDF("gold", "pred")
    assert(Eval.classificationReport(emptyC, "gold", "pred")
      .collect().isEmpty)
  }

  test("prCurve: hand-computed operating points at every distinct score") {
    val df = Seq((30L, true), (20L, false), (10L, true)).toDF("s", "y")
    val got = Eval.prCurve(df, col("s"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // threshold 30: tp=1 fp=0; 20: tp=1 fp=1; 10: tp=2 fp=1
    assert(got(30L) == ((1L, 0L, 1000000L, 500000L, 0L)))
    assert(got(20L) == ((1L, 1L, 500000L, 500000L, 1000000L)))
    assert(got(10L) == ((2L, 1L, 666666L, 1000000L, 1000000L)))
    assert(got.size == 3)
    // degenerate corpora: all-positive has fpr pinned 0, all-negative
    // has precision/recall pinned 0 — no division blows up
    val allPos = Eval.prCurve(Seq((5L, true)).toDF("s", "y"),
      col("s"), col("y")).collect()(0)
    assert(allPos.getLong(3) == 1000000L && allPos.getLong(5) == 0L)
    val allNeg = Eval.prCurve(Seq((5L, false)).toDF("s", "y"),
      col("s"), col("y")).collect()(0)
    assert(allNeg.getLong(3) == 0L && allNeg.getLong(4) == 0L)
  }

  test("classificationReport: hand-computed per-class P/R/F1, edge classes") {
    // gold: a,a,a,b,b,c ; pred: a,a,b,b,c,d
    // a: tp=2 n_gold=3 n_pred=2 -> p=1e6, r=666666, f1=2e6*2/5=800000
    // b: tp=1 n_gold=2 n_pred=2 -> p=500000, r=500000, f1=500000
    // c: tp=0 n_gold=1 n_pred=1 -> all 0
    // d: pred-only -> n_gold=0, p=0 (tp=0), r=0, f1=0
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "c"), ("c", "d")).toDF("gold", "pred")
    val out = Eval.classificationReport(df, "gold", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out("a") == ((3L, 2L, 2L, 1000000L, 666666L, 800000L)))
    assert(out("b") == ((2L, 2L, 1L, 500000L, 500000L, 500000L)))
    assert(out("c") == ((1L, 1L, 0L, 0L, 0L, 0L)))
    assert(out("d") == ((0L, 1L, 0L, 0L, 0L, 0L)))
    assert(out.size == 4)
  }

  test("ndcgAtK: perfect ranking pins 1e6; inversion, beyond-k, zero idcg") {
    val w = Eval.ndcgWeights(3)
    assert(w == Seq(1000000L, 630930L, 500000L)) // 1e6 / log2(i+1), pinned
    // group q ranks exactly ideal; group z has all-zero relevance
    val df = Seq(("q", 1L, 3L, 30L), ("q", 2L, 2L, 20L), ("q", 3L, 1L, 10L),
      ("z", 1L, 0L, 5L), ("z", 2L, 0L, 1L)).toDF("g0", "id", "r", "sc")
    val out = Eval.ndcgAtK(df, "g0", "id", col("r"), col("sc"), k = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ideal = 3 * w(0) + 2 * w(1) + 1 * w(2)
    assert(out("q") == ((ideal, ideal, 1000000L)))
    assert(out("z") == ((0L, 0L, 0L)))
    // inverted ranking: worst item first
    val inv = Seq(("q", 1L, 3L, 10L), ("q", 2L, 2L, 20L), ("q", 3L, 1L, 30L))
      .toDF("g0", "id", "r", "sc")
    val got = Eval.ndcgAtK(inv, "g0", "id", col("r"), col("sc"), k = 3)
      .collect()(0)
    val dcg = 1 * w(0) + 2 * w(1) + 3 * w(2)
    assert(got.getLong(1) == dcg)
    assert(got.getLong(3) == dcg * 1000000L / ideal)
    // beyond-k items contribute to NEITHER sum (rank 4 cut from both)
    val four = Seq(("q", 1L, 3L, 40L), ("q", 2L, 2L, 30L), ("q", 3L, 1L, 20L),
      ("q", 4L, 9L, 10L)).toDF("g0", "id", "r", "sc")
    val g4 = Eval.ndcgAtK(four, "g0", "id", col("r"), col("sc"), k = 3)
      .collect()(0)
    // ideal order is rel desc: 9,3,2 -> idcg = 9w1+3w2+2w3; real order by
    // score: 3,2,1 -> dcg = 3w1+2w2+1w3
    assert(g4.getLong(1) == 3 * w(0) + 2 * w(1) + 1 * w(2))
    assert(g4.getLong(2) == 9 * w(0) + 3 * w(1) + 2 * w(2))
  }

  test("isotonicCalibrate: hand PAV pooling, monotone output, " +
      "monotone input unchanged") {
    // bucket means 0/2, 2/2, 1/2, 2/2 -> PAV pools buckets 2-3 to 3/4
    val rows = Seq((1L, 0), (1L, 0), (2L, 1), (2L, 1), (3L, 1), (3L, 0),
      (4L, 1), (4L, 1)).toDF("score", "y")
    val got = Eval.isotonicCalibrate(rows, col("score"), col("y") === 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((1000000L, 750000L)))
    assert(got(3L) == ((500000L, 750000L)))
    assert(got(4L) == ((1000000L, 1000000L)))
    // already-monotone input comes back untouched
    val mono = Seq((1L, 0), (1L, 0), (2L, 1), (2L, 0), (3L, 1), (3L, 1))
      .toDF("score", "y")
    val g2 = Eval.isotonicCalibrate(mono, col("score"), col("y") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(g2.forall(r => r._2 == r._3))
    // real data: calibrated output is non-decreasing in bucket
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val iso = Eval.isotonicCalibrate(ev,
        round(col("value") * 100, 0).cast("long"),
        col("event_type") === "purchase", bucketWidth = 500L)
      .orderBy(col("bucket"))
      .collect().map(_.getLong(3))
    assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("bradleyTerry: dominance order, symmetry, zero-win floor") {
    // transitive dominance A > B > C: 3-0, 3-0, 3-0
    val games = (Seq.fill(3)(("A", "B")) ++ Seq.fill(3)(("B", "C")) ++
      Seq.fill(3)(("A", "C"))).toDF("winner", "loser")
    val fit = Eval.bradleyTerry(games, "winner", "loser")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(fit("A")._2 == 1L && fit("B")._2 == 2L && fit("C")._2 == 3L)
    assert(fit("A")._1 > fit("B")._1 && fit("B")._1 > fit("C")._1)
    // C never won: MM sends it to the documented 1-micro-unit floor's
    // neighborhood, far below the mean strength
    assert(fit("C")._1 < Eval.BtScale / 10)
    // perfectly symmetric record -> equal strengths, rank = name order
    val even = Seq(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"))
      .toDF("winner", "loser")
    val ev = Eval.bradleyTerry(even, "winner", "loser")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(ev("A")._1 == ev("C")._1)
    assert(ev.values.map(_._2).toSeq.sorted == Seq(1L, 2L, 3L))
  }

  test("bradleyTerry: strength ratio tracks observed win rate") {
    // A beats B 3 of 4 times: BT MLE satisfies pA/(pA+pB) = 3/4, so
    // pA/pB -> 3 (two-item case converges in a few MM rounds)
    val games = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val fit = Eval.bradleyTerry(games, "winner", "loser", iters = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratio = fit("A").toDouble / fit("B")
    assert(math.abs(ratio - 3.0) < 0.05, s"pA/pB = $ratio")
  }

  test("bradleyTerry: partition-layout invariant; self-games and empty " +
      "input handled") {
    val games = (Seq.fill(5)(("A", "B")) ++ Seq.fill(2)(("B", "C")) ++
      Seq(("C", "A"), ("A", "A"))).toDF("winner", "loser")
    val a = Eval.bradleyTerry(games, "winner", "loser")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val b = Eval.bradleyTerry(games.repartition(7), "winner", "loser")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq) // self-game (A,A) dropped, fit bit-stable
    assert(Eval.bradleyTerry(games.limit(0), "winner", "loser")
      .count() == 0L)
  }

  test("bradleyTerry: a corpus-sized item domain fails fast, not OOM") {
    // strengths are driver-side state with a documented ~1e6-item carrier
    // bound — a caller passing raw document ids must get an error message
    // before the collect, not a driver OOM. The probe is limit-capped so
    // the check itself stays model-sized.
    val big = spark.range(Eval.MaxBtItems.toLong + 1).select(
      concat(lit("w"), col("id")).as("winner"),
      concat(lit("l"), col("id")).as("loser"))
    val e = intercept[IllegalArgumentException] {
      Eval.bradleyTerry(big, "winner", "loser", iters = 1)
    }
    assert(e.getMessage.contains("distinct items"))
  }

  test("bradleyTerry oracle SQL carries the same zero-denominator floor " +
      "as the Spark side") {
    // near the carrier bound every per-edge term can truncate to 0 and
    // denom(item) = 0: Spark clamps with max(denom, 1) and the oracle must
    // apply the identical greatest(denom, 1) so neither engine throws or
    // NULLs where the other floors
    val sql = Eval.bradleyTerryOracleSql(
      "games AS (SELECT 'a' AS w, 'b' AS l)", iters = 2)
    assert(sql.contains("greatest(d.denom, 1)"))
  }
}
