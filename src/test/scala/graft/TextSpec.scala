package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect()(0).get(0) match {
      case s: scala.collection.Seq[_] => s.toSeq
      case other => other
    }

  test("tokens: whitespace split, lowercased, empty-safe") {
    assert(one("Hello  World", TextAnalysis.tokens(col("text")))
      .asInstanceOf[Seq[String]] == Seq("hello", "world"))
    assert(one("", TextAnalysis.tokens(col("text"))).asInstanceOf[Seq[String]].isEmpty)
    assert(one("   ", TextAnalysis.tokens(col("text"))).asInstanceOf[Seq[String]].isEmpty)
  }

  test("wordNgrams: 2-grams, short-doc guard") {
    val toks = TextAnalysis.tokens(col("text"))
    assert(one("a b c", TextAnalysis.wordNgrams(toks, 2))
      .asInstanceOf[Seq[String]] == Seq("a b", "b c"))
    assert(one("a", TextAnalysis.wordNgrams(toks, 2)).asInstanceOf[Seq[String]].isEmpty)
  }

  test("charNgrams: trigram window, short-text guard") {
    assert(one("abcde", graft.operators.TextAnalysis.charNgrams(col("text"), 3))
      .asInstanceOf[Seq[String]] == Seq("abc", "bcd", "cde"))
    assert(one("ab", graft.operators.TextAnalysis.charNgrams(col("text"), 3))
      .asInstanceOf[Seq[String]].isEmpty)
  }

  test("subwordCount: BPE-ish pre-tokenization") {
    // "don't stop123" → don | ' | t | stop | 123 = 5
    assert(one("don't stop123", TextAnalysis.subwordCount(col("text"))) == 5)
  }

  test("punctRatio and stopwordRatio bounds") {
    val pr = one("a,b.c!", TextAnalysis.punctRatio(col("text"))).asInstanceOf[Double]
    assert(pr == 3.0 / 6.0)
    val sr = one("the cat and the dog",
      TextAnalysis.stopwordRatio(TextAnalysis.tokens(col("text")))).asInstanceOf[Double]
    assert(sr == 3.0 / 5.0)
  }

  test("qualityScore in [0,1]") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .where(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }

  test("fingerprint: case/punct/whitespace-insensitive") {
    val fp1 = one("Hello,   World!", TextAnalysis.fingerprint(col("text")))
    val fp2 = one("hello world", TextAnalysis.fingerprint(col("text")))
    val fp3 = one("hello mars", TextAnalysis.fingerprint(col("text")))
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }

  test("chunk: sliding windows with overlap, short-doc single chunk") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.chunk(df, "doc_id", "text", window = 4, stride = 3)
      .orderBy("doc", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // 10 tokens, size 4, stride 3 → chunks at 0,3,6 cover to 10: (10-4+2)/3+1 = 3... tail at 9
    assert(got.count(_._1 == 1L) == 3)
    assert(got(0) == (1L, 0L, "t1 t2 t3 t4", 4L))
    assert(got(1) == (1L, 1L, "t4 t5 t6 t7", 4L))
    assert(got(2) == (1L, 2L, "t7 t8 t9 t10", 4L))
    assert(got(3) == (2L, 0L, "a b", 2L))
  }

  test("tokenEntropy: uniform/degenerate/mixed distributions") {
    val df = Seq(
      (1L, "a a a a"),     // single symbol → 0 bits
      (2L, "a b"),         // two uniform  → 1 bit
      (3L, "a b c d"),     // four uniform → 2 bits
      (4L, "a a b"),       // 2/3,1/3      → ~0.918296
      (5L, "")             // no tokens    → no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == 0.0 && got(2L) == 1.0 && got(3L) == 2.0)
    assert(math.abs(got(4L) - 0.918296) < 1e-6)
  }

  test("langId: marker words and CJK routing") {
    assert(one("the cat is on the mat and it was good",
      TextAnalysis.langId(col("text"))) == "en")
    assert(one("el perro y la casa de los gatos",
      TextAnalysis.langId(col("text"))) == "es")
    assert(one("der hund ist nicht mit der katze",
      TextAnalysis.langId(col("text"))) == "de")
    assert(one("你好世界", TextAnalysis.langId(col("text"))) == "zh")
    assert(one("zzz qqq xxx", TextAnalysis.langId(col("text"))) == "und")
  }

  test("repetitionStats: duplicate and top n-gram fractions") {
    val df = Seq(
      (1L, "a b a b a b"),      // 3-grams: aba, bab, aba, bab → dup 0.5, top 0.5
      (2L, "w x y z"),          // 2 distinct 3-grams → dup 0, top 0.5
      (3L, "s s s s s"),        // one gram repeated 3x → dup 2/3, top 1
      (4L, "a b")               // < 3 tokens → no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((4L, 2L, 0.5, 0.5)))
    assert(got(2L) == ((2L, 2L, 0.0, 0.5)))
    assert(got(3L) == ((3L, 1L, 0.666667, 1.0)))
  }

  test("contamination: shared distinct n-grams, probe side broadcast") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox sleeps")
    ).toDF("doc_id", "text")
    val probes = Seq(
      (100L, "the quick brown fox jumps high"),
      (101L, "entirely unrelated benchmark text here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(
      corpus, "doc_id", "text", probes, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 shares "the quick brown fox" + "quick brown fox jumps" with probe 100
    assert(got((1L, 100L)) == 2L)
    // doc 3 shares only "the quick brown fox"
    assert(got((3L, 100L)) == 1L)
    // nothing else overlaps
    assert(got.size == 2)
  }

  test("unigramCrossEntropy: hand-checked Laplace model, common text scores lower") {
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    // corpus: c(a)=3, c(b)=1, T=4, V=2 → p(a)=(3+1)/6, p(b)=(1+1)/6
    val got = TextAnalysis.unigramCrossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ha = -math.log(4.0 / 6)
    val hb = -math.log(2.0 / 6)
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - ha) < 1e-6)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - hb) < 1e-6)
    // the in-distribution doc is less surprising than the rare-token doc
    assert(got(1L)._2 < got(2L)._2)
  }

  test("bigramCrossEntropy: hand-checked model, scrambles score higher") {
    // corpus bigrams: doc1 "a b a b" → (a b)x2, (b a); doc2 "b b a" →
    // (b b), (b a). c12: ab=2, ba=2, bb=1; c1(a)=2, c1(b)=3; V=2
    val df = Seq((1L, "a b a b"), (2L, "b b a")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCrossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp(c12: Long, c1: Long) = math.log((c12 + 1.0) / (c1 + 2.0))
    val h1 = -(lp(2, 2) + lp(2, 2) + lp(2, 3)) / 3.0
    val h2 = -(lp(1, 3) + lp(2, 3)) / 2.0
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - h1) < 1e-6)
    assert(got(2L)._1 == 2L && math.abs(got(2L)._2 - h2) < 1e-6)
    // a doc whose bigrams are common scores lower than a scramble with the
    // same unigram bag — the signal a unigram model cannot see
    val corpus = (0L until 20L).map(i => (i, "the quick brown fox jumps")) :+
      (100L, "the quick brown fox jumps") :+ (101L, "fox the jumps quick brown")
    val ce = TextAnalysis.bigramCrossEntropy(corpus.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ce(100L) < ce(101L),
      s"natural order ${ce(100L)} must beat scramble ${ce(101L)}")
  }

  test("collocations: exact counts, PMI matches hand computation") {
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(df, "doc_id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // pairs: (a,b)x3, (b,a), (b,c) → only (a,b) reaches minCount=2
    assert(got.length == 1)
    val (w1, w2, n12, pmi) = got(0)
    assert((w1, w2, n12) == (("a", "b", 3L)))
    // T=7 tokens (a:3 b:3 c:1), B=5 pairs: PMI = ln((3/5)/((3/7)*(3/7)))
    val expected = math.log((3.0 / 5) / ((3.0 / 7) * (3.0 / 7)))
    assert(math.abs(pmi - expected) < 1e-6)
  }

  test("portableRollingFp: order-sensitive, deterministic, empty → 0") {
    def fp(s: String): Long =
      one(s, TextAnalysis.portableRollingFp(TextAnalysis.tokens(col("text"))))
        .asInstanceOf[Long]
    assert(fp("a b c") != fp("c b a")) // order matters (unlike a set hash)
    assert(fp("a b c") == fp("a b c")) // deterministic
    assert(fp("") == 0L)
    assert(fp("a b c") >= 0L && fp("a b c") < 2147483647L) // in [0, P)
  }

  test("redactPii: masks emails/phones/IPs with counts; clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.smith+x@sub.example.org and b@c.io, dial 555-867-5309, host 192.168.0.1"),
      (2L, "no pii here, just words and 12345 numbers"),
      (3L, ""),
      (4L, "call (555) 867-5309 or 555.867.5309 today")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) ==
      "mail [EMAIL] and [EMAIL], dial [PHONE], host [IP]")
    assert((got(0).getLong(2), got(0).getLong(3), got(0).getLong(4)) == ((2L, 1L, 1L)))
    assert(got(1).getString(1) == "no pii here, just words and 12345 numbers")
    assert((got(1).getLong(2), got(1).getLong(3), got(1).getLong(4)) == ((0L, 0L, 0L)))
    assert(got(2).getString(1) == "")
    // paren and dot NANP forms are phone-shaped too
    assert(got(3).getString(1) == "call [PHONE] or [PHONE] today")
    assert(got(3).getLong(3) == 2L)
  }

  test("tokens: tabs/newlines produce no phantom empty tokens") {
    import spark.implicits._
    val df = Seq((1L, "hello world\n"), (2L, "\n"), (3L, "\ta  b\t\n"),
      (4L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq
    // trailing \n used to yield a trailing "" token (count 3, 2, ...)
    assert(got == Seq(2, 0, 2, 0))
  }

  test("qualityScore: null text scores like empty text, not 0.7") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val got = df.select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0))
    // least() skips nulls, so un-coalesced null text scored 0.7 — above
    // most real documents
    assert(got(0) == got(1))
    assert(got(0) == 0.3)
  }

  test("bpePairStats: hand-checked weighted pair counts, deterministic order") {
    import spark.implicits._
    // words: "aab" x3, "ab" x2, "x" (dropped, length 1)
    val df = Seq((1L, "aab ab aab"), (2L, "aab ab x")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(df, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // pairs: aab → (a,a),(a,b) each freq 3; ab → (a,b) freq 2
    assert(got == Seq(("a", "b", 5L), ("a", "a", 3L)))
  }

  test("bpeTrain: learns the classic merges on a hand-checked corpus") {
    import spark.implicits._
    // "abab" x4, "abc" x2: round 1 top pair (a,b) freq 4*2+2 = 10;
    // round 2 pairs over merged syms: (ab,ab) 4, (ab,c) 2 → (ab,ab)
    val df = Seq((1L, "abab abab abc"), (2L, "abab abab abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "doc_id", "text", numMerges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1, "a", "b"), (2, "ab", "ab")))
  }

  test("bpeTrain stops early when nothing is left to merge") {
    import spark.implicits._
    val df = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab" merges once into a single symbol; later rounds find no pairs
    val got = TextAnalysis.bpeTrain(df, "doc_id", "text", numMerges = 5)
    assert(got.count() == 1)
  }

  test("bpeEncodeWord agrees with the distributed applyMerge fold") {
    import spark.implicits._
    val corpus = Seq((1L, "lower lower newest newest newest wider low"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(corpus, "doc_id", "text", numMerges = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length == 4)
    // greedy non-overlapping application, reference implementation
    val enc = TextAnalysis.bpeEncodeWord("newest", merges)
    assert(enc.mkString("") == "newest") // lossless
    assert(enc.length < 6) // at least one merge applied to a corpus word
    assert(TextAnalysis.bpeEncodeWord("aaaa", Seq(("a", "a")))
      == Seq("aa", "aa")) // non-overlapping greedy
  }

  test("bpeEncodeCorpus agrees with the driver-side word encoder") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "lower lower newest newest newest wider low"),
      (2L, "newest low a"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(corpus, "doc_id", "text", numMerges = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.bpeEncodeCorpus(corpus, "doc_id", "text", numMerges = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // reference: encode each word on the driver, sum per doc
    val expect = Seq(
      1L -> "lower lower newest newest newest wider low",
      2L -> "newest low a")
      .map { case (id, text) =>
        val words = text.split("\\s+").toSeq
        id -> ((words.size.toLong,
          words.map(w => TextAnalysis.bpeEncodeWord(w, merges).size.toLong).sum))
      }.toMap
    assert(got == expect)
  }

  test("redactPii: counts equal emitted placeholders when spans overlap") {
    import spark.implicits._
    // phone- and IP-shaped spans consumed by an email match are counted as
    // the email, not double-reported as phantom phone/IP hits
    val df = Seq((1L, "reach 555-123-4567@relay.example.com now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text").collect()(0)
    assert(r.getString(1) == "reach [EMAIL] now")
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 0L, 0L)))
  }

  test("gopherQuality: clean prose passes, bullet/symbol spam fails") {
    import spark.implicits._
    val clean = ("the quick brown fox jumps over the lazy dog and that " +
      "dog will have to be happy with the outcome of this fine day ") * 3
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val hashy = "the of and that have with to be " + ("#tag " * 40)
    val df = Seq((1L, clean), (2L, bullets), (3L, hashy), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherQuality(df, "doc_id", "text", minWords = 20)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(8)) null else x.getBoolean(8))).toMap
    assert(r(1L) == true)
    assert(r(2L) == false) // all lines bullets (and too few words)
    assert(r(3L) == false) // symbol ratio ~0.83 >> 0.1
    // empty text: ratio signals are null, but the word-count bound already
    // fails → three-valued AND collapses to a definite false
    assert(r(4L) == false)
  }

  test("naiveBayes: recovers the training labels on separable vocab") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ate the food"),
      (3L, "fr", "le chat est sur le tapis"),
      (4L, "fr", "le chien mange le repas")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.naiveBayes(docs, "lang", docs, "doc_id", "text")
    val pred = out.where(col("pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "en", 2L -> "en", 3L -> "fr", 4L -> "fr"))
    // every doc scores against every label
    assert(out.count() == 8)
  }

  test("bm25Retrieve: rare-term probe ranks its source-vocab doc first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "zyzzyva colony biology zyzzyva behavior"),
      (2L, "common words appear in this document about words"),
      (3L, "another common document with words and more words"))
      .toDF("doc_id", "text")
    val probes = Seq((100L, "zyzzyva biology")).toDF("probe_id", "text")
    val got = TextAnalysis.bm25Retrieve(corpus, "doc_id", "text",
      probes, "probe_id", "text", k = 3).collect()
    val top = got.find(_.getLong(4) == 1L).get
    assert(top.getLong(1) == 1L) // the zyzzyva doc wins
    assert(top.getDouble(3) > 0.0)
    // docs sharing no probe term never appear
    assert(!got.exists(_.getLong(1) == 2L) && !got.exists(_.getLong(1) == 3L))
  }

  test("zipfFit: planted power law recovers slope ≈ -1 with high r²") {
    // corpus where term w_r appears round(1000/r) times → freq ∝ rank^-1
    val words = (1 to 50).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(f"w$r%03d"))
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(df, "text", topN = 50).head()
    assert(row.getLong(0) == 50L)
    assert(math.abs(row.getDouble(1) - (-1.0)) < 0.02) // slope ≈ -1
    assert(row.getDouble(3) > 0.999)                   // near-perfect fit
    // a flat (non-Zipfian) corpus fits slope ≈ 0
    val flat = (1 to 50).flatMap(r => Seq.fill(20)(f"w$r%03d"))
    val row2 = TextAnalysis.zipfFit(
      Seq((1L, flat.mkString(" "))).toDF("doc_id", "text"), "text",
      topN = 50).head()
    assert(math.abs(row2.getDouble(1)) < 1e-9)
  }

  test("scriptProfile: counts code points per script block") {
    import spark.implicits._
    val df = Seq((1L, "abc 12 中文 Ж"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.scriptProfile(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    val a = r(1L)
    // 3 latin, 2 digits, 2 CJK, 1 cyrillic, 0 arabic over 8 non-ws chars
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4),
      a.getLong(5), a.getLong(6)) == ((8L, 3L, 2L, 2L, 1L, 0L)))
    assert(a.getDouble(7) == 0.375 && a.getDouble(8) == 0.25)
    // empty text: zero counts, null ratios
    assert(r(2L).getLong(1) == 0L && r(2L).isNullAt(7))
  }

  test("keywordTag: per-topic hit counts, dominant tie-break to smallest " +
      "topic name, no-hit docs absent") {
    import spark.implicits._
    val topics = Map("alpha" -> Seq("x", "y"), "beta" -> Seq("z"),
      "gamma" -> Seq("q"))
    val df = Seq(
      (1L, "x y z"),    // alpha 2, beta 1 → dominant alpha
      (2L, "x z"),      // alpha 1, beta 1 → tie → alpha (smallest name)
      (3L, "plain"),    // no hits → absent
      (4L, "z z q")     // beta 2, gamma 1 → dominant beta
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .keywordTag(df, "doc_id", "text", topics).collect()
      .map(x => (x.getLong(0), x.getString(1)) ->
        (x.getLong(2), x.getBoolean(3))).toMap
    assert(r((1L, "alpha")) == ((2L, true)))
    assert(r((1L, "beta")) == ((1L, false)))
    assert(r((2L, "alpha")) == ((1L, true)))  // tie → lexicographic min
    assert(r((2L, "beta")) == ((1L, false)))
    assert(r((4L, "beta")) == ((2L, true)))
    assert(r((4L, "gamma")) == ((1L, false)))
    assert(!r.keys.exists(_._1 == 3L))
  }

  test("skipGrams: window-bounded pair counts, both directions, symmetric") {
    import spark.implicits._
    // "a b c d" window 2 → ordered pairs: (a,b),(a,c),(b,c),(b,d),(c,d)
    // → 10 directional pairs; symmetric counts
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.skipGrams(df, "text", window = 2, minCount = 1)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r.values.sum == 10L)
    assert(r(("a", "b")) == 1L && r(("b", "a")) == 1L)
    assert(r(("a", "c")) == 1L)          // offset-2 pair inside the window
    assert(!r.contains(("a", "d")))      // offset 3 > window
    // repeated co-occurrence accumulates: "x y x" window 1 → (x,y) twice
    val df2 = Seq((1L, "x y x")).toDF("doc_id", "text")
    val r2 = TextAnalysis.skipGrams(df2, "text", window = 1, minCount = 1)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r2(("x", "y")) == 2L && r2(("y", "x")) == 2L)
  }

  test("chi2Features: independence scores ~0, perfect association scores " +
      "high, zero-denominator cells excluded") {
    import spark.implicits._
    // 4 docs, 2 labels; "only" appears exactly in label A's docs (perfect
    // association), "both" appears in one doc of each label
    // (near-independence), "every" appears in all docs (undefined χ² —
    // must be excluded)
    val df = Seq(
      (1L, "only both every", "A"), (2L, "only every", "A"),
      (3L, "both every", "B"), (4L, "every filler", "B")
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.chi2Features(df, "doc_id", "text", "lang",
      minDf = 1).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(5)).toMap
    // perfect association: A=2,B=0,C=0,D=2 → χ² = N = 4 → 4_000_000 micro
    assert(r(("A", "only")) == 4000000L)
    // "both": A=1,B=1,C=1,D=1 → χ² = 0 exactly
    assert(r(("A", "both")) == 0L && r(("B", "both")) == 0L)
    // df_t = n → excluded entirely
    assert(!r.keys.exists(_._2 == "every"))
  }

  test("readability: fixed-point Flesch/FK/TTR match hand computation") {
    import spark.implicits._
    // "the cat sat. the cat ran." → W=6, S=2, vowel groups: e,a,a,e,a,a =
    // 6 → Y=max(6,6)=6, D=4 (the, cat, sat., ran. — tokens keep punct;
    // "sat." and "ran." distinct from each other and "the"/"cat")
    val df = Seq((1L, "the cat sat. the cat ran."), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    val a = r(1L)
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((6L, 2L, 6L)))
    // flesch_milli = 206835 - (1015*6)//2 - (84600*6)//6
    //              = 206835 - 3045 - 84600 = 119190  (≈ 119.19 — easy text)
    assert(a.getLong(4) == 119190L)
    // fk_milli = (390*6)//2 + (11800*6)//6 - 15590 = 1170+11800-15590
    assert(a.getLong(5) == -2620L)
    // D=4 distinct of 6 → ttr_ppm = 4e6//6 = 666666
    assert(a.getLong(6) == 666666L)
    // empty and null text: zero words, sentence floor 1, zero scores where
    // guarded (flesch collapses to the constant)
    for (id <- Seq(2L, 3L)) {
      val e = r(id)
      assert(e.getLong(1) == 0L && e.getLong(2) == 1L && e.getLong(3) == 0L)
      assert(e.getLong(4) == 206835L && e.getLong(6) == 0L)
    }
  }

  test("luhnValid: known valid/invalid card numbers, empty guard") {
    import graft.operators.TextAnalysis
    val cases = Seq(
      ("79927398713", true),       // the canonical Luhn example
      ("79927398714", false),
      ("4539578763621486", true),  // 16-digit Visa test number
      ("4539578763621487", false),
      ("0", true),                 // single check digit 0
      ("", false),                 // empty → false, not null
      ("4111-1111-1111-1111", false), // separators → guard, not ANSI crash
      ("4111a111", false))         // letters likewise
    val got = cases.map(_._1).toDF("pan")
      .select(col("pan"), TextAnalysis.luhnValid(col("pan")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (pan, want) => assert(got(pan) == want, pan) }
  }

  test("goodTuring: N_r table and exact-rational r* on a tiny corpus") {
    import graft.operators.TextAnalysis
    // counts: a=3, b=2, c=2, d=1, e=1, f=1 → N_1=3, N_2=2, N_3=1
    val df = Seq("a b c d", "a b c e", "a f").toDF("text")
    val r = TextAnalysis.goodTuring(df, "text", maxR = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) == ((3L, 2L, 4L, 3L)))  // r*=2*N_2/N_1 = 4/3
    assert(r(2L) == ((2L, 1L, 3L, 2L)))  // r*=3*N_3/N_2 = 3/2
    assert(r(3L) == ((1L, 0L, 0L, 1L)))  // no N_4 → numerator 0
  }

  test("heapsFit: growing vocabulary fits beta in (0,1], flat corpus beta 0") {
    import graft.operators.TextAnalysis
    // every doc adds one new word on a shared base → sub-linear growth
    val grow = (0L until 64L).map(i =>
      (i, s"base0 base1 base2 base3 w$i")).toDF("doc_id", "text")
    val fit = TextAnalysis.heapsFit(grow, "doc_id", "text",
      sampleEvery = 4L, bucketSize = 8L).collect()(0)
    assert(fit.getLong(0) == 16L) // 64 docs, every 4th sampled
    val beta = fit.getDouble(1)
    assert(beta > 0.0 && beta <= 1.0, s"beta=$beta")
    // closed vocabulary: no new words after doc 0 → beta near 0
    val flat = (0L until 64L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val b0 = TextAnalysis.heapsFit(flat, "doc_id", "text",
      sampleEvery = 4L, bucketSize = 8L).collect()(0).getDouble(1)
    assert(math.abs(b0) < 0.05, s"flat beta=$b0")
  }

  test("heapsFit: two-level cumsum equals the naive single-window prefix") {
    import graft.operators.TextAnalysis
    val docs = (0L until 40L).map(i =>
      (i, (0L to i % 7).map(j => s"t${(i * 3 + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    // tiny buckets force multi-bucket two-level paths; a single huge bucket
    // is the naive window — the fit must be identical
    val a = TextAnalysis.heapsFit(docs, "doc_id", "text", 2L, 4L).collect()(0)
    val b = TextAnalysis.heapsFit(docs, "doc_id", "text", 2L, 1000000L).collect()(0)
    assert(a == b)
  }

  test("ngramNovelty: unseen-gram ratio in exact micro-units") {
    import graft.operators.TextAnalysis
    val corpus = Seq((0L, "a b c d")).toDF("doc_id", "text") // grams: ab bc cd
    val probes = Seq(
      (1L, "a b c x"),  // grams ab bc cx → 1 unseen of 3
      (2L, "z"),        // too short for 2-grams → (0, 0, -1)
      (3L, "a b")).toDF("doc_id", "text") // ab seen → 0 of 1
    val r = TextAnalysis.ngramNovelty(corpus, "doc_id", "text",
        probes, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((3L, 1L, 333333L)))
    assert(r(2L) == ((0L, 0L, -1L)))
    assert(r(3L) == ((1L, 0L, 0L)))
  }

  test("labelNoise: separable labels stay on the diagonal") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "aa bb cc aa bb", "x"), (1L, "bb aa cc cc aa", "x"),
      (2L, "zz yy ww zz yy", "y"), (3L, "ww zz yy yy ww", "y"))
      .toDF("doc_id", "text", "lang")
    val m = TextAnalysis.labelNoise(docs, "lang", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m(("x", "x")) == 2L && m(("y", "y")) == 2L)
    assert(m.size == 2, s"off-diagonal cells: $m")
  }


  test("chunkCdc: boundaries re-synchronize after a prefix insertion") {
    import graft.operators.TextAnalysis
    val words = (1 to 120).map(i => s"w${i % 37}x${(i * 7) % 23}").mkString(" ")
    val docs = Seq((1L, words), (2L, "inserted preamble here " + words))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkCdc(docs, "doc_id", "text",
        w = 4, divisor = 8L)
      .collect().map(r => (r.getLong(0), r.getString(4))).toSeq
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    // content-defined boundaries depend only on the local window, so all
    // but the first (edited) chunk dedup across the two docs
    val shared = a.intersect(b).size
    assert(shared >= a.size - 2,
      s"expected near-total chunk reuse, got $shared of ${a.size}")
    // fixed-window chunking shares NOTHING under the same 3-token shift
    val fixed = TextAnalysis.chunk(docs, "doc_id", "text",
        window = 8, stride = 8)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val fa = fixed.filter(_._1 == 1L).map(_._2).toSet
    val fb = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert(fa.intersect(fb).isEmpty)
  }

  test("chunkCdc: chunks partition the doc, mean length tracks divisor") {
    import graft.operators.TextAnalysis
    val words = (1 to 400).map(i => s"t${(i * 13) % 101}").mkString(" ")
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val r = TextAnalysis.chunkCdc(df, "doc_id", "text", w = 4, divisor = 10L)
      .collect()
    assert(r.map(_.getLong(2)).sum == 400L) // every token in exactly one chunk
    val mean = 400.0 / r.length
    assert(mean > 3 && mean < 40, s"mean chunk len $mean")
  }


  test("spanCorrupt: sentinel-splice reconstruction reproduces the text") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, (1 to 80).map(i => s"tok${(i * 11) % 29}").mkString(" ")),
      (2L, "tiny doc"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorrupt(docs, "doc_id", "text",
        spanLen = 3, everyK = 6L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(!out.contains(3L)) // empty doc emits no pair
    val sentinel = "<extra_id_(\\d+)>".r
    for ((id, (input, target, nMasked)) <- out) {
      // splice every target span back over its input sentinel
      val spans = sentinel.split(target).map(_.trim).drop(1) // span texts
      val ks = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(ks == ks.indices.toSeq, s"doc $id sentinels not sequential")
      var rebuilt = input
      for ((k, span) <- ks.zip(spans))
        rebuilt = rebuilt.replace(s"<extra_id_$k>", span)
      val orig = docs.where(col("doc_id") === id)
        .select(lower(col("text"))).collect()(0).getString(0)
        .trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == orig, s"doc $id reconstruction")
      assert(spans.map(_.split(" ").length).sum == nMasked)
    }
    assert(out(1L)._3 > 0, "the 80-token doc should mask something")
  }


  test("fimTransform: PSM reassembly reproduces the text, counts add up") {
    import graft.operators.TextAnalysis
    val docs = ((1L to 40L).map(i =>
      (i, (1 to 30).map(j => s"w${(i * 31 + j * 7) % 53}").mkString(" ")))
      :+ (98L, "solo") :+ (99L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.fimTransform(docs, "doc_id", "text", 50L)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 42) // short and empty docs still emit a row
    assert(out.find(_._1 == 98L).get == ((98L, false, "solo", 1L, 0L, 0L)))
    assert(out.find(_._1 == 99L).get == ((99L, false, "", 0L, 0L, 0L)))
    val fimmed = out.filter(_._2)
    assert(fimmed.nonEmpty && fimmed.length < 40) // rate ~50%, not 0/100
    for ((id, _, txt, np, nm, ns) <- fimmed) {
      assert(np + nm + ns == 30, s"doc $id counts")
      // <fim_pre> P <fim_suf> S <fim_mid> M  →  P M S == original
      val m = "<fim_pre> (.*) <fim_suf> (.*) <fim_mid>(.*)".r
      val m(p, sfx, mid) = txt
      val orig = docs.where(col("doc_id") === id)
        .select(lower(col("text"))).collect()(0).getString(0)
      assert((p + " " + mid.trim + " " + sfx).replaceAll(" +", " ").trim
        == orig, s"doc $id reassembly")
    }
    for ((id, _, txt, np, nm, ns) <- out.filterNot(_._2) if id < 90L) {
      assert(np == 30 && nm == 0 && ns == 0)
      assert(!txt.contains("<fim_"))
    }
  }

  test("textRank: hub word ranks first; stopwords and short tokens excluded") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "hub aaa hub bbb hub ccc"),
      (2L, "the of ab hub ddd"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textRank(docs, "doc_id", "text",
      iters = 5, topK = 10).collect()
    // star graph centered on "hub" (+ ddd spoke from doc 2): the center
    // accumulates every spoke's contribution
    assert(got.head.getString(0) == "hub")
    val words = got.map(_.getString(0)).toSet
    assert(words == Set("hub", "aaa", "bbb", "ccc", "ddd"))
    // spokes are symmetric except ddd (same degree-1 shape) -- aaa/bbb/ccc
    // tie exactly and order alphabetically
    val spokes = got.filter(r => Set("aaa", "bbb", "ccc")(r.getString(0)))
    assert(spokes.map(_.getLong(1)).distinct.length == 1)
    assert(spokes.map(_.getString(0)).toSeq == Seq("aaa", "bbb", "ccc"))
  }

  test("logisticTrain: learns a separable planted corpus to 100%; exact weights") {
    import graft.operators.TextAnalysis
    // positive docs are pure en-marker text (x1 = 1e6), negatives share no
    // marker (x1 = 0) -> hard-sigmoid GD must separate them perfectly
    val docs = ((1L to 10L).map(i => (i, "the and of to is in", "en")) ++
      (11L to 20L).map(i => (i, "zzz qqq xxx yyy www vvv", "de")))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.logisticTrain(docs, "doc_id", "text", "lang",
      posLabel = "en", iters = 8, lrMicro = 2000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("n_rows") == 20L && got("n_correct") == 20L)
    // the en-marker weight dominates positive, the bias settles negative
    // (the negative class has only the intercept feature active)
    assert(got("w1_micro") > 0L && got("w0_micro") < got("w1_micro"))
    // zero rounds -> zero weights, majority-by-sigmoid(0) >= 0.5 predicts
    // everything positive
    val w0 = TextAnalysis.logisticTrain(docs, "doc_id", "text", "lang",
      posLabel = "en", iters = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w0("w0_micro") == 0L && w0("n_correct") == 10L)
  }

  test("hillTailIndex: hand-computed alpha, degenerate uniform -> 0") {
    import graft.operators.TextAnalysis
    // counts: w1 x8, w2 x4, w3 x2, w4 x1 -> with k=3 the reference is
    // c4=1: alpha = 3 / (ln 8 + ln 4 + ln 2) = 3 / (6 ln 2)
    val docs = Seq((1L,
      (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++ Seq.fill(2)("w3")
        ++ Seq("w4")).mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.hillTailIndex(docs, "text", k = 3).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - 3.0 / (6 * math.log(2.0))) < 1e-6)
    // all counts equal -> sum of logs 0 -> pinned alpha 0
    val uni = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(TextAnalysis.hillTailIndex(uni, "text", k = 2)
      .collect()(0).getDouble(1) == 0.0)
  }

  test("kneserNey: hand-computed smoothed bigram probabilities") {
    import graft.operators.TextAnalysis
    // corpus "a b a b a c": bigrams ab:2 ba:2 ac:1; T=3
    // left(a): c1=3 types=2; left(b): c1=2 types=1
    // cont: a:1 b:1 c:1
    // p(b|a) = ((4*2-3)*3 + 3*2*1) / (4*3*3) = 21/36
    // p(a|b) = (5*3 + 3*1*1) / (4*2*3)       = 18/24
    // p(c|a) = (1*3 + 3*2*1) / 36            =  9/36
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNey(docs, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("a", "b")) == ((2L, 583333L)))
    assert(got(("b", "a")) == ((2L, 750000L)))
    assert(got(("a", "c")) == ((1L, 250000L)))
    // discount reserves mass: observed continuations of "a" sum below 1
    assert(583333L + 250000L < 1000000L)
  }

  test("mutualInfo: perfectly predictive token carries the label entropy") {
    import graft.operators.TextAnalysis
    // 4 docs, 2 langs; "zz" appears in exactly the two "en" docs →
    // cells A=2 B=0 C=0 D=2, every present cell term (2/4)·ln(2·4/(2·2))
    // = 0.5·ln2 → MI = ln 2 ≈ 0.693147 (the full 1-bit label entropy)
    val docs = Seq((1L, "zz x", "en"), (2L, "zz y", "en"),
      (3L, "q x", "fr"), (4L, "q y", "fr")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.mutualInfo(docs, "doc_id", "text", "lang",
      minDf = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(got(("en", "zz")) == 0.693147)
    assert(got(("fr", "q")) == 0.693147)
    // an uninformative token (x: one doc per lang) carries zero
    assert(got(("en", "x")) == 0.0 && got(("fr", "x")) == 0.0)
  }

  test("corpusKl: identical distributions → 0, divergence is asymmetric-positive") {
    import graft.operators.TextAnalysis
    // "same" has the base's distribution exactly; "diff" is disjoint
    val docs = Seq((1L, "a b a", "base"), (2L, "a b a", "same"),
      (3L, "x y x", "diff")).toDF("doc_id", "text", "grp")
    val got = TextAnalysis.corpusKl(docs, "text", "grp", base = "base")
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_g"), r.getAs[Long]("v"),
          r.getAs[Long]("kl_nano"))).toMap
    assert(got.keySet == Set("same", "diff"))
    assert(got("same")._3 == 0L)            // same smoothed distribution
    assert(got("diff")._3 > 0L)             // disjoint vocab diverges
    assert(got("same")._1 == 3L && got("same")._2 == 4L) // vocab a,b,x,y
  }

  test("corpusJsd: identical groups at 0, disjoint groups near ln 2, symmetric") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a", "g1"), (2L, "a b a", "g2"),
      (3L, "x y x", "g3")).toDF("doc_id", "text", "grp")
    val got = TextAnalysis.corpusJsd(docs, "text", "grp")
      .collect().map(r => (r.getAs[String]("g_a"), r.getAs[String]("g_b")) ->
        r.getAs[Long]("jsd_nano")).toMap
    // every unordered pair exactly once, g_a < g_b
    assert(got.keySet == Set(("g1", "g2"), ("g1", "g3"), ("g2", "g3")))
    assert(got(("g1", "g2")) == 0L)          // identical distributions
    // disjoint-support JSD is positive and bounded by ln 2 ≈ 0.693e9 nano
    // (add-1 smoothing over these 3-token docs keeps it well inside), and
    // SYMMETRIC by construction: both disjoint pairs have the same token
    // profile vs g3, so the same value
    assert(got(("g1", "g3")) > 0L && got(("g1", "g3")) < 693147181L)
    assert(got(("g1", "g3")) == got(("g2", "g3")))
  }

  test("corpusKl: minCount shrinks the vocabulary and smoothing mass") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a a a rare", "base"), (2L, "a a b", "g2"))
      .toDF("doc_id", "text", "grp")
    // corpus counts: a=5, rare=1, b=1 → only "a" survives minCount=2
    val row = TextAnalysis.corpusKl(docs, "text", "grp", base = "base",
      minCount = 2L).collect()(0)
    assert(row.getAs[Long]("v") == 1L)
    assert(row.getAs[Long]("n_g") == 2L) // g2's tokens within kept vocab
  }

  test("mutualInfo: minDf floors the vocabulary") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "common rare", "en"), (2L, "common", "fr"))
      .toDF("doc_id", "text", "lang")
    val toks = TextAnalysis.mutualInfo(docs, "doc_id", "text", "lang",
      minDf = 2).collect().map(_.getString(1)).toSet
    assert(toks == Set("common"))
  }

  test("unigramSeedVocab: chars always kept, top-K multi pinned by " +
      "(freq desc, piece asc)") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSeedVocab(docs, "doc_id", "text",
      maxPieceLen = 5, topK = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars: a appears 2x in each "aa" (freq 2) + 1x in each "ab" (freq 2)
    // = 6; b = 2. multi candidates: aa freq 2, ab freq 2 — topK=1 keeps
    // "aa" (tie broken by piece asc)
    assert(got == Map("a" -> 6L, "b" -> 2L, "aa" -> 2L))
  }

  test("unigramEncode: hand vocab picks the single-piece segmentation") {
    val docs = Seq((7L, "ab ab")).toDF("doc_id", "text")
    val vocab = Seq(("a", 10L), ("b", 10L), ("ab", 20L))
      .toDF("piece", "freq")
    val row = TextAnalysis.unigramEncode(docs, "doc_id", "text", vocab)
      .collect()(0)
    // F=40: cost(ab) = -round(ln(0.5)*1e6) = 693147 beats
    // cost(a)+cost(b) = 2*1386294
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L)
    assert(row.getLong(3) == 2L * 693147L)
  }

  test("unigramEncode: UNK chars and over-length words hit the " +
      "documented floors") {
    val docs = Seq((1L, "zz"), (2L, "aaaa")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1L)).toDF("piece", "freq")
    val got = TextAnalysis.unigramEncode(docs, "doc_id", "text", vocab,
      maxPieceLen = 2, maxWordLen = 3, unkCostMicro = 5000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "zz": both chars unknown -> 2 pieces at the UNK floor
    assert(got(1L) == ((1L, 2L, 10000000L)))
    // "aaaa" is longer than maxWordLen=3 -> per-char fallback
    assert(got(2L) == ((1L, 4L, 20000000L)))
  }

  test("unigramTrain: hard-EM keeps the used pieces, drops the rest") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // seed = {a:3, b:3, ab:3}; single-piece "ab" beats a+b, so the EM
    // counts keep ONLY ab (chars were never used by the optimum)
    val got = TextAnalysis.unigramTrain(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 3L))
    // over-length words contribute their per-char fallback counts
    val long = Seq((1L, "aaaa ab")).toDF("doc_id", "text")
    val g2 = TextAnalysis.unigramTrain(long, "doc_id", "text",
      maxWordLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("a") == 4L && g2("ab") == 1L)
  }

  test("unigramTrain: EM counts conserve the encode piece total") {
    // the M-step counts pieces of canonical optimal segmentations; the
    // packed key makes every optimal segmentation share its piece COUNT,
    // so sum(train freq) must equal sum(encode n_pieces) exactly
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
    val seed = TextAnalysis.unigramSeedVocab(docs, "doc_id", "text",
      maxPieceLen = 5, topK = 120)
    val nPieces = TextAnalysis.unigramEncode(docs, "doc_id", "text", seed,
        maxPieceLen = 5)
      .agg(sum(col("n_pieces"))).head().getLong(0)
    val emTotal = TextAnalysis.unigramTrain(docs, "doc_id", "text",
        maxPieceLen = 5, topK = 120)
      .agg(sum(col("freq"))).head().getLong(0)
    assert(emTotal == nPieces, s"EM total $emTotal vs encode $nPieces")
  }

  test("unigramTrainEm: rounds=1 equals unigramTrain; character mass " +
      "conserved per round; vocabularies only sharpen") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val one = asMap(TextAnalysis.unigramTrainEm(docs, "doc_id", "text",
      rounds = 1, maxPieceLen = 5, topK = 120))
    val single = asMap(TextAnalysis.unigramTrain(docs, "doc_id", "text",
      maxPieceLen = 5, topK = 120))
    assert(one == single, "rounds = 1 must reproduce unigramTrain")
    // per-round CHARACTER conservation: canonical paths tile each word,
    // so Σ freq·len(piece) is invariant across EM rounds (= total token
    // characters, long-word fallback included)
    def charMass(m: Map[String, Long]): Long =
      m.map { case (p, f) => p.length.toLong * f }.sum
    val two = asMap(TextAnalysis.unigramTrainEm(docs, "doc_id", "text",
      rounds = 2, maxPieceLen = 5, topK = 120))
    val three = asMap(TextAnalysis.unigramTrainEm(docs, "doc_id", "text",
      rounds = 3, maxPieceLen = 5, topK = 120))
    assert(charMass(one) == charMass(two) &&
      charMass(two) == charMass(three),
      s"character mass must be conserved per round: " +
        s"${charMass(one)}/${charMass(two)}/${charMass(three)}")
    // every piece of a later round was segmentable in that round's DP —
    // non-empty, and total freq (= piece count) never increases once the
    // optimum sharpens is NOT a theorem (a char inside a round-1 piece
    // may re-enter via the UNK floor), so pin only what is: non-empty
    // vocabularies with all-positive counts
    assert(two.nonEmpty && three.nonEmpty &&
      two.values.forall(_ > 0) && three.values.forall(_ > 0))
  }

  test("unigramEncode: min-plus doubling equals driver-side Viterbi on " +
      "the corpus vocabulary") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val vocab = TextAnalysis.unigramSeedVocab(docs, "doc_id", "text",
      maxPieceLen = 5, topK = 50)
    val pieces = vocab.collect().map(r => r.getString(0) -> r.getLong(1))
    val tot = pieces.map(_._2).sum.toDouble
    val cost = pieces.map { case (p, f) =>
      p -> -math.round(math.log(f / tot) * 1e6) }.toMap
    val unk = 30000000L
    def viterbi(w: String): (Long, Long) = { // (cost, pieces), ties: fewer
      val n = w.length
      val dp = Array.fill(n + 1)((Long.MaxValue, Long.MaxValue))
      dp(0) = (0L, 0L)
      for (i <- 1 to n; l <- 1 to math.min(5, i)) {
        val p = w.substring(i - l, i)
        val c = if (l == 1) Some(cost.getOrElse(p, unk))
          else cost.get(p)
        c.foreach { cc =>
          val cand = (dp(i - l)._1 + cc, dp(i - l)._2 + 1)
          if (dp(i - l)._1 != Long.MaxValue &&
            (cand._1 < dp(i)._1 ||
              (cand._1 == dp(i)._1 && cand._2 < dp(i)._2))) dp(i) = cand
        }
      }
      dp(n)
    }
    val expected = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val segs = rows.map(r => viterbi(r.getString(1)))
        id -> ((rows.length.toLong, segs.map(_._2).sum, segs.map(_._1).sum))
      }
    val got = TextAnalysis.unigramEncode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

}
