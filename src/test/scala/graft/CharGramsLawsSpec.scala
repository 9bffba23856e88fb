package graft

import graft.functions.CharGramsUtil
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property tests of the codegen'd char-n-gram builder against a naive
  * reference: code-point windows (surrogate pairs whole), base-131
  * polynomial encoding, distinct. The expression replaced an interpreted
  * column formulation (`split('') → ascii → element_at polynomial`), so
  * the reference here IS that formulation's semantics — any drift would
  * silently break the `q_dedup_jaccard_char` oracle instead of a spec.
  */
class CharGramsLawsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive reference: sliding code-point windows → base-131 fold → distinct
    * (as a set — the expression's sort-dedup output is order-insensitive
    * downstream, so sets are the right comparison).
    */
  private def reference(s: String, n: Int): Set[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - n)
      .map(i => cps.slice(i, i + n).foldLeft(0L)((acc, c) => acc * 131L + c))
      .toSet
  }

  private def got(s: String, n: Int): Set[Long] = {
    val arr = CharGramsUtil.grams(UTF8String.fromString(s), n)
    arr.toLongArray().toSet
  }

  // plenty of repeats so dedup paths are exercised; includes supplementary-
  // plane code points (surrogate pairs in UTF-16)
  private val charGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "c", " ", "0", "ß", "中"),
    Gen.oneOf("😀", "💩")) // 😀 💩
  private val strGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(k => Gen.listOfN(k, charGen).map(_.mkString))

  test("grams equal the naive code-point reference (incl. surrogate pairs)") {
    check(forAll(strGen, Gen.chooseNum(1, 6)) { (s, n) =>
      got(s, n) == reference(s, n)
    })
  }

  test("output is sorted and duplicate-free") {
    check(forAll(strGen, Gen.chooseNum(1, 6)) { (s, n) =>
      val arr = CharGramsUtil.grams(UTF8String.fromString(s), n).toLongArray()
      arr.sameElements(arr.distinct.sorted)
    })
  }

  test("short input yields an empty gram set") {
    assert(got("abcd", 5) == Set.empty[Long])
    assert(got("", 1) == Set.empty[Long])
  }

  test("injective on ASCII: distinct 5-gram windows never collide") {
    // base-131 with codes < 131 is the base-131 representation — exact
    check(forAll(Gen.listOfN(30, Gen.alphaNumChar).map(_.mkString)) { s =>
      val cps = s.codePoints().toArray
      val windows = (0 to cps.length - 5).map(i => cps.slice(i, i + 5).toSeq).toSet
      reference(s, 5).size == windows.size
    })
  }
}
