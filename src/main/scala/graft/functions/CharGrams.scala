package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram set builder shared by interpreted eval and generated
  * code: every length-`n` code-point window of the input, encoded as the
  * base-131 polynomial of its code points (injective on ASCII — the
  * base-131 representation, an exact encoding, not a hash), deduplicated.
  *
  * Semantically identical to the portable SQL form
  * `list_distinct(list_transform(windows, poly))` the DuckDB oracle runs
  * (see [[graft.operators.Dedup.jaccardCharOracleSql]]), but one compiled
  * pass per row: the `transform`/`element_at` column formulation is
  * CodegenFallback (interpreted lambda evaluation per element — measured as
  * the single most expensive query of the whole bench at sf0.1), while this
  * expression is an O(L·n) primitive-long loop with no per-gram allocation.
  */
object CharGramsUtil {

  /** Distinct base-131 polynomial codes of all code-point n-grams, sorted
    * ascending (dedup by sort; downstream consumers — set intersection and
    * size — are order-insensitive). Returns an empty array when the input
    * has fewer than n code points.
    */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // code-point array: identical windowing to Spark split(t, '') + ascii()
    // and DuckDB substr/unicode, both of which step by code points
    val cps = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val m = cps.length - n + 1
    if (m <= 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = acc * 131L + cps(i + j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup over the sorted grams
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Catalyst expression: `char_grams(string, n) -> array<long>` — the
  * distinct base-131-encoded code-point n-grams of a string. Codegen emits
  * a direct static call (no boxing, stays inside whole-stage codegen), the
  * same extension tier as [[SimHash]].
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be positive")
  // n = 5 keeps the polynomial < 2^51 even for full unicode code points —
  // exact in int64 on every engine (Dedup.jaccardPairsChar's contract)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(v: Any): Any =
    CharGramsUtil.grams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharGramsUtil.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGrams {
  /** Column-level API. */
  def charGrams(text: Column, n: Int): Column =
    GraftShim.column(CharGrams(GraftShim.expression(text), n))
}
