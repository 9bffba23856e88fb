package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Mutable accumulator for [[ArrayReduceAgg]]: the reference's
  * `Vec<T::Native>` (reference src/monoid.rs:341), length fixed by the first
  * non-null array (`null` until then). Integral element types fold in
  * `longs`, floating types in `values`.
  */
final class ArrayReduceBuffer(var values: Array[Double], var longs: Array[Long])

/** Engine-grade Catalyst implementation of the reference's
  * `ArrayMonoidReduce` UDAF (reference `src/monoid.rs:226-470`) as a
  * `TypedImperativeAggregate` — the same execution tier the reference's
  * `Accumulator` runs on in DataFusion (object-buffer hash aggregation;
  * `ObjectHashAggregateExec` here), but with no Encoder round-trip per row:
  * values are read straight out of columnar `ArrayData` into a primitive
  * array buffer, and partial states shuffle as flat byte arrays.
  *
  * Semantics match [[ArrayMonoidReduce]] (null rows skipped, null elements =
  * identity, first-array-length truncation, empty aggregate → empty array);
  * `ArrayReduceSpec` pins the two implementations against each other.
  * Integral arithmetic clamps to the element width through the width-correct
  * [[Monoid]] instance (Rust saturating semantics). Float32 folds
  * accumulate in double here (documented deviation of the native variant;
  * the `array_reduce_*_float` Aggregator family keeps bit-exact f32 folds).
  *
  * Element type is resolved from the child at analysis time, so one SQL
  * function name serves every array element type — the ergonomic upgrade
  * over the reference's per-type factories (src/monoid.rs:492-526).
  */
case class ArrayReduceAgg(
    child: Expression,
    opName: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayReduceBuffer] {

  @transient private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case t => throw new IllegalArgumentException(
      s"array_reduce_${opName}_native expects array<numeric>, got $t")
  }

  @transient private lazy val integral: Boolean = elemType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType => false
    case t => throw new IllegalArgumentException(s"unsupported element type $t")
  }

  // Width-correct saturating fold over the Long carrier for integrals,
  // written directly on Long so the inner loop never boxes (Function2 is
  // @specialized for Long, unlike the generic Monoid trait): inputs are in
  // the element width's range, so sum fits in Long and product of two
  // sub-Long widths fits in Long — one clamp to the width reproduces the
  // Rust saturating semantics (pinned against the Aggregator family in
  // ArrayReduceAggSpec).
  @transient private lazy val (longIdentity, longCombine): (Long, (Long, Long) => Long) = {
    val (lo, hi) = elemType match {
      case ByteType => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
      case ShortType => (Short.MinValue.toLong, Short.MaxValue.toLong)
      case IntegerType => (Int.MinValue.toLong, Int.MaxValue.toLong)
      case _ => (Long.MinValue, Long.MaxValue)
    }
    @inline def clamp(v: Long): Long = if (v > hi) hi else if (v < lo) lo else v
    (opName, elemType) match {
      case ("sum", LongType) => (0L, Monoid.satAddLong _)
      case ("product", LongType) => (1L, Monoid.satMulLong _)
      case ("sum", _) => (0L, (a: Long, b: Long) => clamp(a + b))
      case ("product", _) => (1L, (a: Long, b: Long) => clamp(a * b))
      case ("max", _) => (lo, (a: Long, b: Long) => math.max(a, b))
      case ("min", _) => (hi, (a: Long, b: Long) => math.min(a, b))
      case (op, t) => throw new IllegalArgumentException(s"no monoid $op/$t")
    }
  }

  @transient private lazy val (doubleIdentity, doubleCombine): (Double, (Double, Double) => Double) =
    opName match {
      case "sum" => (0.0, (a: Double, b: Double) => a + b)
      case "product" => (1.0, (a: Double, b: Double) => a * b)
      case "max" => (Double.NegativeInfinity, (a: Double, b: Double) => math.max(a, b))
      case "min" => (Double.PositiveInfinity, (a: Double, b: Double) => math.min(a, b))
      case op => throw new IllegalArgumentException(s"no monoid $op")
    }

  override def createAggregationBuffer(): ArrayReduceBuffer =
    new ArrayReduceBuffer(null, null)

  override def update(buf: ArrayReduceBuffer, input: InternalRow): ArrayReduceBuffer = {
    val v = child.eval(input)
    if (v == null) return buf // null row skipped (src/monoid.rs:432-434)
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (integral) {
      if (buf.longs == null && n > 0)
        buf.longs = Array.fill(n)(longIdentity)
      if (buf.longs != null) {
        val m = math.min(n, buf.longs.length) // truncate longer arrays
        var j = 0
        while (j < m) {
          if (!arr.isNullAt(j)) // null element = identity (src/monoid.rs:371-373)
            buf.longs(j) = longCombine(buf.longs(j), getLong(arr, j))
          j += 1
        }
      }
    } else {
      if (buf.values == null && n > 0)
        buf.values = Array.fill(n)(doubleIdentity)
      if (buf.values != null) {
        val m = math.min(n, buf.values.length)
        var j = 0
        while (j < m) {
          if (!arr.isNullAt(j))
            buf.values(j) = doubleCombine(buf.values(j), getDouble(arr, j))
          j += 1
        }
      }
    }
    buf
  }

  private def getLong(arr: ArrayData, i: Int): Long = elemType match {
    case ByteType => arr.getByte(i).toLong
    case ShortType => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case LongType => arr.getLong(i)
    case t => throw new IllegalStateException(t.toString)
  }

  private def getDouble(arr: ArrayData, i: Int): Double = elemType match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case t => throw new IllegalStateException(t.toString)
  }

  override def merge(a: ArrayReduceBuffer, b: ArrayReduceBuffer): ArrayReduceBuffer = {
    if (integral) {
      if (a.longs == null) a.longs = b.longs
      else if (b.longs != null) {
        val m = math.min(a.longs.length, b.longs.length)
        var j = 0
        while (j < m) { a.longs(j) = longCombine(a.longs(j), b.longs(j)); j += 1 }
      }
    } else {
      if (a.values == null) a.values = b.values
      else if (b.values != null) {
        val m = math.min(a.values.length, b.values.length)
        var j = 0
        while (j < m) { a.values(j) = doubleCombine(a.values(j), b.values(j)); j += 1 }
      }
    }
    a
  }

  /** Empty aggregate → empty array, never null (src/monoid.rs:405-411). */
  override def eval(buf: ArrayReduceBuffer): Any =
    if (integral) {
      val vs = if (buf.longs == null) Array.empty[Long] else buf.longs
      elemType match {
        case ByteType => new GenericArrayData(vs.map(_.toByte))
        case ShortType => new GenericArrayData(vs.map(_.toShort))
        case IntegerType => new GenericArrayData(vs.map(_.toInt))
        case _ => new GenericArrayData(vs)
      }
    } else {
      val vs = if (buf.values == null) Array.empty[Double] else buf.values
      elemType match {
        case FloatType => new GenericArrayData(vs.map(_.toFloat))
        case _ => new GenericArrayData(vs)
      }
    }

  override def serialize(buf: ArrayReduceBuffer): Array[Byte] = {
    val (len, put): (Int, ByteBuffer => Unit) =
      if (integral) {
        val vs = buf.longs
        if (vs == null) return Array.emptyByteArray
        (vs.length, bb => vs.foreach(bb.putLong))
      } else {
        val vs = buf.values
        if (vs == null) return Array.emptyByteArray
        (vs.length, bb => vs.foreach(bb.putDouble))
      }
    val bb = ByteBuffer.allocate(len * 8)
    put(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayReduceBuffer = {
    if (bytes.isEmpty) return createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val n = bytes.length / 8
    if (integral) {
      val vs = new Array[Long](n)
      var i = 0
      while (i < n) { vs(i) = bb.getLong(); i += 1 }
      new ArrayReduceBuffer(null, vs)
    } else {
      val vs = new Array[Double](n)
      var i = 0
      while (i < n) { vs(i) = bb.getDouble(); i += 1 }
      new ArrayReduceBuffer(vs, null)
    }
  }

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false

  // reject unsupported input types at ANALYSIS time on the driver — without
  // this the lazy `integral` throws from update() inside every executor
  // task (job fails mid-run with retries instead of an AnalysisException)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<numeric> " +
            s"(byte/short/int/long/float/double elements), got ${t.sql}")
    }
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = s"array_reduce_${opName}_native"

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayReduceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayReduceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ArrayReduceAgg {

  /** The four reference ops (monoid.rs:85-221), shared by [[register]] and
    * [[graft.GraftExtensions]].
    */
  val ops: Seq[String] = Seq("sum", "product", "max", "min")

  /** Column API: `ArrayReduceAgg.arrayReduce("sum", $"arrays")`. */
  def arrayReduce(op: String, c: Column): Column =
    GraftShim.column(
      ArrayReduceAgg(GraftShim.expression(c), op).toAggregateExpression())

  /** Register SQL names `array_reduce_{op}_native(array)` — element type is
    * inferred from the argument at analysis time.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ops.foreach { op =>
      GraftShim.registerFunction(spark, s"array_reduce_${op}_native",
        exprs => ArrayReduceAgg(exprs.head, op).toAggregateExpression())
    }
}
