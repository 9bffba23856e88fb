package graft.functions

/** A monoid: a binary associative operator with an identity element.
  *
  * Mirrors the reference's `MonoidOp` trait (reference `src/monoid.rs:23-32`):
  * `identity()`, `combine(a, b)`, `name()`. Associativity is the contract that
  * makes distributed (partial → shuffle → final) aggregation correct; it is
  * property-tested in `MonoidLawsSpec`.
  *
  * The reference supports 10 Arrow primitive types (`src/monoid.rs:34-37`),
  * including unsigned ints. The JVM/Spark type system has no unsigned
  * primitives, so the supported surface here is the 6 signed/float types:
  * Byte, Short, Int, Long, Float, Double (documented deviation, SURVEY.md §7).
  */
trait Monoid[T] extends Serializable {
  def identity: T
  def combine(a: T, b: T): T
  /** Short op name used to build the SQL function name `array_reduce_{name}`. */
  def name: String
}

/** Instances mirroring the reference's op × type matrix
  * (reference `src/monoid.rs:85-221`):
  *   - sum: identity 0, integers saturate (`saturating_add`), floats plain `+`
  *   - product: identity 1, integers saturate (`saturating_mul`), floats `*`
  *   - max: identity = type minimum (floats: -Infinity)
  *   - min: identity = type maximum (floats: +Infinity)
  *
  * The JVM has no saturating arithmetic, so integer ops widen to Long (or use
  * `Math.*Exact` for Long itself) and clamp to the type bounds — semantics
  * match Rust's `saturating_add`/`saturating_mul` exactly at the bounds.
  */
object Monoid {

  @inline private def clampByte(v: Long): Byte =
    if (v > Byte.MaxValue) Byte.MaxValue
    else if (v < Byte.MinValue) Byte.MinValue
    else v.toByte

  @inline private def clampShort(v: Long): Short =
    if (v > Short.MaxValue) Short.MaxValue
    else if (v < Short.MinValue) Short.MinValue
    else v.toShort

  @inline private def clampInt(v: Long): Int =
    if (v > Int.MaxValue) Int.MaxValue
    else if (v < Int.MinValue) Int.MinValue
    else v.toInt

  @inline private[functions] def satAddLong(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch {
      case _: ArithmeticException =>
        if (a > 0) Long.MaxValue else Long.MinValue
    }

  @inline private[functions] def satMulLong(a: Long, b: Long): Long =
    try Math.multiplyExact(a, b)
    catch {
      case _: ArithmeticException =>
        // overflow: result sign = sign(a) xor sign(b) (neither is 0 here)
        if ((a > 0) == (b > 0)) Long.MaxValue else Long.MinValue
    }

  private def inst[T](id: T, nm: String)(f: (T, T) => T): Monoid[T] =
    new Monoid[T] {
      val identity: T = id
      def combine(a: T, b: T): T = f(a, b)
      val name: String = nm
    }

  // --- sum (reference src/monoid.rs:85-103) ---
  val sumByte: Monoid[Byte] = inst[Byte](0, "sum")((a, b) => clampByte(a.toLong + b.toLong))
  val sumShort: Monoid[Short] = inst[Short](0, "sum")((a, b) => clampShort(a.toLong + b.toLong))
  val sumInt: Monoid[Int] = inst[Int](0, "sum")((a, b) => clampInt(a.toLong + b.toLong))
  val sumLong: Monoid[Long] = inst[Long](0L, "sum")(satAddLong)
  val sumFloat: Monoid[Float] = inst[Float](0.0f, "sum")(_ + _)
  val sumDouble: Monoid[Double] = inst[Double](0.0, "sum")(_ + _)

  // --- product (reference src/monoid.rs:105-155) ---
  val productByte: Monoid[Byte] = inst[Byte](1, "product")((a, b) => clampByte(a.toLong * b.toLong))
  val productShort: Monoid[Short] = inst[Short](1, "product")((a, b) => clampShort(a.toLong * b.toLong))
  val productInt: Monoid[Int] = inst[Int](1, "product")((a, b) => clampInt(a.toLong * b.toLong))
  val productLong: Monoid[Long] = inst[Long](1L, "product")(satMulLong)
  val productFloat: Monoid[Float] = inst[Float](1.0f, "product")(_ * _)
  val productDouble: Monoid[Double] = inst[Double](1.0, "product")(_ * _)

  // --- max (reference src/monoid.rs:157-188; float identity -Inf) ---
  val maxByte: Monoid[Byte] = inst[Byte](Byte.MinValue, "max")((a, b) => if (a >= b) a else b)
  val maxShort: Monoid[Short] = inst[Short](Short.MinValue, "max")((a, b) => if (a >= b) a else b)
  val maxInt: Monoid[Int] = inst[Int](Int.MinValue, "max")(math.max)
  val maxLong: Monoid[Long] = inst[Long](Long.MinValue, "max")(math.max)
  val maxFloat: Monoid[Float] = inst[Float](Float.NegativeInfinity, "max")(math.max)
  val maxDouble: Monoid[Double] = inst[Double](Double.NegativeInfinity, "max")(math.max)

  // --- unsigned emulation (reference src/monoid.rs supports u8-u64; the
  // JVM has no unsigned primitives, so u8/u16 ride on Int and u32 on Long
  // with clamping to [0, maxU] — matching Rust's unsigned saturating_add/mul
  // exactly. u64 rides on BigDecimal (→ Spark DecimalType) below — exact,
  // off the primitive fast path, completing all 10 reference types. ---
  @inline private def clampU(max: Long)(v: Long): Long =
    if (v > max) max else if (v < 0L) 0L else v
  private def uIntInst(max: Long, id: Long, nm: String)(f: (Long, Long) => Long): Monoid[Int] =
    inst[Int](id.toInt, nm)((a, b) => clampU(max)(f(a.toLong, b.toLong)).toInt)

  val sumU8: Monoid[Int] = uIntInst(255L, 0L, "sum")(_ + _)
  val sumU16: Monoid[Int] = uIntInst(65535L, 0L, "sum")(_ + _)
  val sumU32: Monoid[Long] = inst[Long](0L, "sum")((a, b) => clampU(4294967295L)(a + b))
  val productU8: Monoid[Int] = uIntInst(255L, 1L, "product")(_ * _)
  val productU16: Monoid[Int] = uIntInst(65535L, 1L, "product")(_ * _)
  val productU32: Monoid[Long] = inst[Long](1L, "product")((a, b) => clampU(4294967295L)(satMulLong(a, b)))
  val maxU8: Monoid[Int] = uIntInst(255L, 0L, "max")(math.max) // u8::MIN == 0
  val maxU16: Monoid[Int] = uIntInst(65535L, 0L, "max")(math.max)
  val maxU32: Monoid[Long] = inst[Long](0L, "max")(math.max)
  val minU8: Monoid[Int] = uIntInst(255L, 255L, "min")(math.min) // identity u8::MAX
  val minU16: Monoid[Int] = uIntInst(65535L, 65535L, "min")(math.min)
  val minU32: Monoid[Long] = inst[Long](4294967295L, "min")(math.min)

  // --- u64 on an exact BigDecimal carrier (Spark DecimalType(38,18):
  // 20 integral digits ≥ the 20 digits of u64::MAX). Clamp to
  // [0, 2^64-1] = Rust's unsigned saturating_add/mul. ---
  val maxU64Value: BigDecimal = BigDecimal("18446744073709551615")
  @inline private def clampU64(v: BigDecimal): BigDecimal =
    if (v > maxU64Value) maxU64Value else if (v < 0) BigDecimal(0) else v
  val sumU64: Monoid[BigDecimal] =
    inst[BigDecimal](BigDecimal(0), "sum")((a, b) => clampU64(a + b))
  val productU64: Monoid[BigDecimal] =
    inst[BigDecimal](BigDecimal(1), "product")((a, b) => clampU64(a * b))
  val maxU64: Monoid[BigDecimal] =
    inst[BigDecimal](BigDecimal(0), "max")((a, b) => if (a >= b) a else b)
  val minU64: Monoid[BigDecimal] =
    inst[BigDecimal](maxU64Value, "min")((a, b) => if (a <= b) a else b)

  // --- min (reference src/monoid.rs:190-221; float identity +Inf) ---
  val minByte: Monoid[Byte] = inst[Byte](Byte.MaxValue, "min")((a, b) => if (a <= b) a else b)
  val minShort: Monoid[Short] = inst[Short](Short.MaxValue, "min")((a, b) => if (a <= b) a else b)
  val minInt: Monoid[Int] = inst[Int](Int.MaxValue, "min")(math.min)
  val minLong: Monoid[Long] = inst[Long](Long.MaxValue, "min")(math.min)
  val minFloat: Monoid[Float] = inst[Float](Float.PositiveInfinity, "min")(math.min)
  val minDouble: Monoid[Double] = inst[Double](Double.PositiveInfinity, "min")(math.min)
}
