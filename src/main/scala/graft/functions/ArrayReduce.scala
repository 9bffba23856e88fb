package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{SparkSession, functions}

import scala.reflect.ClassTag
import scala.reflect.runtime.universe.TypeTag

/** Factories + session registration for the `array_reduce_*` UDAF family.
  *
  * Mirrors the reference's factory surface (reference `src/monoid.rs:472-526`):
  * Int32-pinned defaults `array_reduce_{sum,product,max,min}` ("backward
  * compatibility", `src/monoid.rs:472-489`) plus per-type generic
  * constructors (`array_reduce_*_generic::<T>`, `src/monoid.rs:492-526`) —
  * here exposed as type-suffixed SQL names, e.g. `array_reduce_sum_float`,
  * since Spark SQL resolves UDAFs by name only.
  *
  * `registerAll` is the analogue of `ctx.register_udaf(...)`
  * (`src/monoid.rs:542`): it puts every instantiation into the session's
  * function registry so `spark.sql("SELECT array_reduce_sum(arrays) ...")`
  * resolves.
  */
object ArrayReduce {

  /** Generic factory, ≈ `array_reduce_{op}_generic::<T>()` (src/monoid.rs:492-526). */
  def of[T](m: Monoid[T])(implicit tt: TypeTag[T], ct: ClassTag[T]): UserDefinedFunction =
    functions.udaf(new ArrayMonoidReduce[T](m))

  // Int32 defaults (reference src/monoid.rs:472-489)
  def sum: UserDefinedFunction = of(Monoid.sumInt)
  def product: UserDefinedFunction = of(Monoid.productInt)
  def max: UserDefinedFunction = of(Monoid.maxInt)
  def min: UserDefinedFunction = of(Monoid.minInt)

  /** All (op × element-type) instantiations keyed by SQL function name. */
  def all: Seq[(String, UserDefinedFunction)] = {
    def family[T: TypeTag: ClassTag](suffix: String, s: Monoid[T], p: Monoid[T],
        mx: Monoid[T], mn: Monoid[T]): Seq[(String, UserDefinedFunction)] = Seq(
      s"array_reduce_sum_$suffix" -> of(s),
      s"array_reduce_product_$suffix" -> of(p),
      s"array_reduce_max_$suffix" -> of(mx),
      s"array_reduce_min_$suffix" -> of(mn),
    )
    import Monoid._
    Seq(
      // un-suffixed names are the Int32 defaults, as in the reference
      "array_reduce_sum" -> sum,
      "array_reduce_product" -> product,
      "array_reduce_max" -> max,
      "array_reduce_min" -> min,
    ) ++
      family[Byte]("byte", sumByte, productByte, maxByte, minByte) ++
      family[Short]("short", sumShort, productShort, maxShort, minShort) ++
      family[Int]("int", sumInt, productInt, maxInt, minInt) ++
      family[Long]("long", sumLong, productLong, maxLong, minLong) ++
      family[Float]("float", sumFloat, productFloat, maxFloat, minFloat) ++
      family[Double]("double", sumDouble, productDouble, maxDouble, minDouble) ++
      // unsigned emulation over signed/decimal carriers — all of u8-u64
      family[Int]("u8", sumU8, productU8, maxU8, minU8) ++
      family[Int]("u16", sumU16, productU16, maxU16, minU16) ++
      family[Long]("u32", sumU32, productU32, maxU32, minU32) ++
      family[BigDecimal]("u64", sumU64, productU64, maxU64, minU64)
  }

  /** Idempotent session-wide registration of the whole family. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, udf) => spark.udf.register(name, udf) }
}
