package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** gcd(a, b) — greatest common divisor of two longs (GlareDB
  * `functions/scalar/builtin/numeric/gcd.rs`; Spark has no built-in). */
case class Gcd(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "gcd"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = math.abs(a.asInstanceOf[Number].longValue())
    var y = math.abs(b.asInstanceOf[Number].longValue())
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** lcm(a, b) — least common multiple (numeric/lcm.rs). */
case class Lcm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "lcm"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = math.abs(a.asInstanceOf[Number].longValue())
    val y = math.abs(b.asInstanceOf[Number].longValue())
    if (x == 0 || y == 0) 0L
    else {
      var g = x; var h = y
      while (h != 0) { val t = g % h; g = h; h = t }
      x / g * y
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Function-name compatibility layer: registers the reference's function
  * surface (SURVEY.md §2.4/2.5) under GlareDB's names, so a query written
  * for the reference resolves unchanged. Aliases map to Spark built-in
  * expressions (codegen preserved); only gcd/lcm are new expressions.
  */
object GlareCompat {

  private def inf = Literal(Double.PositiveInfinity)
  private def ninf = Literal(Double.NegativeInfinity)
  private def dbl(e: Expression) = Cast(e, DoubleType)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    // string (string/strpos.rs, trim.rs, case.rs, ...)
    f("strpos")(es => StringLocate(es(1), es(0), Literal(1)))
    f("byte_length")(es => OctetLength(es.head))
    // nested types (list/list_extract.rs — 1-based, struct_funcs.rs)
    f("list_extract")(es => ElementAt(es(0), es(1)))
    f("list_value")(es => CreateArray(es))
    f("struct_extract")(es => UnresolvedExtractValue(es(0), es(1)))
    // datetime (datetime/epoch.rs:16,34)
    f("epoch")(es => SecondsToTimestamp(es.head))
    f("epoch_ms")(es => MillisToTimestamp(es.head))
    // numeric predicates (numeric/isfinite.rs family)
    f("isinf")(es =>
      Or(EqualTo(dbl(es.head), inf), EqualTo(dbl(es.head), ninf)))
    f("isfinite")(es =>
      Not(Or(IsNaN(dbl(es.head)),
        Or(EqualTo(dbl(es.head), inf), EqualTo(dbl(es.head), ninf)))))
    // spark-compat extension funcs (glaredb_ext_spark csc.rs)
    f("csc")(es => Divide(Literal(1.0), Sin(dbl(es.head))))
    f("cot")(es => Divide(Cos(dbl(es.head)), Sin(dbl(es.head))))
    // gcd/lcm (numeric/gcd.rs, lcm.rs)
    f("gcd")(es => Gcd(es(0), es(1)))
    f("lcm")(es => Lcm(es(0), es(1)))
    // explicit cast set (cast/builtin/to_primitive.rs:53-395)
    f("to_int8")(es => Cast(es.head, ByteType))
    f("to_int16")(es => Cast(es.head, ShortType))
    f("to_int32")(es => Cast(es.head, IntegerType))
    f("to_int64")(es => Cast(es.head, LongType))
    f("to_float32")(es => Cast(es.head, FloatType))
    f("to_float64")(es => Cast(es.head, DoubleType))
    f("to_boolean")(es => Cast(es.head, BooleanType))
    f("to_string")(es => Cast(es.head, StringType))
    f("to_binary")(es => Cast(es.head, BinaryType))
    f("to_date")(es => Cast(es.head, DateType))

    // generate_series(start, stop[, step]) — inclusive-stop table function
    // (reference functions/table/builtin/series.rs:19). Registered as a
    // real Spark TVF resolving to a Range logical node.
    val tvfReg = spark.sessionState.tableFunctionRegistry
    tvfReg.createOrReplaceTempFunction("generate_series", { es: Seq[Expression] =>
      def longOf(e: Expression): Long =
        e.eval().asInstanceOf[Number].longValue()
      val start = longOf(es(0))
      val stop = longOf(es(1))
      val step = if (es.length > 2) longOf(es(2)) else 1L
      // Range is exclusive of end; generate_series is inclusive
      val end = if (step > 0) stop + 1 else stop - 1
      org.apache.spark.sql.catalyst.plans.logical.Range(start, end, step, None)
    }, "built-in")
  }
}
