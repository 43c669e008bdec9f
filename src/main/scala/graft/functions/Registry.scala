package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** SQL registration for the engine's function surface (SURVEY §2.13): the
  * safe-coercion library and the custom vector expressions become callable
  * from `spark.sql(...)` text, not just the Column API.
  *
  * Builders emit plain Catalyst trees (RuntimeReplaceable-style desugaring
  * to built-ins + our expressions): Catalyst sees only ordinary expressions,
  * so codegen and pushdown are unaffected.
  */
object Registry {

  /** safe_bool desugars to the same when-chain as SafeCasts.safeBool. */
  private def safeBool(e: Expression): Expression =
    CaseWhen(Seq(
      (IsNull(e), Literal.create(null, BooleanType)),
      (In(Lower(Cast(e, StringType)),
        Seq(Literal("true"), Literal("1"), Literal("yes"))), Literal(true))),
      Literal(false))

  private def tryCast(e: Expression, to: DataType): Expression =
    Cast(e, to, None, EvalMode.TRY)

  private def dot(a: Expression, b: Expression): Expression =
    VectorExprs.DotProduct(a, b)

  private def cosine(a: Expression, b: Expression): Expression =
    Divide(dot(a, b), Multiply(Sqrt(dot(a, a)), Sqrt(dot(b, b))))

  private def secondsBetween(a: Expression, b: Expression): Expression =
    Round(Divide(Cast(Subtract(UnixMicros(Cast(b, TimestampType)),
      UnixMicros(Cast(a, TimestampType))), DoubleType), Literal(1e6)),
      Literal(3))

  private def minutesBetween(a: Expression, b: Expression): Expression =
    Round(Divide(Cast(Subtract(UnixSeconds(Cast(b, TimestampType)),
      UnixSeconds(Cast(a, TimestampType))), DoubleType), Literal(60.0)),
      Literal(2))

  /** Foldable integer literal or a loud error — sketch/heap parameters
    * size buffers at PLANNING time, so they cannot be data-dependent. */
  private def foldInt(e: Expression, what: String): Int =
    (if (e.foldable) e.eval() else null) match {
      case i: Number => i.intValue()
      case _ => throw new IllegalArgumentException(
        s"$what must be a foldable integer literal")
    }

  private def foldDouble(e: Expression, what: String): Double =
    (if (e.foldable) e.eval() else null) match {
      case n: Number => n.doubleValue()
      // SQL `0.01` parses as a DECIMAL literal → Spark Decimal, not Number
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case _ => throw new IllegalArgumentException(
        s"$what must be a foldable numeric literal")
    }

  /** The engine's SQL function surface, shared by the per-session
    * registration below and the SparkSessionExtensions path
    * ([[graft.GraftExtensions]]). Aggregates register as their raw
    * AggregateFunction — the analyzer wraps them exactly as it does the
    * built-in ones, so `SELECT topk_rows(v, id, 3) ... GROUP BY g` works
    * from SQL text. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "topk_rows" -> (es => SketchAggs.TopKRowsAgg(
      Cast(es.head, DoubleType), Cast(es(1), StringType),
      foldInt(es(2), "topk_rows k"))),
    "topk_freq" -> (es => SketchAggs.SpaceSavingTopK(es.head,
      foldInt(es(1), "topk_freq capacity"))),
    "cm_sketch" -> (es => SketchAggs.CountMinAgg(es.head,
      foldInt(es(1), "cm_sketch depth"), foldInt(es(2), "cm_sketch width"))),
    "bloom_agg" -> (es => SketchAggs.BloomAgg(es.head,
      foldInt(es(1), "bloom_agg expectedItems").toLong,
      foldDouble(es(2), "bloom_agg fpp"))),
    "kll_sketch" -> (es => SketchAggs.KllSketchAgg(
      Cast(es.head, DoubleType), foldInt(es(1), "kll_sketch k"))),
    "kll_quantile" -> (es => SketchAggs.KllQuantileExpr(es.head, es(1))),
    "theta_sketch" -> (es => SketchAggs.ThetaSketchAgg(es.head,
      foldInt(es(1), "theta_sketch lgK"))),
    "safe_bool" -> (es => safeBool(es.head)),
    "safe_numeric" -> (es => tryCast(es.head, DoubleType)),
    "safe_long" -> (es => tryCast(es.head, LongType)),
    "duration_minutes" -> (es => minutesBetween(es.head, es(1))),
    "duration_seconds" -> (es => secondsBetween(es.head, es(1))),
    "dot_product" -> (es => dot(es.head, es(1))),
    "long_array_agree" -> (es => VectorExprs.LongArrayAgree(es.head, es(1))),
    "cosine_sim" -> (es => cosine(es.head, es(1))),
    "word_ngrams" -> (es => {
      val nArg = if (es(1).foldable) es(1).eval() else null
      nArg match {
        case i: Number => TextExprs.WordNGrams(es.head, i.intValue())
        case _ => throw new IllegalArgumentException(
          "word_ngrams(text, n): n must be a foldable integer literal")
      }
    }))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
