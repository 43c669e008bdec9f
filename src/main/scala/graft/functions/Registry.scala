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

  /** The engine's SQL function surface, shared by the per-session
    * registration below and the SparkSessionExtensions path
    * ([[graft.GraftExtensions]]). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
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
