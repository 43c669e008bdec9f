package graft

import org.apache.spark.sql.functions._
import graft.functions.JsonFlatten
import graft.functions.JsonFlatten._

/** JSONB-flattening semantics (SURVEY §2.9 C12-C14, FIXTURES.md B.2):
  * coercion edge cases, missing/extra keys, malformed JSON, raw retention. */
class JsonFlattenSpec extends SparkTestBase {
  import spark.implicits._

  private val keys = Seq(
    KeySpec("value", AsDouble), KeySpec("start_year", AsLong),
    KeySpec("actuals_flag", AsBool), KeySpec("unit", AsString))

  test("flatten: typed extraction with permissive per-key coercion") {
    val df = Seq(
      """{"value": "3.5", "start_year": 2024, "actuals_flag": "yes", "unit": "mg"}""")
      .toDF("j")
    val r = JsonFlatten.flatten(df, "j", keys).collect()(0)
    assert(r.getAs[Double]("value") == 3.5)        // numeric-as-string
    assert(r.getAs[Long]("start_year") == 2024L)
    assert(r.getAs[Boolean]("actuals_flag"))       // "yes" -> true
    assert(r.getAs[String]("unit") == "mg")
  }

  test("missing keys -> null; unknown keys survive only in raw full_text") {
    val raw = """{"value": 1, "mystery": 99}"""
    val r = JsonFlatten.flatten(Seq(raw).toDF("j"), "j", keys).collect()(0)
    assert(r.getAs[Any]("start_year") == null)
    assert(r.getAs[Any]("unit") == null)
    assert(r.getAs[String]("full_text") == raw)    // original string, untouched
    assert(!r.schema.fieldNames.contains("mystery"))
  }

  test("malformed / non-object JSON -> all typed fields null (matches except->{} )") {
    val df = Seq("""not json at all""", """[1,2,3]""").toDF("j")
    val rows = JsonFlatten.flatten(df, "j", keys).collect()
    rows.foreach { r =>
      assert(r.getAs[Any]("value") == null)
      assert(r.getAs[Any]("actuals_flag") == null)
    }
  }

  test("bool-ish coercions on JSON values: '1'->true, '0'->false, 'True'->true") {
    val df = Seq(
      """{"actuals_flag": "1"}""", """{"actuals_flag": "0"}""",
      """{"actuals_flag": "True"}""").toDF("j")
    val got = JsonFlatten.flatten(df, "j", keys)
      .select("actuals_flag").as[Option[Boolean]].collect()
    assert(got.toSeq == Seq(Some(true), Some(false), Some(true)))
  }

  test("reference key lists are complete (config.py:34-45)") {
    assert(JsonFlatten.inputDataKeys.map(_.key) == Seq("value", "unit",
      "start_year", "end_year", "input_type", "timeframe", "dosing_type",
      "actuals_flag", "curve_type", "selected_output", "pfs_flag", "ppc_flag"))
    assert(JsonFlatten.eventDataKeys.map(_.key) == Seq("year", "share_value",
      "entry_quarter", "erosion_rate", "launch_date", "steady_state", "sob_value"))
  }
}
