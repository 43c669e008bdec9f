package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONB-flattening with a *configured* key list and per-key permissive
  * coercion — the reference's `flatten_input_data`/`flatten_event_data`
  * (transform.py:50-104, key lists config.py:34-45; SURVEY §2.9 C12-C14).
  *
  * Design: one `from_json` into an all-string struct (single parse, codegen'd)
  * then per-field SafeCasts. Malformed JSON → null struct → all-null fields,
  * matching the reference's `except → {}`. The raw JSON string is carried
  * through unchanged as `<prefix>full_text` (SURVEY §2.12.g — higher fidelity
  * than re-serializing, and stable for hashing).
  */
object JsonFlatten {

  sealed trait Kind
  case object AsString extends Kind
  case object AsLong extends Kind
  case object AsDouble extends Kind
  case object AsBool extends Kind

  final case class KeySpec(key: String, kind: Kind, as: String) {
    def coerce(c: Column): Column = kind match {
      case AsString => c
      case AsLong   => SafeCasts.safeLong(c)
      case AsDouble => SafeCasts.safeNumeric(c)
      case AsBool   => SafeCasts.safeBool(c)
    }
  }
  object KeySpec {
    def apply(key: String, kind: Kind): KeySpec = KeySpec(key, kind, key)
  }

  /** The reference's INPUT_DATA_KEYS (config.py:34-38) with the coercion each
    * receives in transform.py:64-78. */
  val inputDataKeys: Seq[KeySpec] = Seq(
    KeySpec("value", AsDouble), KeySpec("unit", AsString),
    KeySpec("start_year", AsLong), KeySpec("end_year", AsLong),
    KeySpec("input_type", AsString), KeySpec("timeframe", AsString),
    KeySpec("dosing_type", AsString), KeySpec("actuals_flag", AsBool),
    KeySpec("curve_type", AsString), KeySpec("selected_output", AsString),
    KeySpec("pfs_flag", AsBool), KeySpec("ppc_flag", AsBool))

  /** The reference's EVENT_DATA_KEYS (config.py:42-45) with the coercions
    * of transform.py:96-103 — note steady_state is safe_NUMERIC there (the
    * target column is NUMERIC, setup_target.py:229), not a boolean. */
  val eventDataKeys: Seq[KeySpec] = Seq(
    KeySpec("year", AsLong), KeySpec("share_value", AsDouble),
    KeySpec("entry_quarter", AsString), KeySpec("erosion_rate", AsDouble),
    KeySpec("launch_date", AsString), KeySpec("steady_state", AsDouble),
    KeySpec("sob_value", AsDouble))

  /** Flatten `jsonCol` into one column per KeySpec plus the retained raw
    * text. Unknown keys are dropped from the typed projection but preserved
    * inside the raw string — exactly the reference's contract. */
  def flatten(df: DataFrame, jsonCol: String, keys: Seq[KeySpec],
              prefix: String = ""): DataFrame = {
    val schema = StructType(keys.map(k => StructField(k.key, StringType)))
    val parsed = from_json(col(jsonCol), schema)
    val typedCols = keys.map(k => k.coerce(parsed.getField(k.key)).as(prefix + k.as))
    val raw = col(jsonCol).as(prefix + "full_text")
    df.select(col("*") +: typedCols :+ raw: _*)
  }
}
