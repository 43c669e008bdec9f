package graft.model

import org.apache.spark.sql.types._

/** The reference's target star schema at full column fidelity (SURVEY §1.1,
  * DDL setup_target.py:35-240), re-typed per the §1.2 mapping: UUID→string,
  * VARCHAR/TEXT→string, TIMESTAMP→timestamp (UTC session), NUMERIC→double,
  * NUMERIC(10,x)→decimal, JSONB→string, INT→int.
  *
  * Deliberate deltas, both documented: the BIGSERIAL surrogate `id` columns
  * are dropped (Spark storage has no identity column; the natural keys
  * source_id/source_key/run_id are the physical dedup keys, as in the
  * reference's UNIQUE constraints), and the timeline gains an `event_date`
  * partition column (the reference's indexes become partition pruning).
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  /** dim_scenario (setup_target.py:37-80): one row per scenario, M1 target. */
  val dimScenario: StructType = StructType(Seq(
    f("scenario_id", StringType, nullable = false),
    f("scenario_display_name", StringType), f("scenario_status", StringType),
    f("is_starter", BooleanType),
    f("currency", StringType), f("currency_code", StringType),
    f("scenario_start_year", IntegerType), f("scenario_end_year", IntegerType),
    f("scenario_region_name", StringType), f("scenario_country_name", StringType),
    f("created_at", TimestampType), f("created_by", StringType),
    f("submitted_at", TimestampType), f("submitted_by", StringType),
    f("locked_at", TimestampType), f("locked_by", StringType),
    f("updated_at", TimestampType), f("updated_by", StringType),
    f("withdraw_at", TimestampType), f("withdraw_by", StringType),
    f("delete_at", TimestampType),
    f("model_id", StringType), f("model_display_name", StringType),
    f("model_type", StringType), f("model_publish_level", StringType),
    f("therapeutic_area_name", StringType), f("disease_area_name", StringType),
    f("loe_enabled", BooleanType),
    f("model_region_name", StringType), f("model_country_name", StringType),
    f("forecast_cycle_name", StringType),
    f("forecast_cycle_start", TimestampType), f("forecast_cycle_end", TimestampType),
    f("horizon_start_limit", IntegerType), f("horizon_end_limit", IntegerType),
    f("starter_created", BooleanType),
    f("etl_loaded_at", TimestampType), f("etl_updated_at", TimestampType)))

  /** Mutable subset under M1 conflict (load.py:33-44). */
  val dimScenarioMutable: Seq[String] = Seq(
    "scenario_status", "submitted_at", "submitted_by", "locked_at", "locked_by",
    "updated_at", "updated_by", "withdraw_at", "withdraw_by", "delete_at",
    "etl_updated_at")

  /** fact_scenario_timeline (setup_target.py:86-103): M4 event-log target. */
  val factScenarioTimeline: StructType = StructType(Seq(
    f("scenario_id", StringType),
    f("event_time", TimestampType),
    f("event_type", StringType), f("event_category", StringType),
    f("actor", StringType), f("description", StringType),
    f("run_id", StringType), f("node_name", StringType),
    f("event_type_name", StringType),
    f("source_key", StringType, nullable = false),
    f("event_date", DateType), // engine partition column
    f("etl_loaded_at", TimestampType)))

  /** fact_node_input_history (setup_target.py:113-153): M2 SCD2 target. */
  val factNodeInputHistory: StructType = StructType(Seq(
    f("source_id", StringType, nullable = false),
    f("scenario_id", StringType), f("model_node_id", StringType),
    f("node_display_name", StringType), f("node_type", StringType),
    f("tab_name", StringType), f("tab_level", IntegerType),
    f("group_name", StringType), f("group_type", StringType),
    f("node_seq", IntegerType), f("flow", StringType),
    f("version_started_at", TimestampType), f("version_ended_at", TimestampType),
    f("is_current_version", BooleanType),
    f("edited_by", StringType), f("input_hash", StringType),
    f("input_validated", BooleanType), f("validation_message", StringType),
    f("data_source", StringType),
    f("inp_value", DoubleType), f("inp_unit", StringType),
    f("inp_start_year", IntegerType), f("inp_end_year", IntegerType),
    f("inp_input_type", StringType), f("inp_timeframe", StringType),
    f("inp_dosing_type", StringType), f("inp_actuals_flag", BooleanType),
    f("inp_curve_type", StringType), f("inp_selected_output", StringType),
    f("inp_pfs_flag", BooleanType), f("inp_ppc_flag", BooleanType),
    f("input_data_full_text", StringType),
    f("etl_loaded_at", TimestampType)))

  /** Mutable subset under M2 conflict (load.py:74-80). */
  val nodeHistoryMutable: Seq[String] = Seq(
    "version_ended_at", "is_current_version", "input_validated",
    "validation_message", "etl_loaded_at")

  /** fact_run_summary (setup_target.py:163-181): M1 target, A1-A4 rollup. */
  val factRunSummary: StructType = StructType(Seq(
    f("run_id", StringType, nullable = false),
    f("scenario_id", StringType), f("run_status", StringType),
    f("run_at", TimestampType), f("run_by", StringType),
    f("run_complete_at", TimestampType),
    f("run_duration_minutes", DecimalType(10, 2)), f("fail_reason", StringType),
    f("branch_count", IntegerType), f("total_nodes_processed", IntegerType),
    f("nodes_success", IntegerType), f("nodes_failed", IntegerType),
    f("nodes_timeout", IntegerType),
    f("node_edits_since_prev_run", IntegerType),
    f("event_edits_since_prev_run", IntegerType),
    f("etl_loaded_at", TimestampType), f("etl_updated_at", TimestampType)))

  /** Mutable subset under M1 conflict (load.py:101-111). */
  val runSummaryMutable: Seq[String] = Seq(
    "run_status", "run_complete_at", "run_duration_minutes", "fail_reason",
    "branch_count", "total_nodes_processed", "nodes_success", "nodes_failed",
    "nodes_timeout", "etl_updated_at")

  /** fact_node_calc_results (setup_target.py:188-205): M3 target. */
  val factNodeCalcResults: StructType = StructType(Seq(
    f("source_id", StringType, nullable = false),
    f("run_id", StringType), f("scenario_id", StringType),
    f("branch_id", StringType), f("event_tag", StringType),
    f("model_node_id", StringType),
    f("node_display_name", StringType), f("node_type", StringType),
    f("calc_status", StringType), f("fail_reason", StringType),
    f("processing_start_at", TimestampType), f("processing_end_at", TimestampType),
    f("processing_duration_s", DecimalType(10, 3)),
    f("output_data_text", StringType),
    f("etl_loaded_at", TimestampType)))

  /** fact_event_input_history (setup_target.py:211-238): M2 target. */
  val factEventInputHistory: StructType = StructType(Seq(
    f("source_id", StringType, nullable = false),
    f("scenario_id", StringType), f("event_type_name", StringType),
    f("is_inherent", BooleanType),
    f("population_node_name", StringType), f("parent_product_name", StringType),
    f("version_started_at", TimestampType), f("version_ended_at", TimestampType),
    f("is_current_version", BooleanType),
    f("edited_by", StringType), f("event_data_hash", StringType),
    f("is_overridden", BooleanType), f("override_data_text", StringType),
    f("is_validated", BooleanType), f("validation_message", StringType),
    f("evt_year", IntegerType), f("evt_share_value", DoubleType),
    f("evt_entry_quarter", StringType), f("evt_erosion_rate", DoubleType),
    f("evt_launch_date", StringType),
    f("evt_steady_state", DoubleType), // NUMERIC in DDL; safe_numeric coercion
    f("evt_sob_value", DoubleType),
    f("event_data_full_text", StringType),
    f("etl_loaded_at", TimestampType)))

  /** Mutable subset under M2 conflict (load.py:157-163). */
  val eventHistoryMutable: Seq[String] = Seq(
    "version_ended_at", "is_current_version", "is_validated",
    "validation_message", "etl_loaded_at")

  /** All six targets, keyed by table name (etl_watermark is
    * WatermarkStore.schema). */
  val targets: Map[String, StructType] = Map(
    "dim_scenario" -> dimScenario,
    "fact_scenario_timeline" -> factScenarioTimeline,
    "fact_node_input_history" -> factNodeInputHistory,
    "fact_run_summary" -> factRunSummary,
    "fact_node_calc_results" -> factNodeCalcResults,
    "fact_event_input_history" -> factEventInputHistory)

  /** JSON struct schemas for the two configured flatten key lists (all
    * string-typed; coercion happens per-key in JsonFlatten). */
  val inputDataJson: StructType = StructType(
    graft.functions.JsonFlatten.inputDataKeys.map(k => f(k.key, StringType)))
  val eventDataJson: StructType = StructType(
    graft.functions.JsonFlatten.eventDataKeys.map(k => f(k.key, StringType)))
}
