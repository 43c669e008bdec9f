package graft.model

import org.apache.spark.sql.types._

/** The reference's target star schema (SURVEY §1.1-1.2), re-typed per the
  * §1.2 mapping table: UUID→string, VARCHAR/TEXT→string, TIMESTAMP→timestamp
  * (UTC session), NUMERIC→double, NUMERIC(10,x)→decimal, JSONB→string,
  * BIGSERIAL surrogate→long. Full DDL source: setup_target.py:11-242.
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  /** dim_scenario (setup_target.py:37-80): 1 row per scenario, M1 target. */
  val dimScenario: StructType = StructType(Seq(
    f("scenario_id", StringType, nullable = false),
    f("scenario_name", StringType), f("scenario_status", StringType),
    f("is_starter", BooleanType), f("model_id", StringType),
    f("model_name", StringType), f("scenario_start_year", IntegerType),
    f("forecast_cycle_id", StringType), f("forecast_cycle_name", StringType),
    f("created_at", TimestampType), f("updated_at", TimestampType),
    f("submitted_at", TimestampType), f("locked_at", TimestampType),
    f("withdraw_at", TimestampType),
    f("etl_created_at", TimestampType), f("etl_updated_at", TimestampType)))

  /** fact_scenario_timeline (setup_target.py:86-103): M4 event-log target;
    * the 10-column shape of the UNION ALL (extract.py:278-288). */
  val factScenarioTimeline: StructType = StructType(Seq(
    f("source_key", StringType, nullable = false),
    f("event_type", StringType), f("event_category", StringType),
    f("event_time", TimestampType),
    f("actor", StringType), f("description", StringType),
    f("run_id", StringType), f("node_name", StringType),
    f("event_type_name", StringType), f("scenario_id", StringType),
    f("event_date", DateType), // partition column (Bootstrap.partitioning)
    f("etl_created_at", TimestampType)))

  /** fact_node_input_history (setup_target.py:113-153): M2 SCD2 target. */
  val factNodeInputHistory: StructType = StructType(Seq(
    f("source_id", StringType, nullable = false),
    f("scenario_id", StringType), f("model_node_id", StringType),
    f("node_name", StringType), f("group_name", StringType),
    f("tab_name", StringType),
    f("inp_value", DoubleType), f("inp_unit", StringType),
    f("inp_start_year", LongType), f("inp_end_year", LongType),
    f("inp_input_type", StringType), f("inp_timeframe", StringType),
    f("inp_dosing_type", StringType), f("inp_actuals_flag", BooleanType),
    f("inp_curve_type", StringType), f("inp_selected_output", StringType),
    f("inp_pfs_flag", BooleanType), f("inp_ppc_flag", BooleanType),
    f("input_full_text", StringType),
    f("input_validated", BooleanType), f("input_validation_message", StringType),
    f("version_started_at", TimestampType), f("version_ended_at", TimestampType),
    f("is_current_version", BooleanType),
    f("etl_created_at", TimestampType), f("etl_updated_at", TimestampType)))

  /** fact_run_summary (setup_target.py:163-181): M1 target, A1-A4 rollup. */
  val factRunSummary: StructType = StructType(Seq(
    f("run_id", StringType, nullable = false),
    f("scenario_id", StringType), f("run_status", StringType),
    f("run_at", TimestampType), f("run_complete_at", TimestampType),
    f("run_duration_minutes", DecimalType(10, 2)), f("fail_reason", StringType),
    f("n_branches", LongType), f("n_calcs", LongType),
    f("n_success", LongType), f("n_failed", LongType), f("n_timeout", LongType),
    f("etl_created_at", TimestampType), f("etl_updated_at", TimestampType)))

  /** fact_node_calc_results (setup_target.py:188-205): M3 target. */
  val factNodeCalcResults: StructType = StructType(Seq(
    f("source_id", StringType, nullable = false),
    f("run_id", StringType), f("scenario_id", StringType),
    f("model_node_id", StringType), f("node_name", StringType),
    f("calc_status", StringType), f("output_data_text", StringType),
    f("processing_duration_s", DecimalType(10, 3)),
    f("etl_created_at", TimestampType)))

  /** fact_event_input_history (setup_target.py:211-238): M2 target. */
  val factEventInputHistory: StructType = StructType(Seq(
    f("source_id", StringType, nullable = false),
    f("scenario_id", StringType), f("event_type_name", StringType),
    f("population_node", StringType), f("parent_product_node", StringType),
    f("evt_year", LongType), f("evt_share_value", DoubleType),
    f("evt_entry_quarter", StringType), f("evt_erosion_rate", DoubleType),
    f("evt_launch_date", StringType), f("evt_steady_state", BooleanType),
    f("evt_sob_value", DoubleType), f("event_full_text", StringType),
    f("event_shares_overridden_text", StringType),
    f("version_started_at", TimestampType), f("version_ended_at", TimestampType),
    f("is_current_version", BooleanType),
    f("etl_created_at", TimestampType), f("etl_updated_at", TimestampType)))

  /** All seven targets, keyed by table name (etl_watermark is
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
