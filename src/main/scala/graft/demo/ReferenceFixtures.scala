package graft.demo

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.ops.ScenarioSources

/** Reference-shaped synthetic source tables (FIXTURES.md §B): deterministic
  * (fixed seed), tiny, covering the semantics the pipeline must preserve —
  * versioned SCD2 chains, lifecycle timestamp progressions, childless runs,
  * JSON coercion edge cases, malformed JSON, self-join node roles — at the
  * reference's full source-column fidelity (extract.py:50-266).
  */
object ReferenceFixtures {

  def ts(day: Int, hour: Int = 0, min: Int = 0, sec: Int = 0, ms: Int = 0): Timestamp = {
    val t = Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:$min%02d:$sec%02d")
    t.setNanos(ms * 1000000)
    t
  }

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  def build(spark: SparkSession): ScenarioSources = {
    import spark.implicits._

    val fcModel = Seq(
      ("m1", "Oncology Model", "patient_based", "published", "Oncology",
        "Lung Cancer", true, "Global", "US"),
      ("m2", "Vaccines Model", "epi_based", "published", "Vaccines",
        "Influenza", false, "EU", "DE"),
      ("m3", "Rare Disease Model", "patient_based", "draft", "Rare Disease",
        "SMA", true, "Global", "JP"))
      .toDF("id", "model_display_name", "model_type", "model_publish_level",
        "therapeutic_area_name", "model_disease_area_name",
        "has_inherent_event", "model_region_display_name",
        "model_country_display_name")

    val fcForecastInit = Seq(
      ("fi1", "FC-2024-H1", ts(1), ts(15), 2024, 2040, true),
      ("fi2", "FC-2024-H2", ts(2), ts(16), 2025, 2045, false))
      .toDF("id", "forecast_cycle_display_name", "forecast_cycle_start_dt",
        "forecast_cycle_end_dt", "horizon_start_limit", "horizon_end_limit",
        "starter_created")

    val fcModelNodeTab = Seq(("t1", "Epidemiology", 1), ("t2", "Market Share", 2))
      .toDF("id", "tab_display_name", "tab_level")
    val fcModelNodeGroups = Seq(
      ("g1", "Population", "demographic", "t1"),
      ("g2", "Incidence", "epi", "t1"),
      ("g3", "Share", "commercial", "t2"))
      .toDF("id", "group_display_name", "group_type", "model_node_tab_id")
    val fcModelNode = (1 to 8).map(i =>
      (s"n$i", s"Node $i", if (i % 2 == 0) "input" else "calculated", i,
        if (i <= 4) "inflow" else "outflow",
        if (i <= 3) "g1" else if (i <= 5) "g2" else "g3"))
      .toDF("id", "node_display_name", "node_type", "node_seq", "flow",
        "model_node_group_id")

    // 20 scenarios, full lifecycle columns (extract.py:58-97)
    val scSchema = st(
      "id" -> StringType, "scenario_display_name" -> StringType,
      "status" -> StringType, "is_starter" -> BooleanType,
      "currency" -> StringType, "currency_code" -> StringType,
      "scenario_start_year" -> IntegerType, "scenario_end_year" -> IntegerType,
      "scenario_region_name" -> StringType, "scenario_country_name" -> StringType,
      "created_at" -> TimestampType, "created_by" -> StringType,
      "submitted_at" -> TimestampType, "submitted_by" -> StringType,
      "locked_at" -> TimestampType, "locked_by" -> StringType,
      "updated_at" -> TimestampType, "updated_by" -> StringType,
      "withdraw_at" -> TimestampType, "withdraw_by" -> StringType,
      "delete_at" -> TimestampType,
      "model_id" -> StringType, "forecast_init_id" -> StringType)
    val scRows: Seq[Row] = (1 to 20).map { i =>
      val created = ts(1 + i % 3, 8 + i % 6, i % 50)
      val submitted = if (i % 2 == 0) ts(4, 9, i % 50) else null
      val locked = if (i % 4 == 0) ts(5, 10, i % 50) else null
      val withdrawn = if (i % 10 == 0) ts(6, 11, i % 50) else null
      val status = if (withdrawn != null) "withdrawn" else if (locked != null) "locked"
        else if (submitted != null) "submitted" else "draft"
      Row(s"s$i", s"Scenario $i", status, i % 5 == 0,
        "US Dollar", "USD", 2024 + i % 3, 2035 + i % 5,
        if (i % 3 == 0) "Global" else "EU", if (i % 3 == 0) null else s"C${i % 4}",
        created, s"user${i % 4}",
        submitted, if (submitted != null) s"user${i % 4}" else null,
        locked, if (locked != null) "approver" else null,
        if (submitted != null) submitted else created,
        if (submitted != null) s"user${i % 4}" else null,
        withdrawn, if (withdrawn != null) "admin" else null,
        null,
        s"m${1 + i % 3}", s"fi${1 + i % 2}")
    }
    val fcScenario = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(scRows).asJava, scSchema)

    // versioned node inputs: chains of 1-3 versions; JSON edge cases
    val jsonVariants = Seq(
      """{"value": "3.5", "unit": "mg", "start_year": 2024, "actuals_flag": "yes"}""",
      """{"value": 12, "unit": "pct", "start_year": "2025", "actuals_flag": true, "extra_key": 1}""",
      """{"value": 7.25, "actuals_flag": "0", "pfs_flag": "1", "curve_type": "linear"}""",
      """not-valid-json""",
      """[1,2,3]""",
      """{"value": null, "unit": null}""")
    val nodeData = (for {
      si <- 1 to 20; ni <- 1 to 3
      versions = 1 + (si + ni) % 3
      v <- 1 to versions
    } yield {
      val id = s"nd-$si-$ni-$v"
      val created = ts(1 + (si + v) % 5, 12, (si * 7 + v) % 60)
      val endAt = if (v < versions) ts(1 + (si + v + 1) % 5, 12, (si * 7 + v + 1) % 60)
        else null
      (id, s"s$si", s"n${1 + (si + ni) % 8}", jsonVariants((si + ni + v) % jsonVariants.size),
        s"hash-$id", v % 2 == 0,
        if (v % 3 == 0) s"msg for $id" else null,
        "user_input", created, endAt, s"user${si % 4}")
    }).toDF("id", "scenario_id", "model_node_id", "input_data", "input_hash",
      "input_validated", "input_validation_message", "source", "created_at",
      "end_at", "created_by")

    // runs: some incomplete, some childless (no branches)
    val runs = (1 to 30).map { i =>
      val runAt = ts(2 + i % 6, 14, (i * 3) % 60, i % 60, (i * 37) % 1000)
      val complete = if (i % 5 != 0)
        ts(2 + i % 6, 14, (i * 3 + 2) % 60, (i * 11) % 60, (i * 53) % 1000)
      else null
      val status = if (complete == null) "running" else if (i % 7 == 0) "failed" else "success"
      (s"r$i", s"s${1 + i % 20}", status, runAt, s"user${i % 4}",
        complete, if (status == "failed") s"error $i" else null)
    }.toDF("id", "scenario_id", "run_status", "run_at", "run_by",
      "run_complete_at", "fail_reason")

    val branches = (for (i <- 1 to 30; b <- 1 to (i % 4)) yield
      (s"b$i-$b", s"r$i", s"tag$b")).toDF("id", "scenario_run_id", "event_tag")

    val calcs = (for {
      i <- 1 to 30; b <- 1 to (i % 4); c <- 1 to ((i + b) % 6)
    } yield {
      val start = ts(2 + i % 6, 14, (i * 3 + 1) % 60, c % 60, (c * 117) % 1000)
      val end = ts(2 + i % 6, 14, (i * 3 + 1) % 60, (c + 2) % 60, (c * 241) % 1000)
      val status = Seq("success", "success", "failed", "timeout")((i + c) % 4)
      (s"c$i-$b-$c", s"b$i-$b", s"n${1 + (i + c) % 8}", status,
        if (status == "failed") "calc blew up" else null,
        start, end, s"""{"result": ${i * 100 + c}}""", start)
    }).toDF("id", "scenario_run_branch_id", "model_node_id", "status",
      "fail_reason", "processing_start_at", "processing_end_at", "output_data",
      "created_at")

    val fcEventType = Seq(("et1", "LOE", true), ("et2", "Launch", false))
      .toDF("id", "display_name", "inherent")
    val fcScenarioEventType = (1 to 20).map(i =>
      (s"set$i", s"s$i", if (i % 2 == 0) "et1" else "et2"))
      .toDF("id", "scenario_id", "event_type_id")

    val eventJson = Seq(
      """{"year": 2026, "share_value": "0.35", "steady_state": "0.9"}""",
      """{"year": "2027", "share_value": 0.5, "erosion_rate": 0.8, "entry_quarter": "Q2"}""",
      """broken{""")
    val eventData = (for {
      si <- 1 to 20; v <- 1 to (1 + si % 2)
    } yield {
      val created = ts(3 + (si + v) % 4, 16, (si * 5 + v) % 60)
      val endAt = if (v < 1 + si % 2) ts(3 + (si + v + 1) % 4, 16, (si * 5 + v + 1) % 60)
        else null
      (s"ed-$si-$v", s"set$si", eventJson((si + v) % eventJson.size),
        s"ehash-$si-$v", si % 3 == 0,
        if (si % 3 == 0) s"""{"override": $si}""" else null,
        v % 2 == 1, null: String,
        if (si % 2 == 0) s"n${1 + si % 8}" else null,
        if (si % 4 == 0) s"n${1 + (si + 1) % 8}" else null,
        created, endAt, s"user${si % 4}")
    }).toDF("id", "scenario_event_type_id", "event_data", "event_data_hash",
      "is_overridden", "event_shares_overridden", "is_validated",
      "input_validation_message", "population_node_id", "parent_product_node_id",
      "created_at", "end_at", "created_by")

    ScenarioSources(fcScenario, fcModel, fcForecastInit, nodeData, fcModelNode,
      fcModelNodeGroups, fcModelNodeTab, runs, branches, calcs, eventData,
      fcScenarioEventType, fcEventType)
  }

  /** Fixed location the fixture tables are dumped to so the DuckDB oracle
    * can read the SAME inputs via read_parquet — the bridge that lets the
    * six reference pipelines be driver-verified instead of unit-only. */
  val parquetDir = "/tmp/graft_ref_fixtures_v1"

  private def tableMap(src: ScenarioSources): Seq[(String, DataFrame)] = Seq(
    "fc_scenario" -> src.fcScenario,
    "fc_model" -> src.fcModel,
    "fc_forecast_init" -> src.fcForecastInit,
    "fc_scenario_node_data" -> src.fcScenarioNodeData,
    "fc_model_node" -> src.fcModelNode,
    "fc_model_node_groups" -> src.fcModelNodeGroups,
    "fc_model_node_tab" -> src.fcModelNodeTab,
    "fc_scenario_run" -> src.fcScenarioRun,
    "fc_scenario_run_branch" -> src.fcScenarioRunBranch,
    "fc_scenario_node_calc" -> src.fcScenarioNodeCalc,
    "fc_scenario_event_data" -> src.fcScenarioEventData,
    "fc_scenario_event_type" -> src.fcScenarioEventType,
    "fc_event_type" -> src.fcEventType)

  @volatile private var written = false

  /** Write the (deterministic) fixtures to [[parquetDir]] once per JVM and
    * return sources re-read FROM that parquet, so Spark and DuckDB consume
    * byte-identical inputs. */
  def parquetSources(spark: SparkSession): ScenarioSources = {
    this.synchronized {
      if (!written) {
        tableMap(build(spark)).foreach { case (n, df) =>
          df.write.mode("overwrite").parquet(s"$parquetDir/$n")
        }
        written = true
      }
    }
    ScenarioSources(
      spark.read.parquet(s"$parquetDir/fc_scenario"),
      spark.read.parquet(s"$parquetDir/fc_model"),
      spark.read.parquet(s"$parquetDir/fc_forecast_init"),
      spark.read.parquet(s"$parquetDir/fc_scenario_node_data"),
      spark.read.parquet(s"$parquetDir/fc_model_node"),
      spark.read.parquet(s"$parquetDir/fc_model_node_groups"),
      spark.read.parquet(s"$parquetDir/fc_model_node_tab"),
      spark.read.parquet(s"$parquetDir/fc_scenario_run"),
      spark.read.parquet(s"$parquetDir/fc_scenario_run_branch"),
      spark.read.parquet(s"$parquetDir/fc_scenario_node_calc"),
      spark.read.parquet(s"$parquetDir/fc_scenario_event_data"),
      spark.read.parquet(s"$parquetDir/fc_scenario_event_type"),
      spark.read.parquet(s"$parquetDir/fc_event_type"))
  }

  /** Restrict every source table to rows the "OLTP source" has written
    * before `horizon` (by its own creation-ish column). */
  def visibleBefore(src: ScenarioSources, horizon: Timestamp): ScenarioSources = {
    import org.apache.spark.sql.functions.{col, lit}
    def vis(df: DataFrame, c: String): DataFrame = df.filter(col(c) < lit(horizon))
    src.copy(
      fcScenario = vis(src.fcScenario, "created_at"),
      fcScenarioNodeData = vis(src.fcScenarioNodeData, "created_at"),
      fcScenarioRun = vis(src.fcScenarioRun, "run_at"),
      fcScenarioNodeCalc = vis(src.fcScenarioNodeCalc, "created_at"),
      fcScenarioEventData = vis(src.fcScenarioEventData, "created_at"))
  }
}
