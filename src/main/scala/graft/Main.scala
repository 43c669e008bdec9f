package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.Bootstrap
import graft.ops.{ScenarioPipeline, ScenarioSources}
import graft.runtime.{CycleScheduler, EngineConf, IncrementalRunner, MetricsStore, WatermarkStore}
import graft.sources.Jdbc

/** Production entrypoint — the reference container's supervised loop
  * (Dockerfile:13 `CMD ["python", "scheduler.py"]`, restart policy
  * docker-compose.yml:16,36) as a spark-submit main:
  *
  * {{{
  * spark-submit --class graft.Main target/scala-2.13/etlpipespark_*.jar
  * }}}
  *
  * Runs the six reference pipelines as incremental streams forever (or
  * `GRAFT_CYCLES` cycles), with the reference's env knobs (EngineConf /
  * config.py) plus:
  *
  *  - `GRAFT_WAREHOUSE`       target warehouse dir (default /tmp/graft_warehouse)
  *  - `GRAFT_SOURCE_DIR`      parquet dir holding the fc_* source tables
  *  - `GRAFT_SOURCE_JDBC_URL` (+`GRAFT_SOURCE_USER`/`GRAFT_SOURCE_PASSWORD`)
  *                            read the fc_* tables from a live PostgreSQL —
  *                            the reference's deployment mode (db.py:20-40).
  *                            NOT integration-tested here: no PostgreSQL
  *                            exists in this environment; the binding is the
  *                            same pushdown reader ApiSurfaceSpec covers.
  *  - `GRAFT_CYCLES`          cycle count (default: run forever)
  *  - `GRAFT_TX_SINKS`        "1"/"true": commit every target through the
  *                            TxTable log (atomic single-rename commits)
  *                            instead of the rename-swap protocol
  *  - `GRAFT_MASTER`          master when not launched via spark-submit
  *
  * With neither source set, the deterministic demo corpus is used — that
  * path is the smoke test (MainSmokeSpec).
  */
object Main {
  def main(args: Array[String]): Unit = run(sys.env)

  def run(env: Map[String, String]): Unit = {
    val conf = EngineConf.fromEnv(env)
    val builder = SparkSession.builder()
      .appName("graft-etl")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit supplies the master; standalone/dev runs default local
    if (!sys.props.contains("spark.master"))
      builder.master(env.getOrElse("GRAFT_MASTER",
        s"local[${math.min(32, Runtime.getRuntime.availableProcessors)}]"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(env.getOrElse("GRAFT_LOG_LEVEL", "WARN"))

    val wh = env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse")
    val boot = new Bootstrap(spark, wh)
    boot.setup()
    val src = resolveSources(spark, env)
    val store = new WatermarkStore(spark, boot.tablePath("etl_watermark"))
    val runner = new IncrementalRunner(spark, store, conf.overlapSec,
      maxConcurrentStreams = 6)
    // append sinks accrete one file set per micro-batch (~2.9k/day at 30s);
    // compact the date-partitioned event log off the hot path every 120
    // cycles (~hourly) once it fragments past 256 files
    val compactEvery = env.getOrElse("GRAFT_COMPACT_EVERY_CYCLES", "120").trim.toInt
    val compactMaxFiles = env.getOrElse("GRAFT_COMPACT_MAX_FILES", "256").trim.toInt
    // GRAFT_TX_SINKS=1 flips every target to the TxTable commit-log protocol
    val txSinks = Set("1", "true").contains(
      env.getOrElse("GRAFT_TX_SINKS", "").trim.toLowerCase)
    val sched = new CycleScheduler(runner, conf.maxConsecutiveFailures,
      metrics = Some(new MetricsStore(spark, boot.tablePath("etl_metrics"))),
      maintenance =
        if (txSinks)
          // tx maintenance: the self-driving policy loop — per cycle it
          // reads each table's health from the log (small-file count, DV
          // fractions, log length past the last checkpoint, reclaimable
          // debris) and runs ONLY the actions whose thresholds trip, in
          // dependency order (rewrites → checkpoint → vacuum). A healthy
          // table costs a few metadata probes and zero commits, so the
          // hook runs every `compactEvery` cycles without churn.
          graft.ops.Maintenance.cycleHook(spark,
            graft.model.Schemas.targets.keys.toSeq.map(boot.tablePath),
            every = compactEvery,
            p = graft.ops.MaintainPolicy(
              minSmallFiles = compactMaxFiles,
              retainVersions = 2))
        else cycleId =>
          if (compactEvery > 0 && cycleId % compactEvery == 0)
            graft.merge.MergeSink.compactIfNeeded(spark,
              boot.tablePath("fact_scenario_timeline"), maxFiles = compactMaxFiles,
              targetPartitions = 1, partitionCols = Seq("event_date")))
    val cycles = env.get("GRAFT_CYCLES").map(_.trim.toInt).getOrElse(Int.MaxValue)
    sched.run(ScenarioPipeline.streams(spark, src, boot, txSinks),
      conf.pollIntervalSec, cycles)
  }

  /** Source tables by priority: live JDBC > parquet dir > demo fixtures. */
  private def resolveSources(spark: SparkSession,
                             env: Map[String, String]): ScenarioSources = {
    val tables = Seq("fc_scenario", "fc_model", "fc_forecast_init",
      "fc_scenario_node_data", "fc_model_node", "fc_model_node_groups",
      "fc_model_node_tab", "fc_scenario_run", "fc_scenario_run_branch",
      "fc_scenario_node_calc", "fc_scenario_event_data",
      "fc_scenario_event_type", "fc_event_type")
    def build(load: String => DataFrame): ScenarioSources = {
      val t = tables.map(n => n -> load(n)).toMap
      ScenarioSources(t("fc_scenario"), t("fc_model"), t("fc_forecast_init"),
        t("fc_scenario_node_data"), t("fc_model_node"),
        t("fc_model_node_groups"), t("fc_model_node_tab"),
        t("fc_scenario_run"), t("fc_scenario_run_branch"),
        t("fc_scenario_node_calc"), t("fc_scenario_event_data"),
        t("fc_scenario_event_type"), t("fc_event_type"))
    }
    (env.get("GRAFT_SOURCE_JDBC_URL"), env.get("GRAFT_SOURCE_DIR")) match {
      case (Some(url), _) =>
        val conf = Jdbc.SourceConf(url,
          env.getOrElse("GRAFT_SOURCE_USER", "etl_reader"),
          env.getOrElse("GRAFT_SOURCE_PASSWORD", ""))
        build(n => Jdbc.pushdownQuery(spark, conf,
          s"SELECT * FROM public.$n").load())
      case (None, Some(dir)) =>
        build(n => spark.read.parquet(s"$dir/$n"))
      case (None, None) =>
        graft.demo.ReferenceFixtures.parquetSources(spark)
    }
  }
}
