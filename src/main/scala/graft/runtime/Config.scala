package graft.runtime

/** Env-driven engine configuration (SURVEY §2.1 S7) — the reference's
  * config.py: every knob an env var with the same default, so an operator
  * of the reference finds the same dials here.
  */
final case class EngineConf(
    pollIntervalSec: Long,   // POLL_INTERVAL_SEC=30   (config.py:28)
    overlapSec: Long,        // OVERLAP_SEC=90         (config.py:29)
    maxBatchRows: Int,       // MAX_BATCH_ROWS=5000    (config.py:30)
    queryTimeoutSec: Int,    // statement_timeout 15s  (config.py:14)
    maxConsecutiveFailures: Int, // scheduler.py:43
    sinkPageSize: Int)       // execute_values page_size=500 (db.py:74)

object EngineConf {
  def fromEnv(env: Map[String, String] = sys.env): EngineConf = {
    def i(k: String, d: Int): Int = env.get(k).map(_.trim.toInt).getOrElse(d)
    EngineConf(
      pollIntervalSec = i("POLL_INTERVAL_SEC", 30).toLong,
      overlapSec = i("OVERLAP_SEC", 90).toLong,
      maxBatchRows = i("MAX_BATCH_ROWS", 5000),
      queryTimeoutSec = i("STATEMENT_TIMEOUT_MS", 15000) / 1000,
      maxConsecutiveFailures = i("MAX_CONSECUTIVE_FAILURES", 10),
      sinkPageSize = i("SINK_PAGE_SIZE", 500))
  }
}
