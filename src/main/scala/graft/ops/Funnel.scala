package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the event stream: ordered conversion
  * funnels and cohort retention — the two queries every product/growth
  * pipeline runs against the same events table the engine already
  * sessionizes (q26/q101) and throttles (q103).
  *
  * Both are join/aggregate shapes, not window-over-everything shapes: the
  * funnel is k chained per-user min-aggregates (each stage shuffles on
  * user only the rows of ITS step, not the whole stream), retention is
  * two aggregates and one equi-join. All time arithmetic is
  * calendar-truncation + integer day division — no floats — so results
  * replay exactly in any engine.
  */
object Funnel {

  /** Ordered conversion funnel: for each user, the earliest time of step 1,
    * the earliest step-2 event STRICTLY AFTER that, the earliest step-3
    * event strictly after that, and so on — the "view → click → purchase"
    * question asked in order (a purchase before the first view does not
    * count).
    *
    * `steps` are (name, predicate) in funnel order; output has one
    * `t_<name>` timestamp per step (null = user never reached it; nulls
    * are monotone by construction — reaching step i implies i−1) plus
    * `converted_steps` (0..k).
    *
    * Scale shape: stage i filters the stream to step i's rows (a pushed
    * predicate), joins the stage-(i−1) frame on user (one row per
    * converted user — broadcastable when conversion is selective), and
    * min-aggregates. The stream is scanned once per step but never
    * window-sorted; every shuffle key is the user id, so AQE can reuse
    * the exchange across stages. */
  def conversionFunnel(events: DataFrame, user: Column, ts: Column,
      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "steps must not be empty")
    require(steps.map(_._1).distinct.size == steps.size,
      s"duplicate step names: ${steps.map(_._1)}")
    val users = events.select(user.as("user_id")).distinct()
    val stageFrames = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, ((name, cond), i)) =>
        val stepRows = events.filter(cond)
          .select(user.as("user_id"), ts.as("__ts"))
        val stage = acc match {
          case Nil =>
            stepRows.groupBy(col("user_id"))
              .agg(min(col("__ts")).as(s"t_$name"))
          case prev :: _ =>
            val prevCol = s"t_${steps(i - 1)._1}"
            stepRows.join(prev.select(col("user_id"), col(prevCol)), Seq("user_id"))
              .filter(col("__ts") > col(prevCol))
              .groupBy(col("user_id"))
              .agg(min(col("__ts")).as(s"t_$name"))
        }
        stage :: acc
    }.reverse
    val joined = stageFrames.foldLeft(users) { (acc, st) =>
      acc.join(st, Seq("user_id"), "left")
    }
    val depth = steps.map { case (name, _) =>
      when(col(s"t_$name").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    joined.withColumn("converted_steps", depth)
  }

  /** Cohort retention matrix: users cohorted by the ISO week of their
    * FIRST event; one output row per (cohort_week, week_offset) with the
    * count of cohort users active in that later week. week_offset 0 is the
    * cohort week itself (always its full cohort), and offsets are exact —
    * both sides truncate to Monday, so the day difference is divisible by
    * 7 and the integer division is lossless.
    *
    * Scale shape: one min-aggregate per user (the cohort), one distinct
    * over (user, week) (the activity set), one equi-join on user, one
    * count aggregate — all shuffles on user or on the small (cohort,
    * offset) pair; no windows. */
  def cohortRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val cohort = events.groupBy(user.as("user_id"))
      .agg(to_date(date_trunc("week", min(ts))).as("cohort_week"))
    val active = events
      .select(user.as("user_id"), to_date(date_trunc("week", ts)).as("week"))
      .distinct()
    retentionMatrix(cohort, active)
  }

  /** Retention matrix from the INCREMENTAL state tables ([[graft.streaming
    * .Streams.Sinks.cohortFold]]): `first` = (user_id, first_ts), `activity`
    * = (user_id, week). Because the state folds by min (cohorts) and set
    * union (activity) — both order-independent and idempotent — the matrix
    * read here equals [[cohortRetention]] over the full event history for
    * ANY batch split, in any arrival order. */
  def cohortRetentionFromState(first: DataFrame, activity: DataFrame): DataFrame =
    retentionMatrix(
      first.select(col("user_id"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week")),
      activity.select(col("user_id"), col("week")))

  private def retentionMatrix(cohort: DataFrame, active: DataFrame): DataFrame =
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        expr("datediff(week, cohort_week) DIV 7").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
}
