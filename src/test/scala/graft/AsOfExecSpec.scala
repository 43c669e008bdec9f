package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.AsOfExec

/** The custom merge-based as-of physical operator: exact semantics on
  * planted edges, equivalence with the composed window form on real data,
  * and the one-pass plan shape (no window, one exchange per side). */
class AsOfExecSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("picks latest right <= left ts per key; nulls where none") {
    val lefts = Seq(
      (1L, "A", t("2024-01-01 10:00:00")),  // before any quote -> null
      (2L, "A", t("2024-01-01 10:05:00")),  // exact tie -> 101.0
      (3L, "A", t("2024-01-01 10:30:00")),  // after both -> 102.0
      (4L, "B", t("2024-01-01 10:30:00")),  // other key -> 55.0
      (5L, "C", t("2024-01-01 10:30:00")))  // key with no rights -> null
      .toDF("id", "sym", "ts")
    val rights = Seq(
      ("A", t("2024-01-01 10:05:00"), 101.0),
      ("A", t("2024-01-01 10:10:00"), 102.0),
      ("B", t("2024-01-01 09:00:00"), 55.0))
      .toDF("q_sym", "q_ts", "price")
    val got = AsOfExec.asof(lefts, rights, "sym", "q_sym", "ts", "q_ts")
      .select("id", "price").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(101.0), 3L -> Some(102.0),
      4L -> Some(55.0), 5L -> None))
  }

  test("null keys/ts match nothing but left rows survive") {
    val lefts = Seq(
      (1L, Some("A"), Some(t("2024-01-01 10:00:00"))),
      (2L, None, Some(t("2024-01-01 10:00:00"))),
      (3L, Some("A"), None))
      .toDF("id", "sym", "ts")
    val rights = Seq(("A", t("2024-01-01 09:00:00"), 7.0))
      .toDF("q_sym", "q_ts", "price")
    val got = AsOfExec.asof(lefts, rights, "sym", "q_sym", "ts", "q_ts")
      .select("id", "price").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(7.0), 2L -> None, 3L -> None))
  }

  test("equivalent to the composed window as-of on the events corpus") {
    val events = graft.model.Tables.load(spark, sf(), "events")
      .select("event_id", "user_id", "ts")
    val ordersByDay = graft.model.Tables.load(spark, sf(), "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val exec = AsOfExec.asof(events.repartition(7), ordersByDay.repartition(5),
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select("event_id", "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    val composed = graft.ops.AsOfJoin.asof(events, ordersByDay,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey"))
      .select(col("event_id"), col("asof_o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(exec.nonEmpty && exec == composed)
  }

  test("plan: custom exec node, no window, one exchange per side") {
    val events = graft.model.Tables.load(spark, sf(), "events")
      .select("event_id", "user_id", "ts")
    val orders = graft.model.Tables.load(spark, sf(), "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val df = AsOfExec.asof(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), p) // nodeName renders without "Exec"
    assert(!p.contains("Window"), p)
    // left side shuffles on user_id; right side's groupBy exchange on
    // (custkey, orderdate) doesn't satisfy ClusteredDistribution(custkey),
    // so EnsureRequirements adds one more — but never a third
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }
}
