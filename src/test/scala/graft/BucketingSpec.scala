package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY §4 / scale posture): both fact
  * tables bucketed on the join key join WITHOUT a shuffle — the layout that
  * makes the repeated orders⋈lineitem join free at 100 TB.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables join with no shuffle exchange") {
    val db = "graft_bucketed"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      graft.model.Tables.load(spark, sf(), "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(s"$db.orders_b")
      graft.model.Tables.load(spark, sf(), "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(s"$db.lineitem_b")
      // force the at-scale join strategy (at 100 TB neither side broadcasts)
      val joined = spark.table(s"$db.orders_b").hint("merge")
        .join(spark.table(s"$db.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"), plan) // co-located: no shuffle
      assert(joined.count() ==
        graft.model.Tables.load(spark, sf(), "lineitem").count())
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
