package graft

/** Physical-plan quality guards (SURVEY §4): catches regressions where a
  * filter stops reaching the scan, a dim stops broadcasting, or top-k
  * degrades to a full sort — the properties that decide 100 TB viability.
  */
class PlanQualitySpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf())
      .queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q02: OR-predicate pushed; top-k plans TakeOrderedAndProject (no full sort)") {
    val p = plan("q02_incremental_scan")
    assert(p.contains("PushedFilters: [Or(GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q03: both dimension joins are broadcast hash joins") {
    val p = plan("q03_customer_geo")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q15: watermark predicate reaches the scan on the raw nanos column") {
    val p = plan("q15_watermark_scan")
    assert(p.contains("GreaterThanOrEqual(ts,1705708710000000000)"), p)
  }

  test("q01 runs inside whole-stage codegen (no interpreted hot path)") {
    // AQE only shows codegen spans in the FINAL plan — execute first
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the simple plan string
    assert(p.contains("*(1)") && p.contains("*(2)"), p)
  }

  test("q17: simhash aggregate stays inside whole-stage codegen") {
    // 64 separate bit-sums blow past spark.sql.codegen.maxFields and drop
    // the hot aggregate to interpreted mode (~10× slower, the round-1 20s
    // outlier); the packed-lane form must keep every HashAggregate codegen'd.
    val df = SparkEntry.queries("q17_simhash")(spark, sf())
    df.collect()
    // AQE plan strings repeat the tree as "== Initial Plan ==" without
    // codegen markers — audit only the executed (final) section.
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toList
    assert(aggLines.nonEmpty, p)
    val interpreted = aggLines.filterNot(_.matches(""".*\*\(\d+\) HashAggregate.*"""))
    assert(interpreted.isEmpty, s"interpreted HashAggregate:\n${interpreted.mkString("\n")}\n$p")
  }

  test("q01 scan reads only referenced columns (pruning)") {
    val p = SparkEntry.queries("q01_pricing_summary")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"), read)
  }
}
