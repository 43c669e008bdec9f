package graft

import org.apache.spark.sql.functions._
import graft.functions.Registry
import graft.model.Models
import graft.ops.Skew
import graft.sources.Jdbc

/** The remaining API edges: typed Datasets, SQL function registration,
  * JDBC option surface, skew salting, partitioned append. */
class ApiSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL registry: safe casts + vector functions callable from spark.sql") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT safe_bool('yes') AS b, safe_bool('nope') AS b2,
        | safe_long('3.5') AS l, safe_numeric('2.5') AS d,
        | dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        | long_array_agree(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agree,
        | cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        | duration_seconds(timestamp'2024-01-01 00:00:00.25',
        |                  timestamp'2024-01-01 00:00:01.5') AS ds,
        | word_ngrams(' The quick  quick fox ', 2) AS ng
        |""".stripMargin).collect()(0)
    assert(r.getAs[Boolean]("b") && !r.getAs[Boolean]("b2"))
    assert(r.isNullAt(r.fieldIndex("l")))
    assert(r.getAs[Double]("d") == 2.5)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Int]("agree") == 2)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(r.getAs[Double]("ds") == 1.25)
    assert(r.getAs[scala.collection.Seq[String]]("ng").toSeq ==
      Seq("the quick", "quick quick", "quick fox"))
  }

  test("SQL registry: the sketch/heap aggregate family callable from spark.sql text") {
    Registry.registerAll(spark)
    Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 5.0),
      ("b", 5L, 7.0))
      .toDF("g", "id", "v").createOrReplaceTempView("t_agg_sql")
    // topk_rows: per-group leaderboard straight from SQL
    val top = spark.sql(
      """SELECT g, topk_rows(v, id, 2) AS top FROM t_agg_sql GROUP BY g""")
      .as[(String, Seq[(String, Double)])].collect().toMap
    assert(top("a") == Seq(("2", 30.0), ("3", 20.0)))
    assert(top("b") == Seq(("5", 7.0)))
    // topk_freq / cm_sketch / bloom_agg / kll: run + sanity-check shapes
    val r = spark.sql(
      """SELECT topk_freq(g, 4) AS tf, cm_sketch(g, 2, 16) AS cm,
        | bloom_agg(id, 100, 0.01) AS bf,
        | kll_quantile(kll_sketch(v, 200), 1.0d) AS vmax,
        | theta_sketch(id, 12) AS th
        |FROM t_agg_sql""".stripMargin).collect()(0)
    val tf = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("tf")
    assert(tf.map(x => x.getString(0) -> x.getLong(1)).toMap ==
      Map("a" -> 4L, "b" -> 1L))
    assert(r.getAs[scala.collection.Seq[Long]]("cm").sum == 2 * 5) // depth × rows
    assert(graft.functions.SketchAggs.bloomMightContain(
      r.getAs[Array[Byte]]("bf"), "3"))
    assert(!graft.functions.SketchAggs.bloomMightContain(
      r.getAs[Array[Byte]]("bf"), "nope-99"))
    assert(r.getAs[Double]("vmax") == 30.0)
    assert(r.getAs[Array[Byte]]("th").nonEmpty)
  }

  test("typed Dataset edge round-trips the watermark table") {
    val wmDir = tmpDir("wmt")
    val store = new graft.runtime.WatermarkStore(spark, wmDir)
    store.advance("t1", 5, graft.demo.ReferenceFixtures.ts(1), graft.demo.ReferenceFixtures.ts(1))
    val ds = Models.watermarks(spark.read.parquet(wmDir))
    val row = ds.collect().head
    assert(row.table_name == "t1" && row.rows_last_run == 5L && row.total_rows_ever == 5L)
  }

  test("JDBC upsert SQL matches the reference's ON CONFLICT shapes, idents quoted") {
    assert(Jdbc.upsertSql("dim_scenario", Seq("id", "status", "name"),
      Seq("id"), Seq("status")) ==
      """INSERT INTO "dim_scenario" ("id", "status", "name") VALUES (?, ?, ?) """ +
        """ON CONFLICT ("id") DO UPDATE SET "status" = EXCLUDED."status"""")
    assert(Jdbc.upsertSql("etl.fact_node_calc_results", Seq("source_id", "v"),
      Seq("source_id"), Nil) ==
      """INSERT INTO "etl"."fact_node_calc_results" ("source_id", "v") VALUES (?, ?) """ +
        """ON CONFLICT ("source_id") DO NOTHING""")
    // a hostile identifier cannot break out of its quotes
    assert(Jdbc.quoteIdent("""x""y""") == "\"x\"\"\"\"y\"")
    intercept[IllegalArgumentException](Jdbc.quoteIdent("t; DROP TABLE x"))
  }

  test("JDBC reader surface builds partitioned pushdown plans (no connect)") {
    val conf = Jdbc.SourceConf("jdbc:postgresql://example.invalid/db", "u", "p")
    // building the reader must not touch the network; only an action would
    val reader = Jdbc.partitionedTable(spark, conf, "public.fc_scenario",
      "seq_id", 0L, 1000000L, 16)
    assert(reader != null)
  }

  test("salted join equals plain join; salted count equals groupBy count") {
    val left = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "v")
    val right = Seq(("hot", "H"), ("k901", "A"), ("k950", "B")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).select("k", "v", "tag")
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "v", "tag")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // hot-key-only mode: identical rows, but ONLY the measured-hot key
    // replicates the build side (the production form)
    val hotOnly = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8,
        hotKeyMinRows = 100L).select("k", "v", "tag")
    assert(plain.exceptAll(hotOnly).isEmpty && hotOnly.exceptAll(plain).isEmpty)
    // nothing hot at a higher threshold: degrades to the plain join
    val none = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8,
        hotKeyMinRows = 5000L).select("k", "v", "tag")
    assert(plain.exceptAll(none).isEmpty && none.exceptAll(plain).isEmpty)
    // a replicated build side cannot serve right/full outer joins
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("k"), 8, joinType = "right_outer")
    }
    assert(e.getMessage.contains("unmatched right rows"), e.getMessage)
    val counts = Skew.saltedCount(left, col("k"), 8).as[(String, Long)]
      .collect().toMap
    assert(counts("hot") == 900L)
  }

  test("keyProfile: hot keys ranked with exact shares and ceil(n/target) salt advice") {
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 60).map(_ => "warm") ++
      (1 to 5).map(i => s"cold$i")).toDF("k")
    val got = Skew.keyProfile(df, col("k"), topK = 3, targetRowsPerTask = 100L)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._4)) ==
      Seq(("hot", 900L, 9L), ("warm", 60L, 1L), ("cold1", 1L, 1L)))
    assert(math.abs(got.head._3 - 900.0 / 965.0) < 1e-6)
    // advisory is layout-independent
    val again = Skew.keyProfile(df.repartition(7), col("k"), 3, 100L)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(again == got)
  }

  test("partitioned append: new files land under partition dirs, pruning works") {
    val dir = tmpDir("part")
    val b1 = Seq(("e1", "2024-03-01", 1.0), ("e2", "2024-03-02", 2.0))
      .toDF("source_key", "event_date", "v")
    graft.merge.MergeSink.appendDedup(spark, dir, b1, "source_key", Seq("event_date"))
    val b2 = Seq(("e2", "2024-03-02", 99.0), ("e3", "2024-03-02", 3.0))
      .toDF("source_key", "event_date", "v")
    graft.merge.MergeSink.appendDedup(spark, dir, b2, "source_key", Seq("event_date"))
    val got = spark.read.parquet(dir)
    assert(got.count() == 3)
    assert(new java.io.File(s"$dir/event_date=2024-03-01").exists())
    assert(got.filter(col("event_date") === "2024-03-02").count() == 2)
  }
}
