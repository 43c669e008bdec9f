package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level cost breakdown for q112's sparse-cosine pipeline on the
  * 8x perturbed corpus — which phase actually owns the wall-clock. */
object Q112Stages {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.model.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val k = 8
    val docs8 = (0 until k).map { i =>
      var d = base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      if (i > 0) d = d.withColumn("text", expr(
        s"array_join(transform(split(text, ' '), (w, j) -> " +
          s"CASE WHEN pmod(j + $i, 7) = 0 THEN concat(w, '_r$i') " +
          s"ELSE w END), ' ')"))
      d
    }.reduce(_ unionByName _).cache()
    println("DOCS8: " + docs8.count())

    def time(label: String)(f: => Long): Unit = {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }

    val tf = docs8.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.wordNGrams(col("text"), 3,
          distinct = false)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

    time("tf agg")(tf.count())

    val kept = tf.join(
      tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 64).select(col("tok")), Seq("tok"))
    time("kept (tf + df fence)")(kept.count())

    val lists = kept.groupBy(col("tok"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
        .as("__ps"))
    time("lists")(lists.count())

    val dots = lists
      .select(explode(expr(
        """flatten(transform(__ps, (x, i) ->
          |  transform(slice(__ps, i + 2, size(__ps)), y ->
          |    named_struct('doc_a', x.doc_id, 'doc_b', y.doc_id,
          |                 'prod', x.tf * y.tf))))""".stripMargin)).as("__p"))
      .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"),
        col("__p.prod").as("__prod"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("__prod")).as("dot"))
    time("dots (lists + pairs + agg)")(dots.count())

    val norms = kept.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("tf") * col("tf"))).as("norm"))
    time("norms")(norms.count())

    time("full")(graft.ext.InvertedIndex.sparseCosinePairs(
      docs8, "doc_id", "text", n = 3, maxDf = 64L, minSim = 0.5).count())

    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n1 = graft.ext.InvertedIndex.sparseCosinePairs(
        base, "doc_id", "text", n = 3, maxDf = 64L, minSim = 0.5).count()
      println(f"full 1x rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n1)")
    }

    // variant: norms ride IN the posting-list structs — the two
    // pair-table norm joins disappear; one postings-sized join replaces them
    def variant(): DataFrame = {
      val keptN = kept.join(norms, Seq("doc_id"))
      val listsN = keptN.groupBy(col("tok"))
        .agg(sort_array(collect_list(
          struct(col("doc_id"), col("tf"), col("norm")))).as("__ps"))
      listsN
        .select(explode(expr(
          """flatten(transform(__ps, (x, i) ->
            |  transform(slice(__ps, i + 2, size(__ps)), y ->
            |    named_struct('doc_a', x.doc_id, 'doc_b', y.doc_id,
            |                 'prod', x.tf * y.tf,
            |                 'nn', x.norm * y.norm))))""".stripMargin)).as("__p"))
        .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"),
          col("__p.prod").as("__prod"), col("__p.nn").as("__nn"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(col("__prod")).as("dot"), first(col("__nn")).as("__nn"))
        .withColumn("cosine", col("dot") / col("__nn"))
        .filter(col("cosine") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("dot"), col("cosine"))
    }
    time("variant full")(variant().count())

    // variant 2: pair expansion via two Generate operators (posexplode +
    // explode(slice)) instead of nested higher-order transforms — Generate
    // runs inside whole-stage codegen, lambda transforms do not
    def variant2(): DataFrame = {
      val keptN = kept.join(norms, Seq("doc_id"))
      val listsN = keptN.groupBy(col("tok"))
        .agg(sort_array(collect_list(
          struct(col("doc_id"), col("tf"), col("norm")))).as("__ps"))
      listsN
        .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "__x")))
        .select(col("__x.doc_id").as("doc_a"), col("__x.tf").as("__ta"),
          col("__x.norm").as("__na"),
          explode(expr("slice(__ps, __i + 2, size(__ps))")).as("__y"))
        .select(col("doc_a"), col("__y.doc_id").as("doc_b"),
          (col("__ta") * col("__y.tf")).as("__prod"),
          (col("__na") * col("__y.norm")).as("__nn"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(col("__prod")).as("dot"), first(col("__nn")).as("__nn"))
        .withColumn("cosine", col("dot") / col("__nn"))
        .filter(col("cosine") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("dot"), col("cosine"))
    }
    time("variant2 full")(variant2().count())

    val keptN = kept.join(norms, Seq("doc_id"))
    time("v2 keptN")(keptN.count())
    val listsN = keptN.groupBy(col("tok"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("tf"), col("norm")))).as("__ps"))
    time("v2 listsN")(listsN.count())
    val pairsAgg = listsN
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "__x")))
      .select(col("__x.doc_id").as("doc_a"), col("__x.tf").as("__ta"),
        col("__x.norm").as("__na"),
        explode(expr("slice(__ps, __i + 2, size(__ps))")).as("__y"))
      .select(col("doc_a"), col("__y.doc_id").as("doc_b"),
        (col("__ta") * col("__y.tf")).as("__prod"),
        (col("__na") * col("__y.norm")).as("__nn"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("__prod")).as("dot"), first(col("__nn")).as("__nn"))
    time("v2 pairsAgg")(pairsAgg.count())

    // exploded (pre-aggregation) pair volume vs aggregated distinct pairs
    val exploded = listsN.select(
      sum(expr("size(__ps) * (size(__ps) - 1) / 2")).as("pairs"))
      .head.getLong(0)
    println(s"EXPLODED PAIR VOLUME: $exploded")

    // variant 3: triangle via two posexplodes + i<j filter — 2x generate
    // volume, zero slice copies
    val pairsAgg3 = listsN
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "__x")))
      .select(col("__x.doc_id").as("doc_a"), col("__x.tf").as("__ta"),
        col("__x.norm").as("__na"), col("__i"),
        posexplode(col("__ps")).as(Seq("__j", "__y")))
      .filter(col("__j") > col("__i"))
      .select(col("doc_a"), col("__y.doc_id").as("doc_b"),
        (col("__ta") * col("__y.tf")).as("__prod"),
        (col("__na") * col("__y.norm")).as("__nn"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("__prod")).as("dot"), first(col("__nn")).as("__nn"))
    time("v3 pairsAgg")(pairsAgg3.count())
    val c = variant2().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val a0 = graft.ext.InvertedIndex.sparseCosinePairs(
      docs8, "doc_id", "text", n = 3, maxDf = 64L, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    println("IDENTICAL2: " + (a0 == c) + " sizes " + a0.size + "/" + c.size)

    // sanity: identical output
    val a = graft.ext.InvertedIndex.sparseCosinePairs(
      docs8, "doc_id", "text", n = 3, maxDf = 64L, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = variant().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    println("IDENTICAL: " + (a == b) + " sizes " + a.size + "/" + b.size)

    spark.stop()
  }
}
