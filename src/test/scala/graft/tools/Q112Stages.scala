package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level cost breakdown for q112's sparse-cosine pipeline on the
  * 8x perturbed corpus — which phase actually owns the wall-clock. */
object Q112Stages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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

    spark.stop()
  }
}
