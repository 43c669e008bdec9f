package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpeDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.model.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 100)
    val m = graft.ext.Corpus.bpeTrain(docs, col("text"), nMerges = 20)
    m.orderBy("rank").collect().foreach { r =>
      println(s"MERGE\t${r.getInt(0)}\t${r.getString(1)}\t${r.getString(2)}\t${r.getLong(3)}")
    }
    spark.stop()
  }
}
