package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Ingest

/** Permissive file intake: corrupt lines quarantined, never dropped or
  * job-fatal; plus ORC round-trip (the other built-in columnar format). */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("jsonl: clean rows parse, malformed lines land in quarantine with the raw text") {
    val dir = tmpDir("ingest-jsonl")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part0.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": "beta"}
        |{not json at all
        |{"doc_id": "NaN-ish", "text": "gamma"}
        |""".stripMargin)
    val (clean, bad) = Ingest.split(Ingest.jsonl(spark, dir, schema))
    assert(clean.as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (2L, "beta")))
    val raw = bad.as[String].collect()
    assert(raw.length == 2)
    assert(raw.exists(_.contains("not json")) &&
      raw.exists(_.contains("NaN-ish")))
  }

  test("csv: type-mismatched rows quarantine, clean rows parse with header") {
    val dir = tmpDir("ingest-csv")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part0.csv"),
      """doc_id,text
        |1,alpha
        |oops,beta
        |3,gamma
        |""".stripMargin)
    val (clean, bad) = Ingest.split(Ingest.csv(spark, dir, schema))
    assert(clean.as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (3L, "gamma")))
    assert(bad.as[String].collect().toSeq == Seq("oops,beta"))
  }

  test("ORC round-trip: the documents slice survives write/read bit-exactly") {
    val docs = graft.model.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text", "source", "n_chars")
    val dir = tmpDir("ingest-orc")
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }
}
