package graft

import org.apache.spark.sql.functions._
import graft.ext.TextPrep

/** PII scrubbing masks each class exactly once per occurrence; chunking
  * produces the integer-exact window/stride cover. */
class TextPrepSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextPrep.scrubPii(col("t")).as("c"))
      .as[String].head()

  test("scrub masks emails (digits in local part stay email, not ID)") {
    assert(scrub("mail me at john.doe99@corp.example.org now") ==
      "mail me at <EMAIL> now")
    assert(scrub("id-ish local part 123456789a@x.io") == "id-ish local part <EMAIL>")
  }

  test("scrub masks phones and long digit runs independently") {
    assert(scrub("call 555-123-4567 or 555.987.6543") == "call <PHONE> or <PHONE>")
    assert(scrub("ssn-like 123456789 stays masked, short 12345 stays") ==
      "ssn-like <ID> stays masked, short 12345 stays")
  }

  test("piiCount totals all three classes") {
    val n = Seq("a@b.co and 555-123-4567 and 987654321").toDF("t")
      .select(TextPrep.piiCount(col("t")).cast("long").as("n")).as[Long].head()
    assert(n == 3L)
  }

  test("chunking: exact windows, stride overlap, short tail") {
    val df = Seq((1L, "t1 t2 t3 t4 t5")).toDF("id", "txt")
    val got = TextPrep.chunkTokens(df, col("id"), col("txt"), window = 4, stride = 2)
      .select("chunk_no", "chunk", "chunk_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "t1 t2 t3 t4", 4L),
      (1L, "t3 t4 t5", 3L)))
  }

  test("chunking: doc shorter than the window is one whole chunk") {
    val df = Seq((1L, "a b")).toDF("id", "txt")
    val got = TextPrep.chunkTokens(df, col("id"), col("txt"), window = 10, stride = 5)
      .select("chunk_no", "chunk", "chunk_tokens")
      .as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((0L, "a b", 2L)))
  }

  test("chunking: every token is covered by at least one chunk") {
    val txt = (1 to 103).map(i => s"w$i").mkString(" ")
    val chunks = TextPrep.chunkTokens(Seq((1L, txt)).toDF("id", "txt"),
        col("id"), col("txt"), window = 24, stride = 12)
      .select("chunk").as[String].collect()
    val covered = chunks.flatMap(_.split(" ")).toSet
    assert(covered == (1 to 103).map(i => s"w$i").toSet)
  }
}
