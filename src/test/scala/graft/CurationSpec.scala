package graft

import org.apache.spark.sql.functions._
import graft.ext.Curation
import graft.model.Tables

/** The composed curation flow: gates drop what they should, survivors are
  * enriched, and the accounting report is consistent with the output. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf(), "documents")

  test("curate drops exact duplicates and keeps the smallest-id copy") {
    val out = Curation.curate(docs)
    // q09-verified ground truth: one keeper per identical content
    val keepers = graft.ext.Dedup.exact(docs, "doc_id", "text")
      .select(col("keeper_id")).as[Long].collect().toSet
    val kept = out.select(col("doc_id")).as[Long].collect().toSet
    assert(kept.subsetOf(keepers))
    assert(out.count() == out.select("doc_id").distinct().count())
  }

  test("quality gate honors thresholds; language gate filters") {
    val strict = Curation.Gates(minChars = 1000000)
    assert(Curation.curate(docs, strict).count() == 0)
    val langs = docs.select(col("lang")).distinct().as[String].collect()
    val one = Curation.Gates(langAllow = Seq(langs.head))
    val curated = Curation.curate(docs, one)
    assert(curated.select("lang").distinct().as[String].collect().toSeq == Seq(langs.head))
  }

  test("embedding join enriches matching docs and report ties out") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val out = Curation.curate(docs, embeddings = Some(emb))
    assert(out.columns.contains("embedding") && out.columns.contains("fp_sha256"))
    val rep = Curation.report(docs).as[(String, Long)].collect().toMap
    assert(rep.keySet == Set("exact_dedup", "near_dedup", "quality", "language", "curated"))
    assert(rep("curated") == Curation.curate(docs).count())
    // every gate drop count is within [0, total]
    val total = docs.count()
    assert(rep.values.forall(v => v >= 0 && v <= total))
  }
}
