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

  test("fluency and embedding-outlier gates compose; unscorable docs pass them") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val gates = Curation.Gates(minFluency = Some(1e-9),
      outlierFrac = Some(0.1))
    val rep = Curation.report(docs, gates, Some(emb))
      .as[(String, Long)].collect().toMap
    assert(rep.keySet == Set("exact_dedup", "near_dedup", "quality",
      "language", "fluency", "embedding_outlier", "curated"))
    // the outlier gate drops exactly the flagged bottom decile of docs
    // that HAVE embeddings
    val flagged = graft.ext.SimSearch.embeddingOutliers(emb, "vec_id",
        "embedding", 8, 0.1)
      .filter(col("is_outlier")).count()
    assert(rep("embedding_outlier") == flagged)
    // with a floor of ~0 every scorable doc passes fluency
    assert(rep("fluency") == 0)
    assert(rep("curated") == Curation.curate(docs, gates, Some(emb)).count())
    // an impossible fluency floor drops every scorable doc
    val hard = Curation.report(docs,
        Curation.Gates(minFluency = Some(2.0)), Some(emb))
      .as[(String, Long)].collect().toMap
    val scorable = graft.ext.TextStats.bigramFluency(docs, "doc_id", "text")
      .filter(col("mean_prob_r9").isNotNull).count()
    assert(hard("fluency") == scorable)
  }

  test("full publish flow: curate -> scrub -> sample -> chunk -> pack -> write") {
    import graft.ext.{Corpus, Sampling, TextPrep}
    val out = tmpDir("publish")
    val curated = Curation.curate(docs)
      .select(col("doc_id"), TextPrep.scrubPii(col("text")).as("text"))
    val sampled = Sampling.uniform(curated, col("doc_id"), 0.8)
    val chunks = TextPrep.chunkTokens(sampled, col("doc_id"), col("text"), 32, 16)
      .withColumn("chunk_id",
        concat(col("doc_id"), lit("_"), col("chunk_no")))
    val packed = Corpus.packSequences(chunks, col("chunk_id"), col("chunk"),
      capacity = 64, nShards = 2)
    Corpus.writeSharded(packed, out, "shard",
      Seq("pack_id", "pack_offset"), maxRecordsPerFile = 500L)

    val published = spark.read.parquet(out)
    // accounting ties out end to end: every chunk of every sampled doc lands
    assert(published.count() == chunks.count() && published.count() > 0)
    assert(published.select("shard").distinct().count() <= 2)
    // deterministic: the same flow re-run produces the identical corpus
    val out2 = tmpDir("publish2")
    Corpus.writeSharded(
      Corpus.packSequences(chunks, col("chunk_id"), col("chunk"), 64, 2),
      out2, "shard", Seq("pack_id", "pack_offset"), 500L)
    val a = published.select("doc_id", "shard", "pack_id", "pack_offset")
      .collect().map(_.toString).sorted
    val b = spark.read.parquet(out2)
      .select("doc_id", "shard", "pack_id", "pack_offset")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
