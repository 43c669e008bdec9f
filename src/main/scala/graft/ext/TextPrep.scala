package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-training text preparation (SURVEY §7.6): PII scrubbing and
  * token-window chunking. Pure column expressions end-to-end — narrow,
  * codegen'd, no UDFs, no shuffle; both scale linearly with executors.
  *
  * Tokenization matches the house rule used by TextStats/Dedup
  * (`split(trim(lower(text)), "\s+")`) so chunk boundaries line up with
  * token counts and TF-IDF terms elsewhere in the engine.
  */
object TextPrep {

  /** Conservative PII patterns, portable between Java regex and RE2 (the
    * DuckDB oracle re-runs them verbatim): emails, NANP-style phone
    * numbers, and long digit runs (account/government IDs). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val IdRe = "\\b\\d{9,}\\b"

  /** Replace each PII class with a typed mask token. Order matters: emails
    * first (their local part can contain digit runs), then phones, then
    * bare ID runs. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IdRe, "<ID>")

  /** Count of PII matches (pre-scrub), for curation accounting. */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailRe)) + regexp_count(text, lit(PhoneRe)) +
      regexp_count(text, lit(IdRe))

  /** Overlapping token windows: chunk i covers tokens
    * `[i*stride, i*stride + window)`; the last chunk may be short; a doc
    * shorter than `window` yields exactly one chunk. Chunk count is
    * integer-exact: `1 + ceil((n - window)/stride)` for n > window.
    * The explode is a narrow op — no shuffle, bounded ~n/stride fan-out. */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(id.as("doc_id"),
        split(trim(lower(text)), "\\s+").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_tok") <= window, lit(1L))
          // integer ceil((n-window)/stride) + 1; `div` keeps it exact
          .otherwise(expr(
            s"(n_tok - $window + ${stride - 1}) DIV $stride + 1")))
      .withColumn("chunk_no", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_no"),
        array_join(slice(col("toks"),
          (col("chunk_no") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk"),
        least(lit(window.toLong), col("n_tok") - col("chunk_no") * stride)
          .as("chunk_tokens"))
  }
}
