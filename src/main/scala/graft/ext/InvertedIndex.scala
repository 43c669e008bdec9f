package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted index + positional phrase search — the retrieval-side companion
  * to the dedup/decontamination family: the same corpus that is deduped and
  * packed also gets QUERIED ("which documents contain this exact phrase"),
  * and at 100 TB that must be a posting-list equi-join, not a
  * `text LIKE '%...%'` full scan.
  *
  * [[postings]] materializes the classic positional index: one
  * (tok, doc_id, pos) row per token occurrence, tokenized by the corpus
  * house rule (`split(trim(lower(text)), "\\s+")` — the exact rule of
  * [[TextStats]]' n-gram/fluency operators, so index and analysis surfaces
  * cannot disagree on token boundaries). Written out partitioned by token
  * (or bucketed on it), the index serves every later phrase query without
  * touching the corpus again.
  *
  * [[phraseSearch]] answers an exact consecutive-phrase query by
  * intersecting posting lists positionally: word i of the phrase must
  * appear at `pos + i` of the same document. Each phrase word first
  * SELECTS its posting list (`tok = 'w'` — a pushed scan predicate, tiny
  * against a token-partitioned index), then the lists chain-join on
  * `(doc_id, pos + i)` — shuffled equi-joins whose inputs are the posting
  * lists of the query words only, never the corpus. Cost scales with the
  * document frequency of the phrase's RAREST word, the standard
  * intersection bound of an IR engine.
  */
object InvertedIndex {

  /** Positional postings (tok, doc_id, pos), pos 0-based within the
    * document's token stream. Null/empty texts contribute no postings. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .select(col("tok"), col("doc_id"), col("pos"))

  /** Exact consecutive-phrase matches: one row per (doc_id, pos) where the
    * full phrase starts, plus the per-document match count rollup is left
    * to the caller (`groupBy(doc_id).count`). Phrase words are matched
    * case-insensitively against the lower-cased index. */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must not be empty")
    val words = phrase.map(_.trim.toLowerCase)
    require(words.forall(_.nonEmpty), s"blank phrase word in: $phrase")
    val first = postings.filter(col("tok") === words.head)
      .select(col("doc_id"), col("pos"))
    words.tail.zipWithIndex.foldLeft(first) { case (acc, (word, i)) =>
      val next = postings.filter(col("tok") === word)
        .select(col("doc_id").as("__d"), col("pos").as("__p"))
      acc.join(next,
          acc("doc_id") === col("__d") && acc("pos") + (i + 1) === col("__p"))
        .drop("__d", "__p")
    }
  }

  /** Per-document phrase frequency: (doc_id, n_matches) for documents
    * containing the phrase at least once. */
  def phraseCounts(postings: DataFrame, phrase: Seq[String]): DataFrame =
    phraseSearch(postings, phrase)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
}
