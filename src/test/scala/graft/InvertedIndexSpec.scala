package graft

import graft.ext.InvertedIndex

/** Positional inverted index + exact phrase search: postings under the
  * house tokenization, consecutive-position intersection semantics. */
class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("postings: 0-based positions, lower-cased tokens, null/blank texts contribute nothing") {
    val docs = Seq((1L, Some("Alpha beta  ALPHA")), (2L, None),
      (3L, Some("   "))).toDF("doc_id", "text")
    val p = InvertedIndex.postings(docs, "doc_id", "text")
      .as[(String, Long, Int)].collect().toSet
    assert(p == Set(("alpha", 1L, 0), ("beta", 1L, 1), ("alpha", 1L, 2)))
  }

  test("phraseSearch: consecutive-only, overlapping occurrences counted, case-insensitive query, order matters") {
    val docs = Seq((1L, "a b a b a"), (2L, "b a"), (3L, "a x b"))
      .toDF("doc_id", "text")
    val post = InvertedIndex.postings(docs, "doc_id", "text")
    def counts(phrase: Seq[String]) =
      InvertedIndex.phraseCounts(post, phrase)
        .as[(Long, Long)].collect().toMap
    // doc 3 has both words but NOT adjacent — must not match
    assert(counts(Seq("A", "b")) == Map(1L -> 2L))
    // reversed phrase is a different phrase
    assert(counts(Seq("b", "a")) == Map(1L -> 2L, 2L -> 1L))
    // 3-word phrase with overlapping starts (pos 0 and pos 2)
    assert(counts(Seq("a", "b", "a")) == Map(1L -> 2L))
    // absent word → empty result, not an error
    assert(counts(Seq("a", "zzz")).isEmpty)
  }

  test("phraseSearch emits the start position of every match") {
    val docs = Seq((1L, "x a b y a b")).toDF("doc_id", "text")
    val got = InvertedIndex.phraseSearch(
        InvertedIndex.postings(docs, "doc_id", "text"), Seq("a", "b"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 1), (1L, 4)))
  }
}
