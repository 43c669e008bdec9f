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

  test("sparseCosinePairs: hand-computed cosines, identical docs at 1.0, maxDf fence prunes stopwords") {
    val docs = Seq(
      (1L, "x x y"), (2L, "x x y"),   // identical → cosine 1
      (3L, "x y y"),                  // vs doc1: dot=2·1+1·2=4, norms √5·√5
      (4L, "z z z"))                  // disjoint from the rest
      .toDF("doc_id", "text")
    val got = InvertedIndex.sparseCosinePairs(docs, "doc_id", "text",
        n = 1, maxDf = 10L, minSim = 0.0)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // IEEE-exact expectations: norms are √5, so even identical vectors
    // land at 5/(√5·√5) — one ulp under 1.0. The oracle replays the same
    // operation sequence, so this is the portable value, not a bug.
    val n5 = math.sqrt(5.0) * math.sqrt(5.0)
    assert(got((1L, 2L)) == ((5L, 5.0 / n5)))
    assert(got((1L, 3L)) == ((4L, 4.0 / n5)))
    assert(got((2L, 3L)) == ((4L, 4.0 / n5)))
    assert(!got.contains((1L, 4L)) && !got.contains((3L, 4L)))
    // minSim cuts the tail
    val strict = InvertedIndex.sparseCosinePairs(docs, "doc_id", "text",
        n = 1, maxDf = 10L, minSim = 0.9)
      .as[(Long, Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    assert(strict == Set((1L, 2L)))
    // maxDf fence: 'x' (df 4) prunes out of the vector space, 'y' (df 2)
    // stays — docs 1,2 still match on y alone at exactly 1.0, while the
    // x-only links to docs 3,4 disappear with the stopword
    val docs2 = Seq((1L, "x y"), (2L, "x y"), (3L, "x a"), (4L, "x b"))
      .toDF("doc_id", "text")
    val fenced = InvertedIndex.sparseCosinePairs(docs2, "doc_id", "text",
        n = 1, maxDf = 3L, minSim = 0.0)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    assert(fenced == Map((1L, 2L) -> 1.0))
    // without the fence the shared stopword binds every pair
    assert(InvertedIndex.sparseCosinePairs(docs2, "doc_id", "text",
      n = 1, maxDf = 10L, minSim = 0.0).count() == 6L)
  }

  test("sparseCosinePairs n=3: shared phrasing matches, shared vocabulary doesn't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumps over a lazy dog"),   // shared word run
      (3L, "dog lazy the over jumps fox brown quick the")) // same WORDS, no shared 3-gram
      .toDF("doc_id", "text")
    val got = InvertedIndex.sparseCosinePairs(docs, "doc_id", "text",
        n = 3, maxDf = 10L, minSim = 0.0)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // docs 1,2 share "quick brown fox","brown fox jumps","fox jumps over"
    assert(got((1L, 2L)) == 3L)
    // word-scrambled doc 3 shares no 3-gram with either — the unigram
    // degeneration this operator's n lever exists to avoid
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }
}
