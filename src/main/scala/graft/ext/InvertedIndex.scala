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

  /** Sparse term-frequency cosine pairs — the LEXICAL twin of the
    * embedding-space near-dup family ([[SimSearch]]): document similarity
    * from the term-vector dot product, computed entirely on posting lists.
    * Two docs' cosine is Σ tf_a·tf_b / (‖a‖·‖b‖) over shared terms, so the
    * pair table comes from ONE self-join of the (doc, term, tf) aggregate
    * on term — never an all-pairs document join.
    *
    * `maxDf` is the scale fence (the [[Dedup.sourceOverlap]] discipline):
    * a term in d documents contributes C(d,2) candidate pairs, so
    * stopword-grade terms (df > maxDf) are EXCLUDED from the vector space
    * (both dot products and norms — the pruned space is self-consistent
    * and cosines stay in [0,1]). That caps the per-term fanout at
    * C(maxDf,2) and is also the standard IR relevance move: ubiquitous
    * terms carry no signal.
    *
    * The term unit is the word `n`-gram (shingle). n=1 is plain bag of
    * words; real lexical near-dup uses n≥3 — and that is ALSO the scale
    * lever: shingle vocabulary grows with n, so document frequencies (and
    * with them the C(df,2) pair fanout) collapse. On a small-vocabulary
    * corpus unigram dfs approach the corpus size and the "pair join"
    * degenerates toward all-pairs no matter the fence; 3-gram dfs track
    * actual shared phrasing. Measured here at sf0.1: n=1 ran 120 s, n=3
    * runs ~2 s on the same corpus for exactly that reason.
    *
    * Exactness: tf values and dot products are integers, norms are
    * `sqrt(Σ tf²)` (correctly rounded), the cosine is one multiply + one
    * divide — every value replays bit-for-bit in the DuckDB oracle.
    *
    * Pair generation is the fence-bounded posting LIST, not a posting-row
    * self-join: after the df fence admits a term, its whole
    * (doc, tf, norm) list is ≤ maxDf entries, and the C(df,2) ordered
    * pairs come from TWO chained generators — `posexplode` of the list,
    * then `explode(slice(list, i+2, …))` per element — which run inside
    * whole-stage codegen (the earlier higher-order `transform × transform`
    * lambda expansion evaluated interpreted; swapping it for generators
    * measured ~1.5× end-to-end on the 8× bench corpus). The fence runs
    * FIRST (a count aggregate), so a stopword-grade term at 100 TB is
    * dropped before any list is collected — no unbounded array ever
    * materializes.
    *
    * Norms ride IN the posting-list structs (joined once onto the fenced
    * postings — O(postings) rows), so each pair row already carries
    * `norm_a · norm_b` and the aggregated pair table — the biggest
    * relation in the whole plan, C(df,2)-fold larger than the postings —
    * is never joined against anything.
    *
    * Output: (doc_a, doc_b, dot, cosine), doc_a < doc_b,
    * cosine ≥ minSim. */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Long, minSim: Double): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(maxDf > 1, s"maxDf must be > 1: $maxDf")
    require(minSim >= 0 && minSim <= 1, s"minSim out of [0,1]: $minSim")
    val tf = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextExprs.wordNGrams(col(textCol), n,
          distinct = false)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val kept = tf.join(
      tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
        .select(col("tok")),
      Seq("tok"))
    // norms read `kept` directly rather than unfolding the collected
    // lists: the tf exchange under `kept` is shared with the pair branch
    // (exchange reuse), while unfolding would re-run the collect_list
    // final merge — rebuilding every posting array a second time
    // (measured slower on the 8× corpus)
    val norms = kept.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("tf") * col("tf"))).as("norm"))
    // (doc_id, tf, norm) posting list per admitted term, doc-ordered
    // (struct sort is lexicographic and doc_id leads; (tok, doc_id) is
    // unique, so later fields never break a tie) — ≤ maxDf entries by the
    // fence above. The norm join lands on the POSTINGS (≤ |corpus n-grams|
    // rows), the only place it stays O(postings).
    val lists = kept.join(norms, Seq("doc_id"))
      .groupBy(col("tok"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("tf"), col("norm")))).as("__ps"))
    // i < j over the ordered list ⇒ doc_a < doc_b by construction — the
    // same pair set (and the same integer products) a self-join's
    // doc_a < doc_b filter would keep. `first(nn)` is well-defined: every
    // row of one (doc_a, doc_b) group carries the identical product.
    lists
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "__x")))
      .select(col("__x.doc_id").as("doc_a"), col("__x.tf").as("__ta"),
        col("__x.norm").as("__na"),
        explode(expr("slice(__ps, __i + 2, size(__ps))")).as("__y"))
      .select(col("doc_a"), col("__y.doc_id").as("doc_b"),
        (col("__ta") * col("__y.tf")).as("__prod"),
        (col("__na") * col("__y.norm")).as("__nn"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("__prod")).as("dot"), first(col("__nn")).as("__nn"))
      .withColumn("cosine", col("dot") / col("__nn"))
      .filter(col("cosine") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("dot"), col("cosine"))
  }
}
