package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY §7.6):
  * tokenization stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All native `Column` expressions — codegen'd, no UDFs —
  * so they stream through a 100 TB corpus scan without materialization.
  */
object TextStats {

  /** Whitespace token count. `\s+` on the trimmed text matches DuckDB's
    * `regexp_split_to_array(trim(x), '\s+')` for the oracle. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Mean token length = non-space chars / tokens (exact int/int → double). */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text)

  /** Fraction of characters that are a-z (quality signal). */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") / length(text)

  /** Multinomial char-n-grams (duplicates KEPT — counts are the model) of
    * the lowercased text, for each n in `ns`. Pure codegen expressions:
    * sequence + substr + a length filter (which also voids the
    * descending-sequence trap on texts shorter than n). */
  private def charGrams(text: Column, ns: Seq[Int]): Column = {
    val low = lower(text)
    ns.map { n =>
      filter(
        transform(sequence(lit(1), greatest(length(low) - (n - 1), lit(1))),
          i => low.substr(i, lit(n))),
        g => length(g) === n)
    }.reduce(concat(_, _))
  }

  /** TRAINED language identification — multinomial naive-Bayes-style
    * scoring over char 2-3-grams (the fastText/CLD shape cut to the house
    * log-free discipline): a labeled reference corpus trains per-language
    * gram counts; each target doc scores, per language, the MEAN add-α
    * gram probability (one IEEE division per gram — integer counts, no
    * log, no libm — the q76/q91 exactness discipline, so a SQL oracle
    * replays it bit-for-bit where a log-likelihood product could not),
    * and the winner is the highest mean (ties broken by language name,
    * deterministic). The upgrade over [[stopwordRatio]]: trained on
    * whatever languages the labeled slice carries, sensitive to
    * character-level signal (diacritics, orthography) that survives in
    * word-salad or short texts where stopwords never appear.
    *
    * Scale shape: the reference pays two count aggregates once; the
    * target pays one gram explode × |languages| (the per-language score
    * fan-out every NB classifier does) with the per-language totals
    * broadcast, one LEFT equi-join on (lang, gram), and one window over
    * (doc, lang) rows. O(ref grams + L · target grams).
    *
    * Output: (doc_id, lang, score_r9, n_grams) — one row per target doc;
    * gram-less docs (null/empty/shorter than every n) keep a null lang. */
  def langIdAgainst(labeled: DataFrame, labelCol: String, textCol: String,
                    target: DataFrame, idCol: String, targetTextCol: String,
                    ns: Seq[Int] = Seq(2, 3),
                    alpha: Double = 0.5): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram sizes $ns")
    require(alpha > 0, s"alpha must be positive: $alpha")
    import org.apache.spark.sql.expressions.Window
    val ref = labeled.filter(col(textCol).isNotNull)
      .select(col(labelCol).as("lang"),
        explode(charGrams(col(textCol), ns)).as("g"))
    val cg = ref.groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cg"))
    val ct = ref.groupBy(col("lang")).agg(count(lit(1)).as("ct"))
    val v = ref.agg(count_distinct(col("g")).as("v"))
    val langTotals = broadcast(ct.crossJoin(v)) // L rows
    val tgt = target.filter(col(targetTextCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(charGrams(col(targetTextCol), ns)).as("g"))
    val perLang = tgt.crossJoin(langTotals)
      .join(cg, Seq("lang", "g"), "left")
      .select(col("doc_id"), col("lang"),
        ((coalesce(col("cg"), lit(0L)) + lit(alpha)) /
          (col("ct") + lit(alpha) * col("v"))).as("pr"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_grams"),
        round(graft.functions.SafeCasts.decimalAvg(col("pr"), 12), 9)
          .as("score_r9"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_r9").desc, col("lang").asc)
    val winners = perLang.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    target.select(col(idCol).as("doc_id"))
      .join(winners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("score_r9"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
  }

  /** Stopword-ratio language scorer: fraction of tokens in a stopword list.
    * An n-gram/stopword heuristic is the classic cheap lang-ID. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    hits.cast("double") / size(toks)
  }

  val englishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the pre-tokenization split
    * BPE vocabularies are trained over. Regex-only, so it stays codegen'd
    * and matches DuckDB's regexp_extract_all for the oracle. */
  def bpeishTokenCount(colName: String): Column =
    expr(s"size(regexp_extract_all($colName, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")

  /** Content fingerprints: md5 + sha256 over the exact text bytes. */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp_md5", md5(col(textCol)))
      .withColumn("fp_sha256", sha2(col(textCol), 256))

  /** Top-k TF-IDF terms per document — the classic distinctive-term scorer
    * a training-data pipeline uses for quality/topic signals.
    *
    * Ranking is by integer-exact keys (tf desc, df asc, term) rather than
    * the float score, so the result order is reproducible across engines —
    * `ln` differs by ±1 ulp between libm implementations, which could flip
    * near-equal float ranks; the score itself is emitted rounded to 6dp
    * where that ulp vanishes. Two aggregations + one window — each shuffles
    * on a key (doc or term), nothing collects beyond the N scalar. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.count() // one bounded scalar job, reused as a literal
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df derived from tf — (doc,term) is unique there, so a count per term
    // equals countDistinct(doc) over the raw tokens. The count deliberately
    // reads `tf` (always >= 1): otherwise column pruning drops `tf` from
    // this branch's copy of the (doc,term) aggregate, the two subtrees stop
    // being canonically equal, and ReuseExchange can't collapse them — the
    // corpus would be scanned and exploded twice.
    val dfreq = tf.groupBy(col("term"))
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("rnk").cast("long").as("rnk"),
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6).as("tfidf_r6"))
  }

  /** Per-document quality report — one pass, all expressions fused. */
  def qualityReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      avgTokenLen(t).as("avg_token_len"),
      alphaRatio(t).as("alpha_ratio"),
      stopwordRatio(t, englishStopwords).as("en_stopword_ratio"))
  }

  /** Within-document n-gram repetition profile — the duplicate-n-gram
    * quality signal corpus filters cut on (machine-generated and boiler-
    * plate text repeats itself; clean prose doesn't): per doc, the total
    * and distinct n-gram counts, the duplicated-gram fraction, and the
    * most frequent gram's share. Docs with fewer than `n` tokens emit no
    * row (no grams to profile).
    *
    * Plan: positional grams via the single-pass [[graft.functions.TextExprs]]
    * expression (multiplicity kept), exploded straight into a two-level
    * aggregate — the (doc, gram) shuffle carries narrow rows and partial
    * aggregation collapses repeats map-side, so cost is O(tokens) with no
    * pair blowup. */
  /** Corpus-trained bigram fluency score — the lightweight form of the
    * CCNet-style LM quality gate: train add-α-smoothed bigram statistics ON
    * the corpus itself, then score each document by the mean conditional
    * probability of its tokens given their predecessor. Gibberish, shuffled
    * text, and vocabulary soup score near the uniform floor α/(C+αV);
    * text made of common collocations scores orders of magnitude higher.
    *
    * Deliberately LOG-FREE: mean log-prob (perplexity) needs libm `log`,
    * which is not correctly rounded and differs across engines — the same
    * reason the codebase's sqrt-over-pow rule exists. Every number here is
    * IEEE-exact instead: counts are integers, α=0.5 terms are exact
    * doubles, one division per bigram (correctly rounded by IEEE 754), and
    * the per-doc mean runs through the decimal-exact sum — so the DuckDB
    * oracle hash-matches bit-for-bit. The ORDERING of documents under
    * mean-prob differs from mean-log-prob but separates the same tails.
    *
    * Output: (doc_id, n_bigrams, mean_prob_r9); documents with fewer than
    * two tokens (including null text) report (0, null).
    *
    * Scale shape: one window pass per doc for (prev, tok) pairs (shuffle on
    * doc_id), two count aggregates shuffling the token/pair strings once,
    * the vocabulary size broadcast as a 1-row literal side, and the scoring
    * join an equi-join on (prev, tok)/(prev). O(total tokens) end to end. */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.5): DataFrame =
    bigramFluencyAgainst(docs, docs, idCol, textCol, alpha)

  /** Cross-corpus fluency gate — CCNet's ACTUAL setup: the LM statistics
    * come from a trusted REFERENCE corpus (Wikipedia in the paper) and the
    * TARGET corpus is scored against them, so fluent-but-alien target text
    * scores low even when it is self-consistent. [[bigramFluency]] is the
    * `ref = target` special case (and delegates here — the self-trained
    * path stays bit-identical, q76's oracle unchanged).
    *
    * Smoothing covers out-of-reference events: an unseen (prev, tok) pair
    * contributes cb = 0, an unseen context cp = 0, so the add-α estimate
    * degrades smoothly to α/(α·V) = 1/V for fully-novel bigrams rather
    * than poisoning the mean with zeros or nulls; V is the REFERENCE
    * vocabulary. Same exactness discipline as [[bigramFluency]] (integer
    * counts, one IEEE division per bigram, decimal-exact mean), so the
    * q82 oracle hash-matches bit-for-bit.
    *
    * Scale shape: reference pays two count aggregates once; the target
    * pays its own window pass and two LEFT equi-joins on (prev, tok)/
    * (prev). O(ref tokens + target tokens). */
  def bigramFluencyAgainst(ref: DataFrame, target: DataFrame,
                           idCol: String, textCol: String,
                           alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    import org.apache.spark.sql.expressions.Window
    def toksOf(d: DataFrame) = d.select(col(idCol).as("doc_id"),
      posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("p", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    def bigramsOf(d: DataFrame) = toksOf(d)
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("doc_id"), col("prev"), col("tok"))
    val refBig = bigramsOf(ref)
      .localCheckpoint() // read 2-3×: pair counts, context counts, self-scoring
    val tgtBig = if (target eq ref) refBig else bigramsOf(target)
    val cb = refBig.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cb"))
    val cp = refBig.groupBy(col("prev")).agg(count(lit(1)).as("cp"))
    val v = toksOf(ref).agg(countDistinct(col("tok")).as("v"))
    val scored = tgtBig
      .join(cb, Seq("prev", "tok"), "left")
      .join(cp, Seq("prev"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        ((coalesce(col("cb"), lit(0L)) + lit(alpha)) /
          (coalesce(col("cp"), lit(0L)) + lit(alpha) * col("v"))).as("pr"))
    target.select(col(idCol).as("doc_id"))
      .join(scored.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            round(graft.functions.SafeCasts.decimalAvg(col("pr"), 12), 9)
              .as("mean_prob_r9")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_prob_r9"))
  }

  /** Trigram fluency with STUPID BACKOFF (Brants et al. 2007, "Large
    * Language Models in Machine Translation") against a reference-corpus
    * LM — the longer-context upgrade of [[bigramFluencyAgainst]]: a seen
    * trigram scores its MLE ratio c3/c2ctx; an unseen one backs off to
    * λ·(bigram ratio), then λ²·(unigram frequency), with λ²/V as the
    * fully-novel floor. Backoff (vs interpolation) keeps every score ONE
    * integer-count division plus at most two λ multiplies — no log, no
    * libm — so with the decimal-exact mean the result hash-matches a SQL
    * oracle bit-for-bit, the q76/q82 discipline.
    *
    * Scale shape: the reference pays four count aggregates once (trigram,
    * trigram-context, bigram, unigram); the target pays one window pass
    * and five LEFT equi-joins plus a broadcast 1-row (N, V). O(ref tokens
    * + target tokens). Output: (doc_id, n_trigrams, mean_score_r9) — one
    * row per target doc, <3-token docs null-scored. */
  def trigramFluencyAgainst(ref: DataFrame, target: DataFrame,
                            idCol: String, textCol: String,
                            lambda: Double = 0.4): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda must sit in (0, 1]: $lambda")
    import org.apache.spark.sql.expressions.Window
    def toksOf(d: DataFrame) = d.select(col(idCol).as("doc_id"),
      posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("p", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    def trisOf(d: DataFrame) = toksOf(d)
      .withColumn("p1", lag(col("tok"), 1).over(w))
      .withColumn("p2", lag(col("tok"), 2).over(w))
      .filter(col("p2").isNotNull)
      .select(col("doc_id"), col("p2"), col("p1"), col("tok"))
    val refToks = toksOf(ref).localCheckpoint()
    val refTris = trisOf(ref).localCheckpoint()
    val tgtTris = if (target eq ref) refTris else trisOf(target)
    val c3 = refTris.groupBy(col("p2"), col("p1"), col("tok"))
      .agg(count(lit(1)).as("c3"))
    val c3ctx = refTris.groupBy(col("p2"), col("p1"))
      .agg(count(lit(1)).as("c3ctx"))
    val refBig = refToks
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("p1"), col("tok"))
      .localCheckpoint()
    val c2 = refBig.groupBy(col("p1"), col("tok")).agg(count(lit(1)).as("c2"))
    val c2ctx = refBig.groupBy(col("p1")).agg(count(lit(1)).as("c2ctx"))
    val c1 = refToks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val nv = refToks.agg(count(lit(1)).as("n_tok"),
      countDistinct(col("tok")).as("v"))
    val lam = lit(lambda)
    val scored = tgtTris
      .join(c3, Seq("p2", "p1", "tok"), "left")
      .join(c3ctx, Seq("p2", "p1"), "left")
      .join(c2, Seq("p1", "tok"), "left")
      .join(c2ctx, Seq("p1"), "left")
      .join(c1, Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc_id"),
        when(col("c3").isNotNull, col("c3") / col("c3ctx"))
          .otherwise(lam * when(col("c2").isNotNull, col("c2") / col("c2ctx"))
            .otherwise(lam * when(col("c1").isNotNull, col("c1") / col("n_tok"))
              .otherwise(lit(1.0) / col("v")))).as("s"))
    target.select(col(idCol).as("doc_id"))
      .join(scored.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_trigrams"),
            round(graft.functions.SafeCasts.decimalAvg(col("s"), 12), 9)
              .as("mean_score_r9")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("mean_score_r9"))
  }

  /** Self-trained special case of [[trigramFluencyAgainst]]. */
  def trigramFluency(docs: DataFrame, idCol: String, textCol: String,
                     lambda: Double = 0.4): DataFrame =
    trigramFluencyAgainst(docs, docs, idCol, textCol, lambda)

  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextExprs.wordNGrams(col(textCol), n,
        distinct = false)).as("gram"))
    grams.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("n_grams"),
        count(lit(1)).cast("long").as("n_distinct"),
        round(lit(1.0) - count(lit(1)).cast("double")
          / sum(col("cnt")).cast("double"), 6).as("dup_frac_r6"),
        round(max(col("cnt")).cast("double")
          / sum(col("cnt")).cast("double"), 6).as("top_frac_r6"))
  }
}
