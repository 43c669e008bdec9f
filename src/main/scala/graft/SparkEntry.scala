package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.functions.{JsonFlatten, SafeCasts}
import graft.functions.JsonFlatten.{AsLong, KeySpec}
import graft.functions.SafeCasts._
import graft.ops.{Denormalize, Timeline}
import graft.ext.{Dedup, Sampling, SimSearch, TextStats}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ §7.6 extensions), each with a DuckDB oracle where the
  * semantics are SQL-expressible.
  *
  * Oracle-parity house rules (SURVEY §7.5):
  *  - every computed column aliased identically on both sides;
  *  - sums over doubles go through the decimal-exact pattern
  *    ([[SafeCasts.decimalSum]]) so results are order-independent and
  *    bit-identical across engines;
  *  - counts/ranks cast to BIGINT on both sides;
  *  - LIMIT only after a total deterministic ORDER BY (fixes the reference's
  *    nondeterministic bare LIMIT, SURVEY §2.12.a).
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Denormalize.ordersRollup(T(spark, dir, "orders"), T(spark, dir, "lineitem"))
  }

  // -------------------------------------------------------------------
  // Queries
  // -------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 A1-A4 + §2.3 F1 + C4-C6: scan→filter→group→agg, decimal-exact.
    "q01_pricing_summary" -> ((s, dir) =>
      Denormalize.pricingSummary(T(s, dir, "lineitem"), "2000-09-01 00:00:00")),

    // §2.3 F1 multi-column OR + §2.7 O1 deterministic top-k.
    "q02_incremental_scan" -> ((s, dir) =>
      T(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2001-06-01 00:00:00")) ||
          col("o_totalprice") >= 450000.0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey").limit(100)),

    // §2.4 J2: hierarchy denorm, dims broadcast.
    "q03_customer_geo" -> ((s, dir) =>
      Denormalize.customerGeo(T(s, dir, "customer"), T(s, dir, "nation"), T(s, dir, "region"))),

    // §2.4 J3 + §2.5 A1-A4 + §2.12.b: the runs-rollup slice (SURVEY §7.2).
    "q04_orders_rollup" -> ((s, dir) =>
      Denormalize.ordersRollup(T(s, dir, "orders"), T(s, dir, "lineitem"))),

    // §2.4 J6: aliased self-join of one dim under two roles.
    "q05_nation_pairs" -> ((s, dir) =>
      Denormalize.supplierCustomerNations(T(s, dir, "lineitem"), T(s, dir, "orders"),
        T(s, dir, "customer"), T(s, dir, "supplier"), T(s, dir, "nation"))),

    // §2.8 U1 + §2.2 P3/P4 + §2.9 C1/C3: union-of-branches event log.
    "q06_timeline_union" -> ((s, dir) => timelineUnion(s, dir)),

    // §2.6: window-derived "current version" (batch-rebuild equivalence).
    "q07_latest_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      T(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("event_type").as("last_event_type"))
    }),

    // §2.9 C8-C14: JSON flatten with permissive coercions.
    "q08_json_flatten" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k")
      JsonFlatten.flatten(T(s, dir, "events"), "props",
          Seq(KeySpec("k", AsLong, "k_long")), prefix = "p_")
        .select(col("event_id"), col("p_k_long"), col("p_full_text"),
          k.as("k_str"), safeNumeric(k).as("k_dbl"), safeBool(k).as("k_bool"))
    }),

    // §7.6 exact dedup (shuffle on digest, not text).
    "q09_dedup_exact" -> ((s, dir) =>
      Dedup.exact(T(s, dir, "documents"), "doc_id", "text")),

    // §7.6 fingerprinting: md5/sha256 + whitespace and BPE-ish token counts.
    "q10_doc_fingerprint" -> ((s, dir) =>
      TextStats.fingerprints(T(s, dir, "documents").select("doc_id", "text"), "text")
        .select(col("doc_id"), col("fp_md5"), col("fp_sha256"),
          TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextStats.bpeishTokenCount("text").cast("long").as("n_subtokens"))),

    // §7.6 text analysis: per-language aggregate profile.
    "q11_lang_profile" -> ((s, dir) =>
      T(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast("double") / count(col("n_chars"))).as("avg_chars"),
          sum(when(col("n_chars") > 300, 1).otherwise(0)).cast("long").as("n_long_docs"))),

    // §7.6 text analysis: per-document quality scoring.
    "q12_text_quality" -> ((s, dir) =>
      TextStats.qualityReport(T(s, dir, "documents"), "doc_id", "text")),

    // §7.6 similarity search: brute-force cosine top-k (baseline).
    "q13_ann_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), col("sim_r6"))
    }),

    // §2.10 M2 / §2.6: SCD2 version chain rebuilt from an event stream.
    "q14_scd2_rebuild" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events").select(
        col("user_id"), col("event_id").as("version_id"),
        col("ts").as("version_started_at"),
        lead(col("ts"), 1).over(w).as("version_ended_at"),
        lead(col("ts"), 1).over(w).isNull.as("is_current_version"))
    }),

    // §2.11 T2/T3: watermark + 90s-overlap incremental window scan. The
    // predicate is pushed on the RAW nanos column (Tables.loadSince) so the
    // scan prunes row groups instead of reading the full table.
    "q15_watermark_scan" -> ((s, dir) =>
      Tables.loadSince(s, dir, "events", "ts",
          java.sql.Timestamp.valueOf("2024-01-19 23:58:30"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("min_ts"),
          max(col("ts")).as("max_ts"), decimalSum(col("value")).as("sum_value"))),

    // §7.6 near-dup via MinHash+LSH, fully oracle-checked: the portable md5
    // hash makes signatures, bands, candidate pairs, and keeper assignments
    // reproducible in DuckDB bit-for-bit. Unigram shingles: this corpus is
    // bag-of-words near-duplicated, and the output is per-doc keeper
    // assignments, not the quadratic pair set. (Production-scale dedup uses
    // the xxhash64 fast path, same structure — Dedup.minhashDedupAssignments.)
    "q16_minhash_neardup" -> ((s, dir) =>
      Dedup.portableDedupAssignments(T(s, dir, "documents"), "doc_id", "text",
        n = 1, k = 32, bands = 4, threshold = 0.6)),

    // §7.6 cross-document boilerplate removal (CCNet-style segment-
    // frequency dedup): 8-token segments occurring in ≥2 distinct docs are
    // dropped, documents rebuilt in order. Fully value-checked — the
    // segmentation, frequency cut, and ordered rebuild replay in DuckDB
    // (which groups on segment text where Spark shuffles the xxhash64).
    "q69_segment_dedup" -> ((s, dir) =>
      Dedup.removeRepeatedSegments(T(s, dir, "documents"), "doc_id", "text",
        window = 8, minDocs = 2)),

    // §7.6 SimHash fingerprint, fully value-checked: portable md5-derived
    // token bits (two 32-bit halves) reproduce in DuckDB bit-for-bit.
    // (Production-scale fingerprinting uses the xxhash64 fast path,
    // identical aggregate structure — Dedup.simhashTable.)
    "q17_simhash" -> ((s, dir) =>
      Dedup.portableSimhashTable(T(s, dir, "documents"), "doc_id", "text")),

    // §7.6 LSH-bucketed ANN (scale path), fully value-checked: the
    // hyperplane sign literals are shared with the oracle SQL, and bucket
    // assignment / probing / cosine / ranking all use arithmetic DuckDB
    // reproduces exactly (the q13 pattern proved rank-stable parity).
    "q18_lsh_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), round(col("sim"), 6).as("sim_r6"))
    }),

    // §2.9 C5-C7: timestamp-difference durations with exact oracle parity
    // (unix_timestamp floor for minutes; µs-exact ms truncation for seconds).
    "q19_user_durations" -> ((s, dir) =>
      T(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .select(col("user_id"), col("n_events"), col("first_ts"), col("last_ts"),
          round((unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts"))) / 60.0, 2)
            .as("span_minutes"),
          (expr("(unix_micros(last_ts) - unix_micros(first_ts)) div 1000") / lit(1000.0))
            .as("span_seconds"))),

    // §7.6 embedding-cosine near-dup pairs (brute-force baseline).
    "q20_cosine_neardup" -> ((s, dir) =>
      SimSearch.cosineNearDups(T(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim_r6"))),

    // §7.6 SemDeDup-style semantic dedup: per-vector keeper decisions from
    // the cosine-neighbor graph (one row per vector, the pipeline artifact).
    "q59_semantic_dedup" -> ((s, dir) =>
      SimSearch.semanticDedupAssignments(T(s, dir, "embeddings"),
        "vec_id", "embedding", 0.4)),

    // §7.6 the SCALE path of q59, value-checked end-to-end: banded
    // multi-table LSH candidates → per-bucket cosine sweep → identical
    // keeper semantics. The oracle is built from the SAME hyperplane sign
    // literals (the q18 technique), so buckets, band slices, candidate
    // pairs, and keepers reproduce exactly in DuckDB — the 100 TB route is
    // the verified route, not an unit-tested understudy. Parameters match
    // the recall-measured profile in ExtensionsSpec (12 tables × 3 planes,
    // 0.98 recall vs exact on this corpus).
    "q60_semantic_dedup_bucketed" -> ((s, dir) =>
      SimSearch.semanticDedupAssignmentsBucketed(T(s, dir, "embeddings"),
        "vec_id", "embedding", 0.4, tables = 12, planesPerTable = 3, dim = 64)),

    // §7.6 the INCREMENTAL semantic-dedup path, value-checked end-to-end:
    // stage A builds the persisted bucket index from the first half of the
    // corpus (keeper representatives only), stage B dedups the second half
    // against that index — first-seen corpus keepers beat in-batch id
    // order. The oracle replays BOTH stages in DuckDB from the shared
    // hyperplane literals, so the streaming-corpus route (never rescan the
    // corpus, probe the index's band slices) is itself oracle-verified.
    "q61_semantic_dedup_incremental" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val idx = SimSearch.buildSemIndex(emb.filter(col("vec_id") < 250),
        "vec_id", "embedding", 0.4, tables = 12, planesPerTable = 3, dim = 64)
      SimSearch.incrementalSemanticAssignments(
        emb.filter(col("vec_id") >= 250), "vec_id", "embedding", idx,
        0.4, tables = 12, planesPerTable = 3, dim = 64)._1
    }),

    // §7.6 transitive near-dup clusters: connected components by iterative
    // min-label propagation over the q16-verified portable pair set. The
    // oracle computes the same components with a DuckDB recursive CTE
    // (transitive closure → min reachable id), so the ITERATIVE Spark
    // algorithm — convergence included — is value-checked against a
    // declarative fixpoint formulation.
    // Corpus capped at 500 docs for the same reason as q62: the md5 family
    // is the verification twin; production clustering feeds xxhash64 pairs
    // (minhashNearDups) through the same propagation.
    "q64_neardup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(
        Dedup.portableNearDups(
          T(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text"))),

    // §7.6 leakage-safe corpus split: the split unit is q64's near-dup
    // CLUSTER — near-duplicates can't straddle train/eval by construction
    // (the corpus-split leak decontamination papers warn about). Docs
    // without near-dups fall back to singleton clusters. 80/10/10 on the
    // md5 bucket of the cluster id; the oracle replays components
    // (recursive CTE) + singleton fallback + the literal bucket cuts.
    "q78_leakage_safe_split" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val labels = Dedup.nearDupClusters(
        Dedup.portableNearDups(docs, "doc_id", "text"))
      Sampling.leakageSafeSplit(docs, "doc_id", labels,
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    }),

    // §7.6 BPE subword vocabulary (Sennrich 2016): train 20 merges on the
    // corpus slice, segment it under them. The oracle replays TRAINING
    // itself — 20 unrolled (pair-count, argmax, greedy merge) DuckDB
    // stages over the q145 double-space encoding, each stage's merge pair
    // its own 1-row argmax — then the segmentation join under the learned
    // merges (see bpeTrainSegmentOracleSql). CorpusSpec's model-based
    // equivalence against an independent reference implementation stands
    // as the second, engine-independent proof.
    "q81_bpe_segment" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 100)
      val merges = graft.ext.Corpus.bpeTrain(docs, col("text"), nMerges = 20)
      graft.ext.Corpus.bpeSegment(docs, col("doc_id"), col("text"), merges)
    }),

    // §7.6 cross-source duplication matrix — corpus forensics BEFORE
    // mixture design: distinct shared verbatim 8-token segments per
    // source pair + each source's segment universe + set Jaccard. DuckDB
    // replays it text-grouped (the q09/q69 hash-vs-text divergence);
    // 20 sources ≪ the maxSources fence, so the quadratic guard is
    // inactive here (its semantics are unit-tested).
    "q80_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(T(s, dir, "documents"), "doc_id", "text",
        "source", window = 8)),

    // §7.6 epoch mixture — the multi-epoch source-weighting knob (rates
    // above 1 repeat docs deterministically: src0 ×2.5, src1 ×1, src2
    // ×0.25, everything else dropped). Fractional epochs use the q46
    // md5-bucket rule with exact power-of-two thresholds (0.5→32768,
    // 0.25→16384), so the oracle replays count + expansion bit-for-bit.
    "q79_epoch_mixture" -> ((s, dir) =>
      Sampling.epochMixture(T(s, dir, "documents"), col("source"),
          col("doc_id"),
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
        .select(col("doc_id"), col("source"),
          col("epoch").cast("long").as("epoch"))),

    // §7.6 the INCREMENTAL clustering path: stage A batch-clusters the
    // first corpus half into persisted (doc_id, cluster_id) labels; stage B
    // derives the new batch's edge set against the stage-A index (never
    // rescanning stage A's text) and folds it into the labels with
    // driver-side union-find over the contracted label graph. The oracle is
    // a DuckDB recursive CTE over the UNION of stage-A pairs and stage-B
    // incremental edges — the fold must equal the declarative fixpoint of
    // the whole union graph, min-label invariant included. Same md5
    // verification-twin rationale and 500-doc cap as q62/q64; the index for
    // CLUSTERING covers all stage-A docs (not dedup keepers: clustering
    // wants every edge).
    "q65_clusters_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      // ONE md5 signature pass over stage A: the pinned index feeds both
      // the stage-A pair derivation and stage B's incremental probes
      val idx = Dedup.portableClusterIndex(
        docs.filter(col("doc_id") < 250), "doc_id", "text")
      val labelsA = Dedup.nearDupClusters(
        Dedup.portableNearDupsOverIndex(idx))
      val edgesB = Dedup.portableIncrementalEdges(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", idx)
      Dedup.incrementalClusters(edgesB, labelsA)
    }),

    // §7.6 the fold's DELTA form — what the streaming sink actually writes
    // (Streams.Sinks.clusterFold applies it as a partition-scoped upsert:
    // O(changed rows) per batch, never a full label rewrite). The oracle
    // recomputes BOTH declarative fixpoints (stage-A-only and union graph)
    // and diffs them: the delta must be exactly the rows whose label the
    // stage-B fold changed plus the batch's new docs — nothing missing,
    // nothing spurious, untouched corpus rows never rewritten.
    "q66_clusters_delta" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val idx = Dedup.portableClusterIndex(
        docs.filter(col("doc_id") < 250), "doc_id", "text")
      val labelsA = Dedup.nearDupClusters(
        Dedup.portableNearDupsOverIndex(idx))
      val edgesB = Dedup.portableIncrementalEdges(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", idx)
      Dedup.incrementalClustersDelta(edgesB, labelsA)
    }),

    // §7.6 the incremental TEXT dedup path, value-checked end-to-end on the
    // portable md5 hash family (the q16 technique staged twice): index from
    // the first corpus half's keepers, then the second half dedups against
    // it with first-seen priority — the q61 pattern for MinHash. The corpus
    // is capped at 500 docs (= the whole verification corpus at sf0.01) on
    // purpose: the md5 family is the VERIFICATION twin (32 md5s per
    // shingle, ~13x the xxhash64 production family's constant factor), so
    // an uncapped bench run would measure hash throughput, not the engine;
    // the production family's batch-vs-corpus scaling is what ScaleProbe's
    // inc_minhash probe measures (1.0x at an 8x corpus).
    "q62_minhash_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val idx = Dedup.portableIncrementalAssignments(
        docs.filter(col("doc_id") < 250), "doc_id", "text",
        Dedup.emptyPortableIndex(s))._2
      Dedup.portableIncrementalAssignments(
        docs.filter(col("doc_id") >= 250), "doc_id", "text", idx)._1
    }),

    // Entity resolution: edit-distance near-dup pairs over the documents'
    // leading 40 chars under prefix+length blocking — the character-level
    // complement to MinHash (q16) that catches typo'd/lightly-edited keys.
    "q86_fuzzy_blocked_dedup" -> ((s, dir) =>
      Dedup.fuzzyNearDups(
        T(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("head")),
        "doc_id", "head", maxDist = 5, prefixLen = 10, lenBand = 8)),

    // §7.6 exact n-gram Jaccard (the verification metric behind MinHash).
    // Shingle arrays are computed ONCE per row in a projection below the
    // join — referencing them through join-output attributes, so
    // CollapseProject cannot inline the (expensive) array construction into
    // each of the four set expressions (the house rule from Dedup.signatures).
    "q21_ngram_jaccard" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      def uni(t: Column) = array_distinct(split(trim(lower(t)), "\\s+"))
      val sh = docs.select(col("doc_id"), uni(col("text")).as("uni"),
        Dedup.shingles(col("text"), 3).as("tri"))
      val a = sh.select(col("doc_id").as("doc_a"), col("uni").as("uni_a"),
        col("tri").as("tri_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("uni").as("uni_b"),
        col("tri").as("tri_b"))
      a.join(b, col("doc_b") === col("doc_a") + 250)
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("uni_a"), col("uni_b"))).cast("double") /
            size(array_union(col("uni_a"), col("uni_b")))).as("jaccard_1gram"),
          (size(array_intersect(col("tri_a"), col("tri_b"))).cast("double") /
            size(array_union(col("tri_a"), col("tri_b")))).as("jaccard_3gram"))
    }),

    // §2.13/§7.6: Generator path — explode tokens, global top-k by count.
    "q22_token_explode" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(20)),

    // §2.6 extension: frame-bounded running window (decimal-exact sum).
    "q23_running_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      T(s, dir, "events").select(col("user_id"), col("event_id"), col("ts"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
          .as("run_sum3"),
        count(lit(1)).over(w).as("n_window"))
    }),

    // Semi/anti joins (EXISTS / NOT EXISTS shapes).
    "q24_semi_anti" -> ((s, dir) => {
      val customer = T(s, dir, "customer")
      val orders = T(s, dir, "orders")
      val active = customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .withColumn("cohort", lit("with_orders"))
      val inactive = customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .withColumn("cohort", lit("no_orders"))
      active.unionByName(inactive)
    }),

    // §2.13: the SQL-text surface — registered views + engine functions
    // (safe casts via Registry) driven through spark.sql.
    "q25_sql_text" -> ((s, dir) => {
      graft.functions.Registry.registerAll(s)
      T(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_id,
          |  safe_long(get_json_object(props, '$.k')) AS k_long,
          |  safe_bool(CAST(user_id % 2 AS STRING)) AS odd_user
          |FROM events_v""".stripMargin)
    }),

    // Gap-based sessionization: lag + conditional cumulative window — the
    // event-analytics shape behind session windows, exact int arithmetic.
    "q26_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = T(s, dir, "events").select(col("user_id"), col("event_id"), col("ts"),
        when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(byUser)) > 30L * 60 * 1000000, 1)
          .otherwise(when(lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
          .as("new_session"))
      flagged
        .withColumn("session_no", sum(col("new_session")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
    }),

    // Event throttle/debounce summary: per (user, type), bursts are
    // q26-style gap sessions (10 min) and only each burst's first event
    // survives — the dedup a notification/alert pipeline applies. Output
    // is the suppression ledger per key.
    "q103_event_throttle" -> ((s, dir) => {
      val byKey = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
          when(unix_micros(col("ts")) -
              unix_micros(lag(col("ts"), 1).over(byKey)) > 10L * 60 * 1000000, 1)
            .otherwise(when(lag(col("ts"), 1).over(byKey).isNull, 1)
              .otherwise(0)).as("new_burst"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("new_burst")).cast("long").as("n_kept"),
          (count(lit(1)) - sum(col("new_burst"))).cast("long")
            .as("n_suppressed"))
    }),

    // CDC snapshot diff: a simulated next-version snapshot (deterministic
    // deletes/updates/inserts derived from orders itself) classified by
    // one null-safe full-outer join — the change-feed primitive for
    // snapshot-only sources and the TxTable time-travel audit.
    "q104_snapshot_diff" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val k = col("o_orderkey")
      val next = o.filter(pmod(k, lit(13)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(k, lit(5)) === 0, col("o_totalprice") * 2.0)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(pmod(k, lit(17)) === 0)
          .withColumn("o_orderkey", k + 10000000L))
      graft.ops.Diff.snapshotDiff(o, next, Seq("o_orderkey"))
    }),

    // Native session_window twin of q26 (the built-in gap-session
    // operator; split semantics are >= gap where q26's manual form is
    // > gap — the oracle states session_window's own contract).
    "q101_session_window" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end_gap"), col("n_events"))),

    // PageRank over the embedding near-dup graph (q20's pair set made
    // symmetric): centrality inside duplicate neighborhoods — hub
    // boilerplate ranks high, leaf one-off dups low. Two decimal-exact
    // iterations, replayed term-for-term by the oracle.
    "q102_pagerank" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val pairs = SimSearch.cosineNearDups(emb, "vec_id", "embedding", 0.4)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      graft.ops.Graph.pageRank(emb.select(col("vec_id").as("id")), edges,
          iters = 2, damping = 0.85)
        .select(col("id").as("vec_id"), round(col("rank"), 9).as("rank_r9"))
    }),

    // Rollup subtotals (grouping-set aggregation beyond the reference).
    "q27_rollup" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
          decimalSum(col("l_quantity")).as("sum_qty"))),

    // Full CUBE grouping sets (all four subtotal combinations).
    "q96_cube" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
          decimalSum(col("l_quantity")).as("sum_qty"))),

    // TPC-H Q5 shape: six-table star join (region-gated nations, the
    // local-supplier c_nationkey = s_nationkey twist) + revenue rollup —
    // the canonical join-order workout. Dimensions broadcast; the
    // fact-fact join shuffles on orderkey only.
    "q94_local_supplier_volume" -> ((s, dir) => {
      val cust = T(s, dir, "customer"); val ord = T(s, dir, "orders")
      val li = T(s, dir, "lineitem"); val sup = T(s, dir, "supplier")
      val nat = T(s, dir, "nation"); val reg = T(s, dir, "region")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // TPC-H Q18 shape: large-order customers — a HAVING-gated aggregate
    // feeding a semi join back onto the fact chain.
    "q95_large_orders" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(decimalSum(col("l_quantity")).as("__q"))
        .filter(col("__q") > 250.0)
        .select(col("l_orderkey"))
      T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big.select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"), "left_semi")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .agg(decimalSum(col("l_quantity")).as("sum_qty"))
    }),

    // §7.6 IVF ANN (coarse-quantizer scale path), fully value-checked:
    // lloydIters=0 keeps the quantizer at the md5-ranked sample centroids,
    // which the oracle recomputes exactly; assignment, probing, and ranking
    // then reproduce in DuckDB like q18. (Lloyd refinement stays available
    // on SimSearch.ivfTopK and is covered by the recall unit tests.)
    "q28_ivf_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          10, lloydIters = 0)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), round(col("sim"), 6).as("sim_r6"))
    }),

    // §7.6 product-quantization ANN — the memory-bound 100 TB scale path
    // (corpus scanned as m-byte codes, never raw floats). Deterministic by
    // the q28 seeding technique, so encode + ADC + ranking all replay in
    // DuckDB: codebooks are slices of the md5-ranked seed vectors,
    // distances the shared ||a||²−2a·b+||b||² expansion, the j-term sum
    // ordered on both sides.
    "q67_pq_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          10, m = 4, nCodes = 16, dim = 64)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), col("asim_r6"))
    }),

    // §7.6 PQ with ONE Lloyd refinement round — the recall path over q67's
    // raw md5 seeds (whose recall@10 floor sits near 0.2 on this corpus;
    // the refined books lift it measurably; ExtensionsSpec pins the monotone
    // k-means objective).
    // Still fully oracle-checked: the refinement is a decimal-exact
    // per-(subspace, code) element average of the seed-book assignment, so
    // DuckDB replays encode₀ → refine → encode₁ → ADC bit-for-bit.
    "q72_pq_refined" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          10, m = 4, nCodes = 16, dim = 64, lloydIters = 1)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), col("asim_r6"))
    }),

    // §7.6 IVF-PQ — both quantizers composed (probed cells bound the
    // candidates, codes bound the bytes); the oracle splices q28's
    // cell/probe machinery with q67's codebook/ADC machinery, all from the
    // same md5-ranked seeds over the normalized corpus.
    "q68_ivfpq_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          10, nCells = 16, nProbe = 4, m = 4, nCodes = 16, dim = 64)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), col("asim_r6"))
    }),

    // §7.6 IVF-PQ with refined PQ books — the full billion-scale layout
    // (coarse cells bound candidates, refined codes bound bytes) with the
    // q72 refinement spliced in; proves the refinement composes with the
    // coarse quantizer under the same exact-replay discipline. Only the PQ
    // books refine — the coarse "seed|" centroids are q68's, unchanged.
    "q73_ivfpq_refined" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          10, nCells = 16, nProbe = 4, m = 4, nCodes = 16, dim = 64,
          lloydIters = 1)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rnk"), col("asim_r6"))
    }),

    // §7.6 cross-doc duplicated-SPAN profile (Lee et al. 2022's sliding-
    // window exact-substring signal): any 8-token span in >= 2 docs is
    // duplicated text; per doc, the spans hitting the hot set and the
    // distinct token positions they cover. The oracle replays
    // tokenize → positional grams → hot set → coverage in DuckDB.
    "q74_dup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpanProfile(T(s, dir, "documents"), "doc_id", "text",
        window = 8, minDocs = 2)),

    // §7.6 the duplicated-span TRANSFORM — rebuild each doc from the token
    // positions no cross-doc duplicated span covers (q74's cut applied
    // token-exactly; order preserved, corpus rows retained).
    "q75_remove_dup_spans" -> ((s, dir) =>
      Dedup.removeDuplicatedSpans(T(s, dir, "documents"), "doc_id", "text",
        window = 8, minDocs = 2)),

    // §7.6 corpus-trained bigram fluency (the CCNet-style LM quality gate,
    // log-free so every number is IEEE-exact and the oracle hash-matches):
    // add-α bigram stats trained ON the corpus, each doc scored by the
    // decimal-exact mean conditional probability of its tokens.
    "q76_bigram_fluency" -> ((s, dir) =>
      graft.ext.TextStats.bigramFluency(T(s, dir, "documents"), "doc_id", "text")),

    // §7.6 INCREMENTAL segment dedup (the r7 ask: persisted (seg_hash,
    // n_docs) frequency index, folded batch by batch). Index from the
    // first corpus half via a fold on the empty index, second half cut
    // against the CUMULATIVE counts — a segment in one old doc + one new
    // doc is boilerplate for the new doc even though neither half alone
    // repeats it. The oracle replays both stages text-keyed in DuckDB
    // (hash-vs-text grouping: the q09/q69 collision-only divergence).
    "q77_segment_dedup_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val (_, delta) = Dedup.incrementalSegmentDedup(
        docs.filter(col("doc_id") < 250), "doc_id", "text",
        Dedup.emptySegmentIndex(s), window = 8, minDocs = 2)
      val idx = Dedup.foldSegmentIndex(Dedup.emptySegmentIndex(s), delta)
      Dedup.incrementalSegmentDedup(
        docs.filter(col("doc_id") >= 250), "doc_id", "text",
        idx, window = 8, minDocs = 2)._1
    }),

    // §7.6 cross-corpus fluency (CCNet's actual setup): bigram stats
    // trained on the first corpus half (the trusted reference), second
    // half scored against them — out-of-reference bigrams degrade to the
    // smoothed 1/V floor instead of poisoning the mean. Same bit-exact
    // discipline as q76; the oracle replays both corpora's roles.
    "q82_fluency_cross" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ext.TextStats.bigramFluencyAgainst(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
        "doc_id", "text")
    }),

    // §7.6 trigram fluency with stupid backoff (Brants 2007) — the
    // longer-context LM gate on the q82 split: seen trigrams score their
    // MLE ratio, unseen ones back off λ → λ² → λ²/V. Log-free, so every
    // score is one integer division + at most two λ multiplies and the
    // oracle hash-matches bit-for-bit.
    "q91_trigram_fluency" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ext.TextStats.trigramFluencyAgainst(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
        "doc_id", "text")
    }),

    // §7.6 ANN recall@k harness — the exact arm (q13's ranking) joined
    // against the approximate arm (q68's IVF-PQ pipeline); both arms are
    // individually hash-equal to DuckDB, so the composed per-query recall
    // table replays exactly (the oracle nests both proofs as CTEs).
    "q70_ann_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimSearch.annRecall(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        10, nCells = 16, nProbe = 4, m = 4, nCodes = 16, dim = 64)
    }),

    // §7.6 multimodal plumbing, oracle-checked on every SQL-expressible
    // column: the binary cast + byte length, the modality routing, the
    // feature shape/non-degeneracy invariants, and the real-decode fallback
    // contract (these payloads are text bytes, NOT decodable images/audio,
    // so width/height/channels/sample_rate_hz/duration_ms must be null —
    // the ImageIO/sound/AVI routes degrading to the hash decoder instead of
    // failing the batch). Actual decode values (in-test synthesized PNGs,
    // WAVs, and MJPEG AVIs) are covered by ExtensionsSpec.
    "q29_multimodal_features" -> ((s, dir) =>
      graft.ext.Multimodal.extractFeatures(
          graft.ext.Multimodal.assetsFromDocuments(T(s, dir, "documents")))
        .select(col("asset_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), col("channels"),
          col("sample_rate_hz"), col("duration_ms"),
          size(col("feature")).as("feature_dim"),
          (col("n_bytes") === 0 ||
            sqrt(aggregate(col("feature"), lit(0.0),
              (acc, x) => acc + x.cast("double") * x.cast("double"))) > 0)
            .as("feature_nonzero"))),

    // Exact order-statistics per group (interpolated quantiles).
    "q31_quantiles" -> ((s, dir) =>
      T(s, dir, "events").groupBy(col("event_type"))
        .agg(expr("round(percentile(value, 0.5), 6)").as("p50"),
          expr("round(percentile(value, 0.9), 6)").as("p90"),
          expr("round(percentile(value, 0.99), 6)").as("p99"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))),

    // Pivot (wide conditional aggregation; explicit value list so the
    // output schema is static — required for both determinism and scale).
    "q33_pivot" -> ((s, dir) =>
      T(s, dir, "events").groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()),

    // Sketch aggregates, value-checked: the sketches run for real
    // (HLL++ count-distinct, GK approximate percentile) but the emitted
    // columns are the exact values plus bounded-error booleans, so the
    // DuckDB oracle hash-matches while still failing if a sketch drifts
    // outside its guarantee. The error bands are deterministic: both
    // sketches are order/partitioning-independent on fixed input.
    // §7.6 incremental cardinality fold: per-event-type HLL sketches
    // built on two event halves, unioned, estimated — the persisted-state
    // form of q32's approx distinct (union is register-idempotent, so a
    // redelivered batch state is harmless by construction). Oracle = the
    // q32 treatment: exact distinct value-checked, estimate as a bounded-
    // error boolean (fold ≡ one-shot is exact and ScalaTest-pinned).
    "q83_distinct_fold" -> ((s, dir) => {
      import graft.functions.SketchAggs
      val ev = T(s, dir, "events")
      val a = SketchAggs.distinctState(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        col("event_type"), col("user_id"))
      val b = SketchAggs.distinctState(
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        col("event_type"), col("user_id"))
      val est = SketchAggs.distinctEstimate(SketchAggs.foldDistinctState(a, b))
      ev.groupBy(col("event_type").as("key"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .join(est, Seq("key"))
        .select(col("key").as("event_type"), col("exact_users"),
          (abs(col("estimate") - col("exact_users")) <=
            col("exact_users") * 0.05).as("users_within_5pct"))
    }),

    // Robust outlier profile: median/MAD (median absolute deviation)
    // per event type and the count beyond 3 MADs — the quality gate that
    // survives heavy tails where mean/stddev break. Exact interpolated
    // medians (proven percentile ↔ quantile_cont parity), so the counts
    // replay exactly.
    "q100_robust_outliers" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D)").as("med"))
      val mad = ev.join(med, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"),
          first(col("med")).as("med"))
      ev.join(mad, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(first(col("med")), 6).as("med_r6"),
          round(first(col("mad")), 6).as("mad_r6"),
          count(when(abs(col("value") - col("med")) > col("mad") * 3.0,
            lit(1))).as("n_outliers"))
    }),

    // §7.6 incremental quantile fold: per-event-type KLL sketches built
    // on two event halves, merged, queried at p50 — the persisted-state
    // form of q31's exact percentiles (contribution-keyed in streaming;
    // q32 oracle treatment: exact value + rank-band boolean).
    "q97_quantile_fold" -> ((s, dir) => {
      import graft.functions.SketchAggs
      val ev = T(s, dir, "events")
      val a = SketchAggs.quantileState(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        col("event_type"), col("value"))
      val b = SketchAggs.quantileState(
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        col("event_type"), col("value"))
      val est = SketchAggs.quantileEstimate(
        SketchAggs.foldQuantileState(200, a, b), Seq(0.5))
      ev.groupBy(col("event_type").as("key"))
        .agg(expr("round(percentile(value, 0.5D), 6)").as("p50_exact_r6"),
          expr("percentile(value, 0.45D)").as("__lo"),
          expr("percentile(value, 0.55D)").as("__hi"))
        .join(est, Seq("key"))
        .select(col("key").as("event_type"), col("p50_exact_r6"),
          (col("p50") >= col("__lo") && col("p50") <= col("__hi"))
            .as("p50_within_band"))
    }),

    "q32_sketches" -> ((s, dir) =>
      T(s, dir, "events").groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("au"),
          expr("percentile(value, 0.5D)").as("p50x"),
          expr("approx_percentile(value, 0.5D, 1000)").as("ap50"),
          expr("percentile(value, 0.48D)").as("lo"),
          expr("percentile(value, 0.52D)").as("hi"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("au") - col("exact_users")) <= col("exact_users") * 0.05)
            .as("users_within_5pct"),
          round(col("p50x"), 6).as("p50_r6"),
          (col("ap50") >= col("lo") && col("ap50") <= col("hi"))
            .as("p50_within_band"))),

    // As-of join (composed; oracle = DuckDB's native ASOF LEFT JOIN): each
    // event picks up the user's most recent order-day summary at-or-before
    // its timestamp.
    "q30_asof_join" -> ((s, dir) => {
      val ordersByDay = T(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          decimalSum(col("o_totalprice")).as("day_total"))
      graft.ops.AsOfJoin.asof(
          T(s, dir, "events").select("event_id", "user_id", "ts"),
          ordersByDay, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderdate", "o_orderkey", "day_total"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_o_orderdate"), col("asof_o_orderkey"), col("asof_day_total"))
    }),

    // ----------------------------------------------------------------
    // q34-q39: the six reference table-pipelines (extract.py:50-419 +
    // transform.py) run end-to-end over the full-fidelity fixtures and
    // oracle-checked against a DuckDB transliteration of the reference
    // SQL. The fixtures are materialized to parquet once per JVM so both
    // engines consume byte-identical inputs; the current_timestamp etl_*
    // audit columns are excluded (nondeterministic by construction).
    // ----------------------------------------------------------------
    "q34_ref_scenarios" -> ((s, _) =>
      graft.ops.ScenarioPipeline.extractScenarios(refSrc(s), refSince)
        .drop("etl_loaded_at", "etl_updated_at")),
    "q35_ref_node_inputs" -> ((s, _) =>
      graft.ops.ScenarioPipeline.extractNodeData(refSrc(s), refSince)
        .drop("etl_loaded_at")),
    // q36/q37: the pipeline's sink columns are DECIMAL (reference NUMERIC
    // fidelity), but the oracle harness canonicalizes DECIMAL inconsistently
    // between a DuckDB result set and a Spark parquet file (r2: rows/schema
    // matched, hash didn't — the only two DECIMAL-output queries). Cast to
    // DOUBLE on both sides for the comparison; the values are 2-3dp-rounded
    // so double conversion is exact-nearest on both engines.
    "q36_ref_run_summary" -> ((s, _) =>
      graft.ops.ScenarioPipeline.extractRuns(refSrc(s), refSince)
        .drop("etl_loaded_at", "etl_updated_at")
        .withColumn("run_duration_minutes",
          col("run_duration_minutes").cast("double"))),
    "q37_ref_node_calc" -> ((s, _) =>
      graft.ops.ScenarioPipeline.extractNodeCalc(refSrc(s), refSince)
        .drop("etl_loaded_at")
        .withColumn("processing_duration_s",
          col("processing_duration_s").cast("double"))),
    "q38_ref_event_inputs" -> ((s, _) =>
      graft.ops.ScenarioPipeline.extractEventData(refSrc(s), refSince)
        .drop("etl_loaded_at")),
    "q39_ref_timeline" -> ((s, _) =>
      graft.ops.ScenarioPipeline.extractTimeline(refSrc(s), refSince)
        .drop("etl_loaded_at")),

    // §7.6 text analysis: top-5 TF-IDF terms per document (integer-exact
    // ranking; score rounded where cross-libm ln ulps vanish).
    "q40_tfidf" -> ((s, dir) =>
      TextStats.tfidfTopTerms(T(s, dir, "documents"), "doc_id", "text", 5)),

    // §7.6 text analysis: within-doc bigram repetition profile — the
    // duplicate-n-gram quality signal corpus filters cut on (boilerplate /
    // generated text repeats; clean prose doesn't).
    "q58_repetition" -> ((s, dir) =>
      TextStats.repetitionProfile(T(s, dir, "documents"), "doc_id", "text", 2)),

    // ANALYZE-style column profile over documents (null/distinct/min-max
    // survey; the q32 sketch treatment for the HLL estimate — exact count
    // value-checked, the estimate as a 5%-band boolean).
    "q92_column_profile" -> ((s, dir) =>
      graft.ops.Stats.columnProfile(T(s, dir, "documents"),
          Seq("doc_id", "text", "lang", "source", "n_chars"))
        .select(col("column"), col("n_rows"), col("n_nulls"),
          col("null_frac_r6"), col("n_distinct"), col("distinct_within_5pct"),
          col("min_str"), col("max_str"))),

    // Equi-width value histogram (optimizer-stats building block): exact
    // IEEE bucketing against collected min/max literals, per-cell counts
    // and real value bounds.
    "q93_histogram" -> ((s, dir) =>
      graft.ops.Stats.histogram(T(s, dir, "orders"), "o_totalprice", 10)),

    // Distribution drift between two corpus snapshots: shared-edge
    // histogram alignment with per-bin mass fractions (the total-
    // variation scalar is ScalaTest-pinned; TV over KL because it needs
    // no log, so every number replays exactly).
    "q98_drift" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Stats.drift(docs.filter(col("doc_id") < 250),
        docs.filter(col("doc_id") >= 250), "n_chars", 8)
    }),

    // Theta-sketch audience overlap: per-event-type distinct-user
    // sketches intersected pairwise — set algebra HLL cannot do, exact
    // below 2^lgK retained hashes (this regime), q32 band treatment.
    "q99_theta_overlap" -> ((s, dir) => {
      import graft.functions.SketchAggs
      val ev = T(s, dir, "events")
      val est = SketchAggs.thetaOverlap(
        SketchAggs.thetaState(ev, col("event_type"), col("user_id")))
      val du = ev.select(col("event_type").as("et"), col("user_id").as("u"))
        .distinct()
      val exact = du.as("a").join(du.as("b"),
          col("a.u") === col("b.u") && col("a.et") < col("b.et"))
        .groupBy(col("a.et").as("key_a"), col("b.et").as("key_b"))
        .agg(count(lit(1)).as("exact_shared"))
      exact.join(est, Seq("key_a", "key_b"))
        .select(col("key_a"), col("key_b"), col("exact_shared"),
          (abs(col("est_shared") - col("exact_shared")) <=
            greatest(col("exact_shared") * 0.05, lit(2.0)))
            .as("shared_within_band"))
    }),

    // Scale posture: key-skew profile + salt advisory — the measurement
    // that decides q41/q42's salt factors (exact hot-key counts, shares,
    // ceil(n/target) suggested salt).
    "q89_skew_profile" -> ((s, dir) =>
      graft.ops.Skew.keyProfile(T(s, dir, "events"), col("event_type"),
        topK = 10, targetRowsPerTask = 500L)),

    // Scale posture: explicit salted two-phase aggregation (the hot-key
    // path AQE can't rewrite) — must equal the plain GROUP BY exactly.
    "q41_salted_agg" -> ((s, dir) =>
      graft.ops.Skew.saltedCount(T(s, dir, "events"), col("user_id"), 8)),

    // Scale posture: salted equi-join in its production form — hot-key-
    // ONLY salting (measure first, replicate only what needs it; a
    // uniform key like l_orderkey measures clean and joins plain — the
    // full-replication tax was the one deliberate super-linear constant
    // in the bench). Must equal the plain join either way; aggregated so
    // the oracle row set stays small. The replicated hot path is
    // spec-proven on planted skew (ApiSurfaceSpec).
    "q42_salted_join" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_extendedprice"))
      val o = T(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderstatus"))
      graft.ops.Skew.saltedJoin(li, o, Seq("k"), saltFactor = 4,
          hotKeyMinRows = 1000L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          decimalSum(col("l_extendedprice")).as("volume"))
    }),

    // Scale posture: the hot-key-ONLY salted join under measured load —
    // every event_type trips the 500-row threshold, so the whole corpus
    // routes through the hot machinery (broadcast hot-set join, left
    // replicated per cell, each pair meeting exactly once) and the
    // result must STILL equal the plain join the oracle states; q42
    // covers the complementary measured-uniform case where the same
    // operator degrades to the plain join.
    "q157_salted_join_hot" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("event_type").as("k"), col("value"))
      val dim = T(s, dir, "events").select(col("event_type").as("k"))
        .distinct().withColumn("tag", upper(col("k")))
      graft.ops.Skew.saltedJoin(ev, dim, Seq("k"), saltFactor = 8,
          hotKeyMinRows = 500L)
        .groupBy(col("k"), col("tag"))
        .agg(count(lit(1)).as("n"), decimalSum(col("value")).as("total"))
    }),

    // Scale posture: Z-order (Morton) layout key over (customer, price) —
    // the two-dimensional sort key a lakehouse write uses so parquet
    // min/max skipping serves predicates on EITHER column. The z-values
    // are pure IEEE-double bucketing + integer bit interleave, replayed
    // exactly by the oracle; the layout write itself (range partition +
    // sort + file-envelope tightness) is LayoutSpec's job.
    "q87_zorder_layout" -> ((s, dir) =>
      graft.ops.Layout.withZValue(T(s, dir, "orders"),
          "o_custkey", "o_totalprice", bits = 8)
        .select(col("o_orderkey"), col("zval"))),

    // §7.6 embedding storage: int8 scalar-quantization error profile
    // (floor-based rounding + decimal-exact mean ⇒ value-checked oracle).
    "q43_quantize_int8" -> ((s, dir) =>
      SimSearch.quantizationError(T(s, dir, "embeddings"), "vec_id", "embedding")),

    // §7.6 embedding storage, width axis: similarity preservation under
    // prefix truncation — per near-dup pair, the cosine at 32/16-dim
    // prefixes next to the full-width value (the matryoshka-style check
    // before storing a narrower embedding).
    "q63_truncation_profile" -> ((s, dir) =>
      SimSearch.truncationProfile(T(s, dir, "embeddings"),
        "vec_id", "embedding", 0.4, Seq(32, 16))),

    // §7.6 semantic domain discovery: spherical k-means over the embedding
    // corpus (md5-seeded, one decimal-exact Lloyd round — the q72
    // refinement technique applied full-vector, so seeds, the refined
    // centroids, and every assignment replay bit-for-bit in DuckDB).
    "q84_kmeans_clusters" -> ((s, dir) =>
      SimSearch.kmeansClusters(T(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, lloydIters = 1)
        .select(col("id").as("vec_id"), col("cluster_id"),
          round(col("sim"), 6).as("sim_r6"))),

    // Embedding-space outlier gate: bottom decile of every q84 cluster by
    // cosine-to-centroid, rank-cut so the flag is integer-exact across
    // engines — the off-manifold document filter of an embedding curation
    // pass.
    "q88_embedding_outliers" -> ((s, dir) =>
      SimSearch.embeddingOutliers(T(s, dir, "embeddings"), "vec_id",
          "embedding", k = 8, frac = 0.1, lloydIters = 1)
        .select(col("id").as("vec_id"), col("cluster_id"),
          round(col("sim"), 6).as("sim_r6"), col("is_outlier"))),

    // §7.6 INCREMENTAL k-means vs a persisted per-cluster state (the
    // q62/q77 pattern applied to clustering): state built from the even
    // half's batch k-means (its contribution rows = member sums of the
    // final assignment), the odd half assigned against the DERIVED
    // centroids — corpus never rescanned, per-batch cost is one narrow
    // pass + a k-row aggregate.
    "q90_kmeans_incremental" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val idx = SimSearch.buildKmIndex(
        emb.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", k = 8, lloydIters = 1)
      val (out, _) = SimSearch.incrementalKmeansAssign(
        emb.filter(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding", idx, "b1")
      out.select(col("id").as("vec_id"), col("cluster_id"),
        round(col("sim"), 6).as("sim_r6"))
    }),

    // Cluster-balanced diversity sample: cap every q84 cluster at a fixed
    // quota under a deterministic md5 pick order — head semantic domains
    // shrink to the cap, tail domains survive whole (the selection step of
    // cluster-then-balance corpus curation).
    "q85_cluster_balanced_sample" -> ((s, dir) =>
      SimSearch.clusterBalancedSample(T(s, dir, "embeddings"), "vec_id",
          "embedding", k = 8, perCluster = 40, lloydIters = 1)
        .select(col("id").as("vec_id"), col("cluster_id"), col("pick"))),

    // Range (point-in-interval) join via time-bin bucketing — clicks
    // attributed to the purchase windows [ts, ts+2h) of the same user.
    // The naive inequality join is a nested-loop at scale; RangeJoin turns
    // it into an equi-join on (key, bin). Left-preserving: every purchase
    // keeps a row, zero-filled.
    "q44_range_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts"))
      val matched = graft.ops.RangeJoin.pointInInterval(clicks, purchases,
          "c_user", "p_user", "ts", "w_start", "w_end", binSeconds = 7200L)
        .groupBy(col("purchase_id")).agg(count(lit(1)).as("n"))
      purchases.join(matched, Seq("purchase_id"), "left")
        .select(col("purchase_id"), col("p_user").as("user_id"),
          coalesce(col("n"), lit(0L)).as("n_clicks_2h"))
    }),

    // SpaceSaving heavy-hitters sketch (custom TypedImperativeAggregate):
    // O(capacity) memory per partition regardless of input size. Capacity
    // 512 exceeds the distinct-user count at oracle scale, so retained
    // counts are provably exact (est_err = 0) and DuckDB can hash-match
    // the top-10 against a plain GROUP BY.
    "q45_heavy_hitters" -> ((s, dir) =>
      T(s, dir, "events")
        .agg(graft.functions.SketchAggs.topkFreq(col("user_id"), 512).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("item"), col("h.cnt").as("cnt"),
          col("h.err").as("est_err"))
        .orderBy(desc("cnt"), col("item")).limit(10)),

    // Deterministic ~12.5% corpus sample + shard assignment (training-data
    // reproducibility: decisions are a pure function of doc_id, stable
    // across partitionings, retries, and engines).
    "q46_det_sample" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ext.Sampling.uniform(docs, col("doc_id"), 0.125)
        .select(col("doc_id"), col("source"),
          graft.ext.Sampling.hashBucket(col("doc_id")).as("bucket"),
          graft.ext.Sampling.shard(col("doc_id"), 8).as("shard"))
    }),

    // Deterministic per-stratum quota: 20 docs per (lang, source) cell,
    // hash-ordered — exact stratified sampling with one shuffle.
    "q47_stratified_sample" -> ((s, dir) =>
      graft.ext.Sampling.stratified(T(s, dir, "documents"),
          Seq("lang", "source"), col("doc_id"), 20)
        .select(col("lang"), col("source"), col("doc_id"),
          col("strat_rank").cast("long").as("strat_rank"))),

    // α=0.5 temperature mixture over the lang distribution (the self-tuning
    // form of q46/q47's mixture knob: rates DERIVED from observed counts so
    // kept-counts ∝ n_lang^0.5). α=0.5 keeps the threshold arithmetic in
    // sqrt — IEEE-correctly-rounded, hence engine-exact in the oracle.
    "q71_temperature_sample" -> ((s, dir) =>
      graft.ext.Sampling.temperatureMixture(T(s, dir, "documents"),
          col("lang"), col("doc_id"), alpha = 0.5)
        .select(col("doc_id"), col("lang"), col("mix_bucket"), col("mix_thr"))),

    // PII scrubbing over a synthesized-PII corpus (testdata texts carry no
    // PII, so each doc gets a planted email/phone/ID suffix — the scrub
    // itself must find and mask all three) + match accounting.
    "q48_pii_scrub" -> ((s, dir) => {
      val synth = concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-123-4567 ref 123456789"))
      T(s, dir, "documents").select(col("doc_id"),
        graft.ext.TextPrep.scrubPii(synth).as("clean"),
        graft.ext.TextPrep.piiCount(synth).cast("long").as("n_pii"))
    }),

    // Overlapping token-window chunking (context-window packing prep):
    // 24-token windows, stride 12.
    "q49_chunk_tokens" -> ((s, dir) =>
      graft.ext.TextPrep.chunkTokens(T(s, dir, "documents"),
          col("doc_id"), col("text"), window = 24, stride = 12)
        .select(col("doc_id"), col("chunk_no"), col("chunk"),
          col("chunk_tokens"))),

    // Bloom-filter semi-join reduction: lineitem is pruned against the
    // urgent-order bloom BEFORE the join shuffle. No false negatives +
    // the join removes false positives ⇒ identical to the plain join,
    // which is exactly what the oracle asserts.
    "q50_bloom_prune" -> ((s, dir) => {
      val urgent = T(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"))
      graft.ops.BloomPrune.prunedJoin(
          T(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
          urgent, "l_orderkey", "o_orderkey", expectedItems = 100000L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          decimalSum(col("l_extendedprice")).as("volume"))
    }),

    // Vocabulary build (frequency-ranked ids) + integer encoding of every
    // token position — the tokenize-and-encode step of a pretraining
    // pipeline. Vocab joins by token (shuffle, not broadcast: web-scale
    // vocabs don't fit an executor broadcast).
    "q51_vocab_encode" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ext.Corpus.encode(docs, col("doc_id"), col("text"),
        graft.ext.Corpus.buildVocab(docs, col("text")))
    }),

    // Greedy fixed-capacity sequence packing in deterministic hash order,
    // parallel per shard: pack key is (shard, pack_id), so the window sort
    // never runs on a single global partition.
    "q52_sequence_pack" -> ((s, dir) =>
      graft.ext.Corpus.packSequences(T(s, dir, "documents"),
        col("doc_id"), col("text"), capacity = 512, nShards = 4)),

    // The custom merge-based as-of join PHYSICAL operator (logical node +
    // strategy + exec via SparkSessionExtensions) on the same shape as q30
    // — one pass per co-clustered partition, no window state. Must produce
    // exactly what DuckDB's native ASOF LEFT JOIN produces.
    "q55_asof_exec" -> ((s, dir) => {
      val ordersByDay = T(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          decimalSum(col("o_totalprice")).as("day_total"))
      graft.plans.AsOfExec.asof(
          T(s, dir, "events").select("event_id", "user_id", "ts"),
          ordersByDay, "user_id", "o_custkey", "ts", "o_orderdate")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderdate").as("asof_o_orderdate"),
          col("o_orderkey").as("asof_o_orderkey"),
          col("day_total").as("asof_day_total"))
    }),

    // Weighted source mixture (deterministic data-mixture knob): src0 kept
    // whole, src1 at 50%, src2 at 12.5%; every other source dropped.
    "q54_weighted_mixture" -> ((s, dir) =>
      graft.ext.Sampling.weightedMixture(T(s, dir, "documents"),
          col("source"), col("doc_id"),
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.125))
        .select(col("doc_id"), col("source"))),

    // Per-label centroid cohesion: element-wise label centroids, then each
    // vector's cosine to its own label's prototype, averaged per label —
    // the embedding-quality eval of a labeled corpus. All sums go through
    // the decimal-exact pattern so both engines agree bit-for-bit.
    "q56_label_centroids" -> ((s, dir) =>
      SimSearch.labelCohesion(T(s, dir, "embeddings"),
        "vec_id", "embedding", "label")),

    // The corpus end product: encode (q51) joined to packing (q52) and
    // materialized as ordered token-id sequences per (shard, pack) — what
    // a training job actually reads. Order inside a pack is
    // (pack_offset, pos), both unique, so the concatenation is total.
    "q57_pack_sequences" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val enc = graft.ext.Corpus.encode(docs, col("doc_id"), col("text"),
        graft.ext.Corpus.buildVocab(docs, col("text")))
      val packs = graft.ext.Corpus.packSequences(docs, col("doc_id"),
        col("text"), capacity = 512, nShards = 4)
      enc.join(packs.select("doc_id", "shard", "pack_id", "pack_offset"),
          Seq("doc_id"))
        .groupBy(col("shard"), col("pack_id"))
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(pack_offset, pos, token_id)))," +
              " x -> cast(x.token_id as string))"), " ").as("seq"))
    }),

    // Priority sampling (Duffield 2007): weighted k-sample without
    // replacement whose kept rows carry an unbiased subset-sum estimator
    // (est_weight = max(w, τ)). Priorities are (w·65536)/(bucket+1) — a
    // power-of-two multiply + one correctly-rounded divide, so the kept
    // set, τ, and every estimate replay bit-for-bit in DuckDB.
    "q105_priority_sample" -> ((s, dir) =>
      Sampling.prioritySample(T(s, dir, "documents"), col("doc_id"),
          col("n_chars"), k = 50)
        .select(col("doc_id"), col("n_chars"), col("sample_pri"),
          col("est_weight"))),

    // Equi-depth histogram: cells cut by RANK, not by interpolated value
    // thresholds — integer-exact across engines (the q88 discipline);
    // per-cell counts and real value bounds.
    "q106_equidepth_histogram" -> ((s, dir) =>
      graft.ops.Stats.histogramEquiDepth(T(s, dir, "orders"),
        "o_totalprice", bins = 8, tieBreak = col("o_orderkey"))),

    // Corpus manifest: per-source integrity fingerprint (row counts, id
    // range, order-independent md5 content signature) — the audit artifact
    // a 100 TB corpus drop publishes so consumers verify "same rows, same
    // bytes" without re-reading the corpus.
    "q107_corpus_manifest" -> ((s, dir) =>
      graft.ops.Stats.manifest(T(s, dir, "documents"), col("source"),
        col("doc_id"), col("text"))),

    // Positional inverted index + exact phrase search: posting lists of
    // the phrase words only (pushed tok= predicates), chained on
    // (doc_id, pos+i) — cost bound by the rarest word's document
    // frequency, never a corpus LIKE-scan.
    "q108_phrase_search" -> ((s, dir) =>
      graft.ext.InvertedIndex.phraseCounts(
        graft.ext.InvertedIndex.postings(T(s, dir, "documents"),
          "doc_id", "text"),
        Seq("key", "scan"))),

    // Interval-OVERLAP join (both sides are intervals): per-user view-span
    // × click-span overlap via the binned equi-join with the exactly-once
    // intersection-start-bin device — semantics identical to the
    // inequality join the oracle states.
    "q109_interval_overlap" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      def span(et: String, pre: String) = ev
        .filter(col("event_type") === et)
        .groupBy(col("user_id").as(s"${pre}_user"))
        .agg(min(col("ts")).as(s"${pre}_start"),
          (max(col("ts")) + expr("INTERVAL 1 SECOND")).as(s"${pre}_end"))
      graft.ops.RangeJoin.intervalOverlap(
          span("view", "v"), span("click", "c"),
          "v_user", "c_user", "v_start", "v_end", "c_start", "c_end",
          binSeconds = 86400L)
        .select(col("v_user").as("user_id"),
          col("v_start"), col("v_end"), col("c_start"), col("c_end"),
          (least(unix_micros(col("v_end")), unix_micros(col("c_end"))) -
            greatest(unix_micros(col("v_start")), unix_micros(col("c_start"))))
            .as("overlap_micros"))
    }),

    // Count-Min point-frequency sketch (Cormode 2005): never undercounts,
    // overcount bounded by the row-collision mass — q32 treatment (exact
    // counts value-checked, sketch properties as booleans; the hashes are
    // JVM-side MurmurHash3, which no SQL oracle can replay).
    "q110_cm_counts" -> ((s, dir) => {
      import graft.functions.SketchAggs
      val ev = T(s, dir, "events")
      val (depth, width) = (4, 64)
      val est = SketchAggs.cmEstimates(
        SketchAggs.cmState(ev, col("event_type"), depth, width),
        Seq("click", "view", "purchase", "signup", "error"), depth, width)
      val total = ev.count()
      ev.groupBy(col("event_type").as("item"))
        .agg(count(lit(1)).as("exact_n"))
        .join(est, Seq("item"))
        .select(col("item"), col("exact_n"),
          (col("est") >= col("exact_n")).as("cm_never_under"),
          (col("est") <= col("exact_n") + lit(2.0 * total / width))
            .as("cm_within_band"))
    }),

    // Bounded-heap top-k per group: the AGGREGATE form of the rank window
    // — shuffle carries ≤ k rows per (group, partition) instead of every
    // row of the group; must equal the window form exactly (the oracle).
    "q111_topk_per_group" -> ((s, dir) =>
      graft.functions.SketchAggs.topkRows(T(s, dir, "orders"),
        Seq(col("o_custkey")), col("o_totalprice"), col("o_orderkey"), k = 3)),

    // Sparse shingle-cosine pairs: lexical near-dup similarity on
    // 3-gram posting lists (fence-first bounded posting lists expanded
    // in-row to i<j pairs, maxDf fence on the quadratic stopword
    // corner — never an all-pairs doc join, never an unbounded list). The
    // shingle width n IS the scale lever: unigram dfs on this corpus
    // approach |docs| and degenerate to all-pairs; 3-gram dfs track real
    // shared phrasing. Integer dots + IEEE sqrt/divide → bit-exact replay.
    //
    // maxDf = 64, from the measured df distribution rather than a guess:
    // the 3-gram df histogram is p50=9, p90=14, p99=18, p999=21, max=25
    // at sf0.1 (max 7 at sf0.01), so 64 ≈ 2.5× the observed maximum keeps
    // EVERY genuine shared-phrasing gram — results bit-identical to the
    // unfenced space at both oracle scales — while actually fencing
    // replication-inflated boilerplate grams at scale: under clean 8×
    // replication (every df ×8) it would cut the C(df,2) fanout from
    // 88.3M to 14.4M pairs, and on the bench's text-perturbed 8× corpus
    // the measured wall-clock drops ~2.2× (graft.tools.Q112Probe). The
    // old 1000 never triggered anywhere (dfs top out near 200 even at
    // 8×) and was a fence in name only.
    "q112_sparse_cosine" -> ((s, dir) =>
      graft.ext.InvertedIndex.sparseCosinePairs(T(s, dir, "documents"),
        "doc_id", "text", n = 3, maxDf = 64L, minSim = 0.5)),

    // Ordered conversion funnel: earliest view → first click strictly
    // after it → first purchase strictly after that, per user; chained
    // per-step min-aggregates, no stream-wide window sort.
    "q113_funnel" -> ((s, dir) =>
      graft.ops.Funnel.conversionFunnel(T(s, dir, "events"),
        col("user_id"), col("ts"),
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))),

    // Cohort retention matrix: users cohorted by ISO week of first event;
    // (cohort_week, week_offset, n_users) via calendar truncation +
    // lossless integer day division.
    "q114_cohort_retention" -> ((s, dir) =>
      graft.ops.Funnel.cohortRetention(T(s, dir, "events"),
        col("user_id"), col("ts"))),

    // Perceptual-hash image near-dup (the MULTIMODAL dedup twin of
    // MinHash): embeddings render as real PNGs — every 10th vector also
    // re-rendered with one dim nudged (the deterministic stand-in for a
    // re-encoded/retouched copy, since the synthetic corpus has no native
    // image dups) — then dHash box-averages the REAL ImageIO decode,
    // candidates come from 8-bit band equality (pigeonhole-complete ≤ 7
    // bits), popcount verifies. The decode half's (asset_id, phash)
    // output is dumped to a fixed fixture path (the ReferenceFixtures
    // bridge), and the DuckDB oracle replays the WHOLE relational half —
    // band explode, candidate join, XOR popcount, threshold — from those
    // same 8-byte inputs; only the ImageIO decode itself stays
    // model-tested (ExtensionsSpec's JPEG-fidelity precision/recall).
    "q115_image_neardup" -> ((s, dir) => {
      import graft.ext.Multimodal
      val emb = T(s, dir, "embeddings")
      val retouched = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> " +
            "IF(i = 0, CAST(x + 0.02 AS FLOAT), x))").as("embedding"))
      val hashes = Multimodal.imageHashes(Multimodal.imagesFromEmbeddings(
        emb.select("vec_id", "embedding").unionByName(retouched)))
      hashes.write.mode("overwrite").parquet(imageHashFixtureDir)
      Multimodal.imageNearDups(
        s.read.parquet(imageHashFixtureDir), maxDist = 4)
    }),

    // Trending entities: top-3 users per calendar day by event count —
    // the workload shape composing the bounded-heap aggregate with a
    // calendar bucket (shuffle ≤ k rows per (day, partition), no rank
    // window over the day's full traffic).
    "q116_trending" -> ((s, dir) => {
      val daily = T(s, dir, "events")
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      graft.functions.SketchAggs.topkRows(daily, Seq(col("day")),
          col("n_events"), col("user_id"), k = 3)
        .select(col("day"), col("rnk"), col("tie").as("user_id"),
          col("val").cast("long").as("n_events"))
    }),

    // Per-group priority sampling: one independent weighted k-sample +
    // unbiased estimator per source, through the bounded-heap aggregate —
    // ≤ k+1 rows per (group, partition) shuffle, no per-group rank window,
    // no driver τ collect at any group count.
    "q117_priority_sample_grouped" -> ((s, dir) =>
      Sampling.prioritySampleByGroup(T(s, dir, "documents"),
        col("source"), col("doc_id"), col("n_chars"), k = 5)),

    // Sketch-based join-size estimation (AMS/CM inner product): the
    // number a planner wants BEFORE committing to a join strategy —
    // never undercounts, tightens with width. q32 treatment: exact size
    // value-checked, the sketch bound as determinism-pinned booleans.
    "q118_join_size_estimate" -> ((s, dir) => {
      import graft.functions.SketchAggs
      val (depth, width) = (4, 1024)
      val ev = T(s, dir, "events")
      val ord = T(s, dir, "orders")
      val est = SketchAggs.cmJoinSizeEstimate(
        SketchAggs.cmState(ev, col("user_id"), depth, width),
        SketchAggs.cmState(ord, col("o_custkey"), depth, width),
        depth, width)
      val exact = ev.select(col("user_id").as("k"))
        .join(ord.select(col("o_custkey").as("k")), Seq("k"))
        .count()
      val sp = s
      import sp.implicits._
      Seq((exact, est >= exact,
        est <= exact + 2L * ev.count() * ord.count() / width))
        .toDF("exact_join_size", "est_never_under", "est_within_band")
    }),

    // Analytic-function breadth: percent_rank / cume_dist / ntile over a
    // per-status price ordering — the ranked-analytics family beyond
    // row_number (identical SQL semantics in both engines, so every
    // fraction replays bit-for-bit).
    "q119_ranked_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T(s, dir, "orders")
        .filter(col("o_orderkey") % 17 === 0)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"))
    }),

    // Explicit GROUPING SETS — the arbitrary-subset form between q27's
    // ROLLUP and q96's CUBE: (status, priority), (status), and the grand
    // total, one shuffle. Both grouping columns are non-null in the data,
    // so output nulls unambiguously mark aggregation levels.
    "q120_grouping_sets" -> ((s, dir) =>
      T(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          decimalSum(col("o_totalprice")).as("total"))),

    // Time-series gap fill: a dense (group, day) grid with zero-filled
    // daily revenue and a forward-filled last-known value — the resampling
    // primitive reporting pipelines need before charting/joining series.
    // The spine (366 days) is generated once and BROADCAST against the
    // distributed group set, so at scale the grid costs one narrow join,
    // not a shuffle; the forward fill is a per-group running window
    // (partition count = group count — fine for per-entity series, and the
    // grid is bounded by groups × days, never by fact rows).
    "q121_gap_fill" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val daily = orders
        .groupBy(col("o_orderpriority").as("pri"),
          to_date(col("o_orderdate")).as("d"))
        .agg(decimalSum(col("o_totalprice")).as("rev0"))
      val spine = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1996-01-01")),
        lit(java.sql.Date.valueOf("1996-12-31")),
        expr("interval 1 day"))).as("d"))
      val grid = orders.select(col("o_orderpriority").as("pri")).distinct()
        .crossJoin(broadcast(spine))
      val w = Window.partitionBy(col("pri")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("pri", "d"), "left")
        .select(col("pri"), col("d"),
          coalesce(col("rev0"), lit(0.0)).as("rev_day"),
          coalesce(last(col("rev0"), ignoreNulls = true).over(w), lit(0.0))
            .as("rev_ffill"))
    }),

    // OHLC resampling: first/last/min/max of a value per (series, day)
    // bucket via min_by/max_by — single partial-aggregating shuffle, no
    // sort, no window. The order key is a fixed-width (epoch_us, id)
    // string so open/close stay deterministic even under timestamp ties
    // (and the identical printf exists on the oracle side).
    "q122_ohlc_resample" -> ((s, dir) => {
      val key = format_string("%020d-%010d", unix_micros(col("ts")),
        col("event_id"))
      T(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("bucket"))
        .agg(min_by(col("value"), key).as("open"),
          max_by(col("value"), key).as("close"),
          min(col("value")).as("low"), max(col("value")).as("high"),
          count(lit(1)).as("n"))
    }),

    // Hopping (overlapping) windows via the built-in window() generator —
    // each event lands in width/slide = 2 buckets, expanded row-wise BEFORE
    // the aggregate so the shuffle carries partial aggregates per (window,
    // type), never raw duplicated events. Epoch-aligned boundaries on both
    // engines (3 h divides the day), so buckets line up exactly.
    "q123_hopping_window" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), decimalSum(col("value")).as("val_sum"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
          col("event_type"), col("n"), col("val_sum"))),

    // Rolling calendar aggregates over the dense q121 grid: a 7-day moving
    // average (ROWS frame == RANGE frame once days are dense — the reason
    // the grid comes first) and each day's share of its group total. The
    // windowed sums run in DECIMAL so the 7-element frame folds and the
    // full-partition total replay bit-for-bit cross-engine; the divisions
    // are then single double ops on identical operands.
    "q125_moving_avg" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val daily = orders
        .groupBy(col("o_orderpriority").as("pri"),
          to_date(col("o_orderdate")).as("d"))
        .agg(decimalSum(col("o_totalprice")).as("rev0"))
      val spine = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1996-01-01")),
        lit(java.sql.Date.valueOf("1996-12-31")),
        expr("interval 1 day"))).as("d"))
      val grid = orders.select(col("o_orderpriority").as("pri")).distinct()
        .crossJoin(broadcast(spine))
        .join(daily, Seq("pri", "d"), "left")
        .withColumn("rev_day", coalesce(col("rev0"), lit(0.0)))
      val dec = col("rev_day").cast(org.apache.spark.sql.types.DecimalType(18, 2))
      val w7 = Window.partitionBy(col("pri")).orderBy(col("d"))
        .rowsBetween(-6, Window.currentRow)
      val wAll = Window.partitionBy(col("pri"))
      grid.select(col("pri"), col("d"), col("rev_day"),
        (sum(dec).over(w7).cast("double") / count(lit(1)).over(w7)).as("ma7"),
        (col("rev_day") / sum(dec).over(wAll).cast("double")).as("share"))
    }),

    // Correlated EXISTS / NOT EXISTS — exercised as SQL TEXT so Catalyst's
    // subquery decorrelation is the surface under test: both subqueries
    // must rewrite to semi/anti joins on o_custkey (the plan guard pins
    // no nested-loop fallback), which is what makes the form viable at
    // scale — a per-row subquery execution would be O(n·m).
    "q126_exists_decorrelated" -> ((s, dir) => {
      T(s, dir, "customer").createOrReplaceTempView("customer_q126")
      T(s, dir, "orders").createOrReplaceTempView("orders_q126")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_q126 c
        WHERE EXISTS (SELECT 1 FROM orders_q126 o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders_q126 o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice > 450000)""")
    }),

    // Correlated scalar-aggregate subquery (orders beating 2× their
    // priority's mean) — decorrelates to one aggregate + one join. The
    // mean is decimal-exact-sum / count so the threshold compare never
    // flips on cross-engine float summation order.
    "q127_scalar_subquery" -> ((s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders_q127")
      s.sql("""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders_q127 o
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
          FROM orders_q127 o2
          WHERE o2.o_orderpriority = o.o_orderpriority)""")
    }),

    // Bag-algebra set operators (INTERSECT / EXCEPT, distinct semantics):
    // buyers who also hit errors, minus anyone who signed up — each
    // operator plans as a semi/anti-style hash join on the shuffled key,
    // never a sort-based global distinct-then-diff.
    "q128_set_ops" -> ((s, dir) => {
      T(s, dir, "events").createOrReplaceTempView("events_q128")
      s.sql("""
        (SELECT user_id FROM events_q128
         WHERE event_type = 'purchase' AND value > 100
         INTERSECT
         SELECT user_id FROM events_q128
         WHERE event_type = 'error' AND value > 100)
        EXCEPT
        SELECT user_id FROM events_q128
        WHERE event_type = 'signup' AND value > 150""")
    }),

    // Recursive CTE (Spark 4's WITH RECURSIVE): a hierarchy walk from one
    // region down through nations to suppliers over a unified edge table —
    // the iterative-closure shape Graph.pageRank/nearDupClusters hand-roll
    // as driver loops, expressed declaratively; each recursion step is one
    // equi-join of the frontier against edges, so depth bounds the job
    // count and the frontier bounds each shuffle.
    "q129_recursive_cte" -> ((s, dir) => {
      T(s, dir, "region").createOrReplaceTempView("region_q129")
      T(s, dir, "nation").createOrReplaceTempView("nation_q129")
      T(s, dir, "supplier").createOrReplaceTempView("supplier_q129")
      s.sql("""
        WITH RECURSIVE edges AS (
          SELECT CONCAT('R', CAST(r_regionkey AS STRING)) AS parent,
                 CONCAT('N', CAST(n_nationkey AS STRING)) AS child
          FROM nation_q129 JOIN region_q129 ON n_regionkey = r_regionkey
          UNION ALL
          SELECT CONCAT('N', CAST(n_nationkey AS STRING)),
                 CONCAT('S', CAST(s_suppkey AS STRING))
          FROM supplier_q129 JOIN nation_q129 ON s_nationkey = n_nationkey
        ),
        walk AS (
          SELECT 'R0' AS node, CAST(0 AS BIGINT) AS depth
          UNION ALL
          SELECT e.child, w.depth + 1
          FROM walk w JOIN edges e ON e.parent = w.node
        )
        SELECT node, depth FROM walk""")
    }),

    // Spark 4 VARIANT path: parse the JSON props column ONCE into the
    // binary semi-structured type and extract typed values — the engine's
    // native answer to schema-on-read (vs q08's configured-key string
    // flatten). The extraction is typed at the expression level
    // (variant_get(..., 'long')), so the aggregate runs on longs, exact.
    "q130_variant_json" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))),

    // Aggregate FILTER clause (the standard-SQL form of q01's
    // sum(CASE...) encoding) — including its composition with DISTINCT,
    // which CASE cannot express without a second aggregation: all four
    // aggregates still run in ONE partial+final pass.
    "q131_filtered_agg" -> ((s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders_q131")
      s.sql("""
        SELECT o_orderstatus,
          CAST(count(*) AS BIGINT) AS n_all,
          CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
            AS BIGINT) AS n_urgent,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
            AS DOUBLE) AS rev_hot,
          CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
            AS BIGINT) AS big_buyers
        FROM orders_q131 GROUP BY o_orderstatus""")
    }),

    // LATERAL correlated subquery with ORDER BY + LIMIT — top-2 nations
    // per region as the dependent-join form (the rank-window and
    // heap-aggregate forms are q111/q116; this is the SQL shape a
    // switching user writes first). Tie-broken to full determinism.
    "q132_lateral_topk" -> ((s, dir) => {
      T(s, dir, "region").createOrReplaceTempView("region_q132")
      T(s, dir, "nation").createOrReplaceTempView("nation_q132")
      T(s, dir, "customer").createOrReplaceTempView("customer_q132")
      s.sql("""
        SELECT r.r_name, t.n_name, t.cnt
        FROM region_q132 r,
        LATERAL (SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
                 FROM nation_q132 n
                 JOIN customer_q132 c ON c_nationkey = n_nationkey
                 WHERE n_regionkey = r.r_regionkey
                 GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2) t""")
    }),

    // UNPIVOT — the wide→long inverse of q33's pivot, as the native
    // relational operator (each output row is a (id, name, value) triple;
    // no shuffle at all: unpivot is a narrow per-row expansion, the
    // aggregate upstream did the only exchange).
    "q133_unpivot" -> ((s, dir) => {
      val wide = T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("click"),
          count(when(col("event_type") === "error", 1)).as("error"))
      wide.unpivot(Array(col("user_id")),
        Array(col("click"), col("error")), "event_type", "cnt")
    }),

    // Exact grouped median via the sort-based percentile aggregate — the
    // exact twin of the KLL sketch path (q97): right when groups fit the
    // aggregate buffer, replaced by the sketch at open-ended cardinality.
    // Interpolation arithmetic is identical IEEE on both engines, so the
    // halved midpoints replay bit-for-bit.
    "q134_grouped_median" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"),
          count(lit(1)).as("n"))),

    // Deterministic training-export sharding: a seeded md5 key gives every
    // doc a reproducible position in a GLOBAL shuffle order (no RNG — the
    // order replays bit-for-bit on any cluster), fixed-size shards come
    // from the distributed global rank (range-partition + per-partition
    // offsets, never a single-partition window), and the per-shard
    // manifest is what an export job publishes next to the data. Pair with
    // Corpus.writeSharded to actually lay the files out.
    "q135_shard_manifest" -> ((s, dir) => {
      val keyed = T(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          md5(concat_ws("|", lit("shard"), col("doc_id").cast("string")))
            .as("__k"))
      graft.ext.Corpus.globalRank(keyed, Seq(col("__k"), col("doc_id")), "rn")
        .withColumn("shard", floor((col("rn") - 1) / lit(250.0)).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    }),

    // Grouped categorical mode with a DETERMINISTIC tie-break (count desc,
    // then value asc) — Spark's own mode() leaves ties unspecified, which
    // can never cross-engine-hash; stated as count + per-group ranked
    // window (partitioned by the group key, so the sort is per-user local,
    // no global order).
    "q136_grouped_mode" -> ((s, dir) => {
      val c = T(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type"))
      c.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))
    }),

    // Time-based RANGE window frame — the per-event trailing-24h aggregate
    // (the frame kind q23/q125's ROWS frames cannot express: the window is
    // bounded by event-time DISTANCE, not row count). Ordering key is
    // integer epoch micros on both engines, so frame boundaries replay
    // exactly; RANGE includes ties as peers, which makes the result
    // independent of tie order. Partitioned by user — no global sort.
    "q137_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400000000L, 0L)
      T(s, dir, "events").select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_24h"))
    }),

    // Quality-aware dedup resolution: inside each q64 near-dup cluster,
    // KEEP the doc with the most content (n_chars desc, doc_id asc
    // tie-break) and count what gets dropped — the curation step after
    // clustering, where "remove duplicates" must pick a canonical survivor
    // instead of an arbitrary one (LLM-data pipelines keep the longest
    // near-dup for exactly this reason). Ranking is a per-cluster window —
    // no global sort; cluster sizes bound each partition.
    "q138_dedup_keep_best" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("doc_id") < 500)
      val clusters = Dedup.nearDupClusters(
        Dedup.portableNearDups(docs, "doc_id", "text"))
      val members = clusters
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      val kept = members.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("cluster_id"), col("doc_id").as("kept_doc"),
          col("n_chars").as("kept_chars"))
      val sizes = members.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      kept.join(sizes, "cluster_id")
        .withColumn("n_dropped", col("n_members") - 1)
    }),

    // Exact WEIGHTED median (the robust-statistics twin of q134's unit-
    // weight median): smallest price whose cumulative quantity reaches
    // half the group's total. Weights cast to exact integers so the
    // running-sum comparison can never ulp-flip at the cut; the window is
    // per-group (partitioned running sum + one per-group total), the
    // cut row is picked with a plain min — no second sort.
    "q139_weighted_median" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(
        col("l_returnflag").as("flag"), col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
      val order = Window.partitionBy(col("flag"))
        .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("flag"))
      li.withColumn("cum", sum(col("qty")).over(order))
        .withColumn("tot", sum(col("qty")).over(whole))
        .filter(lit(2) * col("cum") >= col("tot"))
        .groupBy(col("flag"))
        .agg(min(col("price")).as("w_median"),
          min(col("tot")).as("total_weight"))
    }),

    // TPC-H Q21's shape over this corpus's columns: suppliers who were the
    // SOLE late shipper on a finished multi-supplier order ("late" =
    // shipped > 90 days after the order date, since this corpus carries no
    // receipt/commit dates). Two correlated subqueries over the same fact
    // table — one EXISTS, one NOT EXISTS that also references the OUTER
    // order's date — stated as SQL text so Catalyst's decorrelation to a
    // semi join + an anti join on l_orderkey is the surface under test
    // (plan-guarded below like q126/q127; never a per-row subquery).
    "q140_sole_late_supplier" -> ((s, dir) => {
      T(s, dir, "supplier").createOrReplaceTempView("supplier_q140")
      T(s, dir, "lineitem").createOrReplaceTempView("lineitem_q140")
      T(s, dir, "orders").createOrReplaceTempView("orders_q140")
      s.sql("""
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier_q140 s
        JOIN lineitem_q140 l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders_q140 o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem_q140 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_q140 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY s.s_name""")
    }),

    // TPC-H Q22's shape: high-balance customers gone DORMANT (no order
    // since the cutoff), rolled up per nation — an uncorrelated scalar
    // aggregate threshold (the global mean positive balance) plus a
    // correlated NOT EXISTS with an extra predicate, the combination Q22
    // exists to exercise. The mean is decimal-exact-sum / count so the
    // threshold compare never flips on cross-engine float summation
    // order (the q127 rule); decorrelation leaves one anti hash join and
    // one one-row broadcast — plan-guarded, never a per-row subquery.
    "q141_dormant_high_balance" -> ((s, dir) => {
      T(s, dir, "customer").createOrReplaceTempView("customer_q141")
      T(s, dir, "orders").createOrReplaceTempView("orders_q141")
      s.sql("""
        SELECT c.c_nationkey AS nation, CAST(count(*) AS BIGINT) AS numcust,
          CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer_q141 c
        WHERE c.c_acctbal > (
            SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM customer_q141 c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders_q141 o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        GROUP BY c.c_nationkey""")
    }),

    // Share-of-total (ratio_to_report): each nation's revenue as a share
    // of its region's — an aggregate feeding a windowed total over the
    // aggregated (tiny) frame, so the window costs nothing at any scale.
    // Revenue is decimal-exact; the share divides doubles whose relative
    // error is ~1e-16, six rounded decimals away from ever flipping.
    "q142_revenue_share" -> ((s, dir) => {
      val rev = T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("region"), col("n_name").as("nation"))
        .agg(decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
      val w = Window.partitionBy(col("region"))
      rev.withColumn("share",
        round(col("revenue") / sum(col("revenue")).over(w), 6))
    }),

    // Top-k WITH ties: rank() keeps every row of a tied band (q111's
    // row_number form arbitrarily cuts ties; rank's output is a pure
    // function of the data, so banded ties cross engines bit-exact).
    // Banding by price floor manufactures the ties that make the
    // semantics observable; per-priority window, no global sort.
    "q143_ranked_ties" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(floor(col("o_totalprice") / lit(50000.0)).desc)
      T(s, dir, "orders")
        .withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("o_orderpriority"), col("o_orderkey"),
          floor(col("o_totalprice") / lit(50000.0)).cast("long")
            .as("price_band"), col("rnk"))
    }),

    // Gap-based sessions via the BUILT-IN session_window (the q26 semantics
    // as one native operator instead of two hand-rolled window passes):
    // a session absorbs an event landing strictly inside last_ts + gap, so
    // the oracle's new-session test is `>=` — and session_end is
    // last_ts + gap by definition, which the oracle reproduces. One
    // shuffle on (user, merged-session) vs q26's two window sorts.
    "q124_session_window" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))),

    // Benchmark decontamination: training docs sharing any distinct 3-gram
    // with the held-out set (doc_id % 50 == 0 stands in for a benchmark;
    // real corpora use longer grams, but the synthetic texts only collide
    // meaningfully at n=3 — 257 of 490 train docs here).
    "q53_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ext.Corpus.contamination(
        docs.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 50 === 0), col("doc_id"), col("text"),
        n = 3)
    }),

    // The lakehouse SQL front door end-to-end as PURE SQL TEXT: `orders`
    // lives as a TxTable (committed in two halves — even keys at v1, odd
    // at v2 — so time travel is observable), addressed through the
    // GraftCatalog + GraftSqlRules path exactly as a production consumer
    // would (`spark.sql.catalog.graft` + `spark.sql.extensions`). The
    // query joins the head's per-status totals against the VERSION AS OF 1
    // snapshot's counts; the oracle replays v1 as the even-key half.
    // Integer-exact outputs only (counts + key sums), so the hash compare
    // is decimal-free by construction.
    "q144_sql_lakehouse" -> ((s, dir) =>
      sqlLakeSession(s, dir).sql(
        """SELECT h.o_orderstatus, h.n_all, h.sum_key, v.n_v1
          |FROM (SELECT o_orderstatus, count(*) AS n_all,
          |             sum(o_orderkey) AS sum_key
          |      FROM graft.lake.orders GROUP BY o_orderstatus) h
          |JOIN (SELECT o_orderstatus, count(*) AS n_v1
          |      FROM graft.lake.orders VERSION AS OF 1
          |      GROUP BY o_orderstatus) v
          |ON h.o_orderstatus = v.o_orderstatus""".stripMargin)),

    // q81's oracle-expressible half, hash-green: bpeSegment's greedy
    // sequential merge application under a FROZEN merge table (the 20
    // merges q81's trainer learns on this corpus slice, frozen so the
    // oracle needs no argmax loop). The DuckDB twin replays every pass
    // with literal replace() over a double-space symbol encoding — one
    // separator space is consumed by each match and restored by the
    // replacement, which makes SQL replace()'s continue-after-replacement
    // scan EXACTLY the fold mergePass computes (no regex, no lookaround).
    // Training itself stays model-proven in CorpusSpec (q81).
    "q145_bpe_apply" -> ((s, dir) => {
      val sq = s.sqlContext; import sq.implicits._
      val merges = bpeFrozenMerges.zipWithIndex
        .map { case ((l, r), i) => (i + 1, l, r) }
        .toDF("rank", "left", "right")
      graft.ext.Corpus.bpeSegment(
        T(s, dir, "documents").filter(col("doc_id") < 100),
        col("doc_id"), col("text"), merges)
    }),

    // SQL DML end-to-end as pure text — DROP/CTAS/DELETE/UPDATE against
    // a catalog table, all copy-on-write commits through the log, then an
    // aggregate the oracle replays relationally (delete = WHERE NOT,
    // update = CASE). Rebuilt from scratch every run, so the mutating
    // statements are deterministic and replay-safe.
    "q146_sql_dml" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
      ext.sql("DROP TABLE IF EXISTS graft.dml.orders_t")
      ext.sql("CREATE TABLE graft.dml.orders_t AS " +
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft.lake.orders")
      ext.sql("DELETE FROM graft.dml.orders_t WHERE o_orderkey % 10 = 3")
      ext.sql("UPDATE graft.dml.orders_t SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'F'")
      ext.sql("""SELECT o_orderstatus, count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                 FROM graft.dml.orders_t GROUP BY o_orderstatus""")
    }),

    // SQL MERGE INTO end-to-end as pure text: CDC-shaped tri-clause merge
    // (tombstone delete, computed UPDATE SET, guarded INSERT) against a
    // catalog table; the oracle replays the clause algebra as set
    // operations. Same rebuild-per-run discipline as q146.
    "q147_sql_merge" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
      ext.sql("DROP TABLE IF EXISTS graft.dml.m")
      ext.sql("CREATE TABLE graft.dml.m AS " +
        "SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS price " +
        "FROM graft.lake.orders WHERE o_orderkey % 3 = 0")
      ext.sql("""MERGE INTO graft.dml.m t
                 USING (SELECT o_orderkey AS k, o_orderstatus AS st,
                               o_totalprice AS price,
                               CASE WHEN o_orderkey % 5 = 0 THEN 'D'
                                    ELSE 'U' END AS op
                        FROM graft.lake.orders WHERE o_orderkey % 2 = 0) s
                 ON t.k = s.k
                 WHEN MATCHED AND s.op = 'D' THEN DELETE
                 WHEN MATCHED THEN UPDATE SET price = s.price * 3
                 WHEN NOT MATCHED AND s.op <> 'D' THEN
                   INSERT (k, st, price) VALUES (s.k, s.st, s.price * 3)""")
      ext.sql("""SELECT st, count(*) AS n,
                 CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
                 FROM graft.dml.m GROUP BY st""")
    }),

    // The streaming loop end-to-end as PURE OPTIONS: the lake's orders
    // TxTable subscribed as a stream (readStream.format("graft")),
    // filtered in flight, committed into a fresh TxTable by the
    // exactly-once streaming sink (writeStream.format("graft"),
    // txn-marked AvailableNow drain), then the sink table read back and
    // aggregated. Replica + checkpoint are rebuilt from scratch every run
    // (the q146 discipline) so the drain is deterministic; the oracle
    // replays the in-flight transform relationally on `orders`.
    // Integer-only outputs keep the hash compare decimal-free.
    "q148_stream_replicate" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      val srcDir = sqlLakeRoot(dir) + "/lake/orders"
      val root = "/tmp/graft_stream_loop_v1/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val rootPath = new org.apache.hadoop.fs.Path(root)
      rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(rootPath, true)
      val dst = s"$root/replica"
      val q = ext.readStream.format("graft").load(srcDir)
        .where(col("o_orderkey") % 2 === 0)
        .writeStream.format("graft")
        .option("path", dst)
        .option("checkpointLocation", s"$root/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(180000),
        "q148: AvailableNow stream drain did not finish within 180 s — " +
          "reading the replica now would produce a silently short result")
      ext.read.format("graft").load(dst)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
    }),

    // The FULL SQL maintenance loop as one oracle row: four separate
    // commits build the table (small files by construction), then every
    // CALL in the book runs over it — OPTIMIZE bin packing, OPTIMIZE
    // ZORDER (a full clustering rewrite), log checkpoint+prune, vacuum of
    // everything the rewrites retired — and the final aggregate must
    // still hash-match the plain relational definition. Maintenance is
    // exactly the code most likely to lose or duplicate rows silently;
    // this row makes "it didn't" a DuckDB-checked fact every round.
    // Rebuilt from scratch per run (the q146 discipline).
    "q149_sql_maintenance" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
      ext.sql("DROP TABLE IF EXISTS graft.maint.mo")
      val base = "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus" +
        " FROM graft.lake.orders WHERE o_orderkey % 4 = "
      ext.sql(s"CREATE TABLE graft.maint.mo AS ${base}0")
      for (r <- 1 to 3)
        ext.sql(s"INSERT INTO graft.maint.mo ${base}$r")
      ext.sql("CALL graft.system.compact_small_files('maint.mo')").collect()
      ext.sql(
        "CALL graft.system.zorder('maint.mo', 'o_custkey,o_totalprice', 8)")
        .collect()
      ext.sql("CALL graft.system.compact_log('maint.mo')").collect()
      ext.sql("CALL graft.system.vacuum('maint.mo')").collect()
      // …then the SELF-DRIVING policy over mixed write/delete cycles:
      // merge-on-read deletes + partial re-inserts with
      // CALL graft.system.maintain interleaved — the policy reads table
      // health from the log and runs only the actions whose thresholds
      // trip (purge_dvs at 5%, compaction at 2 small files, checkpoint
      // past 4 commits, vacuum at 1 reclaimable item). After the loop the
      // read tax is PROVABLY bounded: dv_bounded pins that no live file
      // carries a vector at/over the policy fraction.
      ext.sql("ALTER TABLE graft.maint.mo " +
        "SET TBLPROPERTIES('graft.deletes.mode'='dv')")
      val tableDir = sqlLakeRoot(dir) + "/maint/mo"
      for (c <- 0 until 3) {
        ext.sql(s"DELETE FROM graft.maint.mo WHERE o_orderkey % 9 = $c")
        ext.sql("INSERT INTO graft.maint.mo " +
          "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus " +
          s"FROM graft.lake.orders WHERE o_orderkey % 9 = $c " +
          "AND o_orderkey % 2 = 0")
        ext.sql("CALL graft.system.maintain('maint.mo', " +
          "min_small_files => 2, dv_min_deleted_fraction => 0.05, " +
          "min_log_commits => 4, min_vacuum_items => 1)").collect()
      }
      // evidence probe for the bound: footer record counts (the same
      // metadata-only idiom maintain()'s own policy reads — no per-file
      // Spark jobs, zero data pages; O(DV'd files) footer reads)
      val hconf = ext.sparkContext.hadoopConfiguration
      val dvBounded = graft.merge.TxTable
        .liveEntriesForSql(ext, tableDir, None).forall { e =>
          e.dv.forall { d =>
            val phys = graft.merge.TxTable.parquetRowCount(hconf,
              new org.apache.hadoop.fs.Path(tableDir, e.path))
            phys > 0 && d.deleted.toDouble / phys < 0.05
          }
        }
      ext.sql(s"""SELECT o_orderstatus, count(*) AS n,
                 sum(o_orderkey) AS sum_key,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total, $dvBounded AS dv_bounded
                 FROM graft.maint.mo GROUP BY o_orderstatus""")
    }),

    // SQL schema evolution end-to-end as pure text: CTAS with the narrow
    // schema, ALTER TABLE ADD COLUMNS (metadata-only — zero bytes
    // rewritten at any table size), INSERT carrying the new column,
    // UPDATE back-filling it on old rows, and a final aggregate the
    // oracle replays relationally (declared-unwritten = typed NULL). The
    // `v1_cols` literal pins the time-travel contract into the hash: the
    // pre-ALTER version still reads the OLD two-column schema. Rebuilt
    // from scratch per run (the q146 discipline).
    "q150_sql_evolution" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.orders_e")
      ext.sql("CREATE TABLE graft.ddl.orders_e AS " +
        "SELECT o_orderkey, o_orderstatus FROM graft.lake.orders " +
        "WHERE o_orderkey % 4 <> 1")
      ext.sql("ALTER TABLE graft.ddl.orders_e ADD COLUMNS (prio BIGINT)")
      ext.sql("INSERT INTO graft.ddl.orders_e " +
        "SELECT o_orderkey, o_orderstatus, o_orderkey % 7 " +
        "FROM graft.lake.orders WHERE o_orderkey % 4 = 1")
      ext.sql("UPDATE graft.ddl.orders_e SET prio = 99 " +
        "WHERE prio IS NULL AND o_orderkey % 10 = 0")
      val v1Cols =
        ext.sql("SELECT * FROM graft.ddl.orders_e VERSION AS OF 1")
          .columns.length
      ext.sql(s"""SELECT o_orderstatus, count(*) AS n,
                 CAST(sum(coalesce(prio, -1)) AS BIGINT) AS prio_sum,
                 count(prio) AS prio_n, $v1Cols AS v1_cols
                 FROM graft.ddl.orders_e GROUP BY o_orderstatus""")
    }),

    // q151: merge-on-read DELETE (deletion vectors) through the SQL front
    // door, then CALL graft.system.purge_dvs — the full lifecycle as one
    // hash-checked row set. Two DELETEs with overlapping file footprints
    // exercise the per-file vector MERGE; the literals baked into every
    // row pin the mechanics: files_moved = 0 (no data file rewritten by
    // either DELETE — the merge-on-read promise), had_dvs (vectors were
    // live when the first aggregate ran), deleted_n (the vectors'
    // recorded cardinality, which DuckDB recomputes relationally). The
    // 'mor' stage aggregates THROUGH the anti-join read path; the
    // 'purged' stage re-aggregates after the vectors fold back into
    // clean files — both must hash to the same relational answer.
    "q151_sql_dv_delete" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
      ext.sql("DROP TABLE IF EXISTS graft.mor.orders_dv")
      ext.sql("CREATE TABLE graft.mor.orders_dv AS " +
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft.lake.orders")
      ext.sql("ALTER TABLE graft.mor.orders_dv " +
        "SET TBLPROPERTIES('graft.deletes.mode'='dv')")
      val tableDir = sqlLakeRoot(dir) + "/mor/orders_dv"
      val before = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      ext.sql("DELETE FROM graft.mor.orders_dv WHERE o_orderkey % 10 = 3")
      ext.sql("DELETE FROM graft.mor.orders_dv WHERE o_orderkey % 7 = 2")
      val after = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      val moved = ((before -- after) ++ (after -- before)).size
      val meta = ext.sql(s"""SELECT CAST(sum(n_deleted) AS BIGINT),
          count(CASE WHEN dv_path IS NOT NULL THEN 1 END)
          FROM graft_files('$tableDir')""").head()
      val deletedN = meta.getLong(0)
      val hadDvs = meta.getLong(1) > 0
      def agg(tag: String) = ext.sql(
        s"""SELECT '$tag' AS stage, o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           $moved AS files_moved, $hadDvs AS had_dvs,
           ${deletedN}L AS deleted_n
           FROM graft.mor.orders_dv GROUP BY o_orderstatus""")
      val stage1 = agg("mor")
      val rows1 = stage1.collect().toSeq
      ext.sql("CALL graft.system.purge_dvs('mor.orders_dv')")
      import scala.jdk.CollectionConverters._
      ext.createDataFrame(rows1.asJava, stage1.schema)
        .unionByName(agg("purged"))
    }),

    // q152: tri-clause MERGE INTO, merge-on-read — the statement that is
    // O(table) under the replace engine commits O(changed rows) under
    // graft.deletes.mode=dv (tombstoned positions + updated/inserted
    // copies in ONE atomic dv commit). files_moved = 0 pins the promise:
    // no pre-merge data file was rewritten or retired by the MERGE. The
    // aggregate reads THROUGH the vectors (no purge), so the anti-join
    // path itself is under the hash.
    "q152_sql_dv_merge" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
      ext.sql("DROP TABLE IF EXISTS graft.mor.merge_dv")
      ext.sql("CREATE TABLE graft.mor.merge_dv AS " +
        "SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS price " +
        "FROM graft.lake.orders WHERE o_orderkey % 3 = 1")
      ext.sql("ALTER TABLE graft.mor.merge_dv " +
        "SET TBLPROPERTIES('graft.deletes.mode'='dv')")
      val tableDir = sqlLakeRoot(dir) + "/mor/merge_dv"
      val before = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      ext.sql("""MERGE INTO graft.mor.merge_dv t USING (
                   SELECT o_orderkey AS k, o_orderstatus AS st,
                          o_totalprice AS price
                   FROM graft.lake.orders WHERE o_orderkey % 2 = 1) s
                 ON t.k = s.k
                 WHEN MATCHED AND s.k % 5 = 0 THEN DELETE
                 WHEN MATCHED THEN UPDATE SET price = s.price * 3
                 WHEN NOT MATCHED AND s.k % 5 <> 0 THEN
                   INSERT (k, st, price) VALUES (s.k, s.st, s.price * 3)""")
      val after = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      val moved = (before -- after).size
      ext.sql(s"""SELECT st, count(*) AS n,
                 CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
                 $moved AS files_moved
                 FROM graft.mor.merge_dv GROUP BY st""")
    }),

    // q153: RENAME/DROP COLUMN through the SQL front door — metadata-only
    // column mapping (files keep physical names; one versioned property
    // re-labels the logical view). The lifecycle: CTAS half the corpus,
    // rename + drop, INSERT the other half under the NEW names (landing
    // on the physical columns), aggregate by the renamed column.
    // files_moved = 0 pins the metadata-only cost; v1_cols = 4 pins the
    // time-travel contract (the pre-DDL snapshot keeps all four original
    // columns).
    "q153_sql_column_mapping" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.orders_cm")
      ext.sql("CREATE TABLE graft.ddl.orders_cm AS " +
        "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority " +
        "FROM graft.lake.orders WHERE o_orderkey % 2 = 0")
      val tableDir = sqlLakeRoot(dir) + "/ddl/orders_cm"
      val before = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      ext.sql("ALTER TABLE graft.ddl.orders_cm " +
        "RENAME COLUMN o_orderstatus TO status")
      ext.sql("ALTER TABLE graft.ddl.orders_cm DROP COLUMN o_orderpriority")
      ext.sql("INSERT INTO graft.ddl.orders_cm " +
        "SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM graft.lake.orders WHERE o_orderkey % 2 = 1")
      val after = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      val moved = (before -- after).size
      val v1Cols =
        ext.sql("SELECT * FROM graft.ddl.orders_cm VERSION AS OF 1")
          .columns.length
      ext.sql(s"""SELECT status, count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                 $moved AS files_moved, $v1Cols AS v1_cols
                 FROM graft.ddl.orders_cm GROUP BY status""")
    }),

    // q154: DDL-first CREATE TABLE — the reference's whole bootstrap is
    // this shape (`setup_target.py:11-242`: CREATE TABLE first, load
    // later). One atomic schema-only commit declares fields + the
    // partition layout + an armed CHECK; the literals pin the mechanics:
    // empty_n = 0 (the fresh table reads as zero TYPED rows, not an
    // error), v1_live = 0 (zero data files at v1 — the commit carries
    // only metadata), partitioned = true (the later INSERT landed under
    // the DECLARED o_orderstatus= layout, proving the layout survives an
    // empty live set). The aggregate then reads back through partition
    // pruning-capable fragments and must hash-match DuckDB over the raw
    // corpus. Rebuilt from scratch per run (the q146 discipline).
    "q154_sql_create_table" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.orders_ct")
      ext.sql("CREATE TABLE graft.ddl.orders_ct (" +
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING) " +
        "PARTITIONED BY (o_orderstatus) " +
        "TBLPROPERTIES('constraint.key_pos' = 'o_orderkey >= 0')")
      val emptyN =
        ext.sql("SELECT count(*) FROM graft.ddl.orders_ct").head.getLong(0)
      val tableDir = sqlLakeRoot(dir) + "/ddl/orders_ct"
      val v1Live = graft.merge.TxTable.liveFilePaths(ext, tableDir).size
      ext.sql("INSERT INTO graft.ddl.orders_ct " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus " +
        "FROM graft.lake.orders")
      val partitioned = graft.merge.TxTable
        .liveEntriesForSql(ext, tableDir, None)
        .forall(_.part.exists(_.startsWith("o_orderstatus=")))
      ext.sql(s"""SELECT o_orderstatus, count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total,
                 ${emptyN}L AS empty_n, $v1Live AS v1_live,
                 $partitioned AS partitioned
                 FROM graft.ddl.orders_ct GROUP BY o_orderstatus""")
    }),

    // q155: type-widening schema evolution through the SQL front door —
    // CTAS lands o_orderkey as INT (narrow half of the corpus),
    // ALTER COLUMN ... TYPE BIGINT is one metadata-only property commit
    // (files_moved = 0), the second INSERT carries values ONLY a BIGINT
    // can hold (key + 8e9), and the final aggregate reads old int32
    // files and new int64 files through ONE stock vectorized scan — the
    // reader's widening promotion under the hash. v1_type pins the
    // time-travel contract: the pre-ALTER snapshot still reads INT.
    // Rebuilt from scratch per run (the q146 discipline).
    "q155_sql_type_widening" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.orders_tw")
      ext.sql("CREATE TABLE graft.ddl.orders_tw AS " +
        "SELECT CAST(o_orderkey AS INT) AS k, o_orderstatus, o_totalprice " +
        "FROM graft.lake.orders WHERE o_orderkey % 2 = 0")
      val tableDir = sqlLakeRoot(dir) + "/ddl/orders_tw"
      val before = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      ext.sql("ALTER TABLE graft.ddl.orders_tw ALTER COLUMN k TYPE BIGINT")
      val after = graft.merge.TxTable.liveFilePaths(ext, tableDir).toSet
      val moved = ((before -- after) ++ (after -- before)).size
      ext.sql("INSERT INTO graft.ddl.orders_tw " +
        "SELECT o_orderkey + 8000000000, o_orderstatus, o_totalprice " +
        "FROM graft.lake.orders WHERE o_orderkey % 2 = 1")
      val v1Type =
        ext.sql("SELECT * FROM graft.ddl.orders_tw VERSION AS OF 1")
          .schema("k").dataType.sql
      ext.sql(s"""SELECT o_orderstatus, count(*) AS n,
                 CAST(sum(k) AS BIGINT) AS key_sum,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total,
                 $moved AS files_moved, '$v1Type' AS v1_type
                 FROM graft.ddl.orders_tw GROUP BY o_orderstatus""")
    }),

    // q156: TRAINED language identification — multinomial NB-style mean
    // add-α probability over char 2-3-grams, trained on the shared
    // literal corpora (en/fr/de) and scored over the documents slice plus
    // three planted foreign sentences. Log-free (one IEEE division per
    // gram, decimal-exact mean — the q76/q91 discipline), so DuckDB
    // replays the ENTIRE classifier bit-for-bit: training counts, add-α
    // scores, and the per-doc argmax.
    "q156_lang_id" -> ((s, dir) => {
      val sq = s.sqlContext; import sq.implicits._
      val train = langIdTraining.toDF("lang", "text")
      val planted = langIdPlanted.toDF("doc_id", "text")
      val targets = T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .unionByName(planted)
      graft.ext.TextStats.langIdAgainst(train, "lang", "text",
        targets, "doc_id", "text")
    }),

    // q158: identity columns — the reference's BIGSERIAL surrogate-PK
    // shape (`setup_target.py:87,114,189,212`) as graft DDL. CREATE
    // declares the allocator; two ordered INSERTs get engine-assigned ids
    // (dense in row order, the high-water mark advancing in the SAME
    // commit as the data); an explicit value against GENERATED ALWAYS is
    // refused loudly (pinned as the `refused` literal); `next_v` pins the
    // allocator state after both inserts. The oracle recomputes the exact
    // ids as row_number() per batch plus the prior batch's offset.
    // Rebuilt from scratch per run (the q146 discipline).
    "q158_sql_identity" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.nation_id")
      ext.sql("CREATE TABLE graft.ddl.nation_id (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, n_name STRING)")
      ext.sql("INSERT INTO graft.ddl.nation_id SELECT NULL, n_name " +
        "FROM graft.lake.nation WHERE n_regionkey = 0 ORDER BY n_name")
      ext.sql("INSERT INTO graft.ddl.nation_id SELECT NULL, n_name " +
        "FROM graft.lake.nation WHERE n_regionkey = 1 ORDER BY n_name")
      val refused = try {
        ext.sql("INSERT INTO graft.ddl.nation_id VALUES (999, 'EXPLICIT')")
        false
      } catch { case e: Exception =>
        e.getMessage != null && e.getMessage.contains("GENERATED ALWAYS") }
      val tableDir = sqlLakeRoot(dir) + "/ddl/nation_id"
      val next = graft.merge.TxTable.identitySpecs(ext, tableDir)("id").next
      ext.sql(s"SELECT id, n_name, $refused AS refused, ${next}L AS next_v " +
        "FROM graft.ddl.nation_id")
    }),

    // q159: MERGE INTO schema evolution — a CDC feed that grew a column
    // lands without a manual ALTER. The target holds the even orders
    // (k, price only); the source carries the odd orders PLUS a status
    // column the target lacks; `MERGE WITH SCHEMA EVOLUTION` (opt-in via
    // graft.merge.schemaEvolution) routes the delta through the
    // metadata-only ADD COLUMNS path, so pre-existing rows read status as
    // NULL (the NULL-backfill contract under the hash: the NULL group's
    // n/total must match DuckDB exactly) and zero old bytes rewrite.
    // Rebuilt from scratch per run (the q146 discipline).
    "q159_sql_merge_evolution" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.orders_se")
      ext.sql("CREATE TABLE graft.ddl.orders_se AS " +
        "SELECT o_orderkey AS k, o_totalprice AS price " +
        "FROM graft.lake.orders WHERE o_orderkey % 2 = 0")
      ext.sql("ALTER TABLE graft.ddl.orders_se SET TBLPROPERTIES" +
        "('graft.merge.schemaEvolution'='true')")
      ext.sql("MERGE WITH SCHEMA EVOLUTION INTO graft.ddl.orders_se t " +
        "USING (SELECT o_orderkey AS k, o_totalprice AS price, " +
        "o_orderstatus AS status FROM graft.lake.orders " +
        "WHERE o_orderkey % 2 = 1) s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT (k, price, status) " +
        "VALUES (s.k, s.price, s.status)")
      ext.sql("""SELECT status, count(*) AS n,
                CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
                count(status) AS with_status
                FROM graft.ddl.orders_se GROUP BY status""")
    }),

    // q160: CDC MERGE into an identity table — the reference's exact
    // upsert-into-BIGSERIAL shape (`load.py:50-83` keyed on the natural
    // key, `setup_target.py:87` surrogate id). The allocator reserves a
    // fresh id for EVERY source row in an OCC-pinned commit before the
    // merge (uniqueness is the contract, density is not): matched rows
    // update and KEEP their ids, their reservations become gaps, so an
    // inserted nation's id is 10 + its name-rank among ALL 25 source rows
    // — which the oracle replays exactly. next_v pins the allocator state
    // (10 initial + 25 reserved + 1). Rebuilt per run (q146 discipline).
    "q160_sql_merge_identity" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.nation_cdc")
      ext.sql("CREATE TABLE graft.ddl.nation_cdc (" +
        "id BIGINT GENERATED ALWAYS AS IDENTITY, n_name STRING, " +
        "n_regionkey BIGINT)")
      ext.sql("INSERT INTO graft.ddl.nation_cdc SELECT NULL, n_name, " +
        "n_regionkey FROM graft.lake.nation WHERE n_regionkey IN (0, 1) " +
        "ORDER BY n_name")
      ext.sql("MERGE INTO graft.ddl.nation_cdc t USING " +
        "(SELECT n_name, n_regionkey FROM graft.lake.nation " +
        "ORDER BY n_name) s ON t.n_name = s.n_name " +
        "WHEN MATCHED THEN UPDATE SET n_regionkey = s.n_regionkey + 100 " +
        "WHEN NOT MATCHED THEN INSERT (n_name, n_regionkey) " +
        "VALUES (s.n_name, s.n_regionkey)")
      val tableDir = sqlLakeRoot(dir) + "/ddl/nation_cdc"
      val next = graft.merge.TxTable.identitySpecs(ext, tableDir)("id").next
      ext.sql(s"SELECT id, n_name, n_regionkey, ${next}L AS next_v " +
        "FROM graft.ddl.nation_cdc")
    }),

    // q161: column DEFAULT values — the reference's pervasive DDL idiom
    // (`setup_target.py:17-20,78-79,130`: DEFAULT 0 / DEFAULT TRUE /
    // DEFAULT '2020-01-01'). CREATE declares defaults; an INSERT that
    // omits the columns gets them filled by the analyzer (CURRENT
    // default); explicit values override; `ADD COLUMN ... DEFAULT` makes
    // every PRE-declaration row read the frozen existence constant with
    // zero bytes rewritten (the parquet reader fills it from schema
    // metadata), while post-ADD inserts omitting the column get the
    // current default. All four regimes pinned into one hash. Rebuilt
    // from scratch per run (the q146 discipline).
    "q161_sql_column_defaults" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.nation_def")
      ext.sql("CREATE TABLE graft.ddl.nation_def (" +
        "n_name STRING, visits INT DEFAULT 0, " +
        "is_active BOOLEAN DEFAULT TRUE, " +
        "valid_from DATE DEFAULT DATE'2020-01-01')")
      // omission → current defaults fill
      ext.sql("INSERT INTO graft.ddl.nation_def (n_name) " +
        "SELECT n_name FROM graft.lake.nation WHERE n_regionkey <= 1")
      // explicit values override defaults
      ext.sql("INSERT INTO graft.ddl.nation_def " +
        "SELECT n_name, CAST(n_nationkey AS INT), false, DATE'2021-06-15' " +
        "FROM graft.lake.nation WHERE n_regionkey = 2")
      // existence default: rows above were written BEFORE this column
      ext.sql("ALTER TABLE graft.ddl.nation_def " +
        "ADD COLUMN score INT DEFAULT 7")
      // post-ADD insert: score explicit, the rest from current defaults
      ext.sql("INSERT INTO graft.ddl.nation_def (n_name, score) " +
        "SELECT n_name, 100 FROM graft.lake.nation WHERE n_regionkey = 3")
      ext.sql("SELECT n_name, visits, is_active, valid_from, score " +
        "FROM graft.ddl.nation_def")
    }),

    // q162: CONVERT TO GRAFT — in-place adoption of a pre-existing
    // hive-partitioned parquet directory (the CONVERT TO DELTA move): one
    // metadata commit references the files where they stand (footer
    // envelopes included), then the LOG owns the table — a DELETE
    // rewrites survivors into engine-owned batches while VERSION AS OF 1
    // still reads the adopted files. Head ∪ v1 in one hash pins both the
    // adoption fidelity and the time-travel boundary. Rebuilt per run.
    "q162_sql_convert" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      val legacy = sqlLakeRoot(dir) + "/ddl/legacy_nation"
      val p = new org.apache.hadoop.fs.Path(legacy)
      p.getFileSystem(ext.sparkContext.hadoopConfiguration).delete(p, true)
      ext.sql("SELECT n_nationkey, n_name, n_regionkey FROM graft.lake.nation")
        .write.partitionBy("n_regionkey").parquet(legacy)
      ext.sql("CONVERT TO GRAFT graft.ddl.legacy_nation")
      ext.sql("DELETE FROM graft.ddl.legacy_nation WHERE n_nationkey % 2 = 0")
      ext.sql("SELECT n_nationkey, n_name, CAST(n_regionkey AS BIGINT) " +
        "AS n_regionkey, 'head' AS snap FROM graft.ddl.legacy_nation " +
        "UNION ALL SELECT n_nationkey, n_name, CAST(n_regionkey AS BIGINT), " +
        "'v1' FROM graft.ddl.legacy_nation VERSION AS OF 1")
    }),

    // q163: branch refs (write-audit-publish) — a risky backfill stages
    // on an isolated branch (graft.ddl.`nation_wap@audit`): a DELETE and
    // an INSERT land there while main keeps serving its pre-branch rows,
    // then a fast-forward publish moves the branch commits onto main with
    // zero file copies. The final hash pins BOTH sides of the boundary:
    // the published head (backfilled) and VERSION AS OF 1 (the pre-branch
    // state, proving isolation held until publish). Rebuilt per run.
    "q163_sql_branch_wap" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.nation_wap")
      ext.sql("CREATE TABLE graft.ddl.nation_wap AS SELECT n_nationkey, " +
        "n_name, n_regionkey FROM graft.lake.nation")
      ext.sql("CALL graft.system.create_branch('ddl.nation_wap', 'audit')")
      ext.sql("DELETE FROM graft.ddl.`nation_wap@audit` WHERE n_regionkey = 4")
      ext.sql("INSERT INTO graft.ddl.`nation_wap@audit` " +
        "SELECT n_nationkey + 100, concat(n_name, '_BF'), n_regionkey " +
        "FROM graft.lake.nation WHERE n_regionkey = 0")
      ext.sql("CALL graft.system.publish_branch('ddl.nation_wap', 'audit')")
      ext.sql("SELECT n_nationkey, n_name, n_regionkey, 'head' AS snap " +
        "FROM graft.ddl.nation_wap UNION ALL " +
        "SELECT n_nationkey, n_name, n_regionkey, 'pre' " +
        "FROM graft.ddl.nation_wap VERSION AS OF 1")
    }),

    // q164: hash-bucketed layout — CREATE ... PARTITIONED BY
    // (bucket(8, o_custkey)) routes every write through
    // repartition(8, o_custkey), so each file holds exactly one murmur3
    // bucket and a point lookup on the bucket column PRUNES to 1 of the
    // 8 files at the FileIndex seam (the unsorted join-key shape where
    // min/max envelopes prune nothing). The scanned/total file counts
    // come from the EXECUTED plan and ride the hash as literals — the
    // oracle pins 1-of-8, so any pruning regression hash-fails, and the
    // row content proves pruning never dropped a matching row.
    "q164_sql_bucketed" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.orders_bkt")
      ext.sql("CREATE TABLE graft.ddl.orders_bkt " +
        "PARTITIONED BY (bucket(8, o_custkey)) AS " +
        "SELECT o_orderkey, o_custkey, o_totalprice FROM graft.lake.orders")
      val total = graft.merge.TxTable
        .liveFilePaths(ext, sqlLakeRoot(dir) + "/ddl/orders_bkt").size
      val probe = ext.sql(
        "SELECT o_orderkey FROM graft.ddl.orders_bkt WHERE o_custkey = 37")
      val scanned = probe.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles.toInt
      }.getOrElse(-1)
      ext.sql("SELECT o_orderkey, o_custkey, o_totalprice, " +
        s"$total AS total_files, $scanned AS files_scanned " +
        "FROM graft.ddl.orders_bkt WHERE o_custkey = 37")
    }),

    // q165: generated columns — `day DATE GENERATED ALWAYS AS
    // (CAST(ts AS DATE))` partitioned by day (the reference's timeline
    // access path, `setup_target.py:239-240`, as a self-deriving date
    // layout). The engine COMPUTES day on every insert (explicit values
    // refuse); the oracle recomputes it from the raw events slice, so the
    // hash pins every generated value. The raw-predicate partition
    // derivation (event_ts range → day fragment pruning) is plan-guarded
    // in SqlFrontDoorSpec. Rebuilt per run (q146 discipline).
    "q165_sql_generated" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.events_gen")
      ext.sql("CREATE TABLE graft.ddl.events_gen (" +
        "ts TIMESTAMP, user_id BIGINT, " +
        "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
        "PARTITIONED BY (day)")
      T(ext, dir, "events").filter(col("event_id") % 20 === 0)
        .createOrReplaceTempView("events_gen_src")
      ext.sql("INSERT INTO graft.ddl.events_gen (ts, user_id) " +
        "SELECT ts, user_id FROM events_gen_src")
      ext.sql("SELECT day, count(*) AS n, " +
        "count(DISTINCT user_id) AS users, " +
        "sum(CASE WHEN day = CAST(ts AS DATE) THEN 1 ELSE 0 END) AS consistent " +
        "FROM graft.ddl.events_gen GROUP BY day")
    }),

    // q166: the storage-partitioned join — two tables bucketed
    // bucket(8, custkey) join AND aggregate on the bucket key with ZERO
    // shuffles: the scan reports HashPartitioning from the verified
    // bucket layout (Spark-standard _NNNNN file suffixes), so the join
    // needs no exchange on either side and the per-customer rollup
    // reuses the same partitioning. The shuffle count is measured from
    // the EXECUTED plan (AQE/broadcast off so it is concrete) and rides
    // the hash as a literal — the oracle pins 0, so any regression that
    // reintroduces an exchange hash-fails; the rollup values prove the
    // exchange-free plan computes the exact same answer. At 100 TB this
    // is THE repeated-join shuffle eliminator: two huge tables
    // co-bucketed on their join key shuffle zero bytes, forever.
    "q166_sql_spj" -> ((s, dir) => {
      val ext = sqlLakeSession(s, dir)
      ext.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.ord_bkt")
      ext.sql("DROP TABLE IF EXISTS graft.ddl.cust_bkt")
      ext.sql("CREATE TABLE graft.ddl.ord_bkt " +
        "PARTITIONED BY (bucket(8, o_custkey)) AS " +
        "SELECT o_orderkey, o_custkey FROM graft.lake.orders")
      T(ext, dir, "customer").select("c_custkey", "c_name")
        .createOrReplaceTempView("spj_customer_src")
      ext.sql("CREATE TABLE graft.ddl.cust_bkt " +
        "PARTITIONED BY (bucket(8, c_custkey)) AS " +
        "SELECT c_custkey, c_name FROM spj_customer_src")
      val qText = "SELECT c.c_custkey, max(c.c_name) AS c_name, " +
        "count(*) AS n_orders, sum(o.o_orderkey) AS sum_key " +
        "FROM graft.ddl.ord_bkt o JOIN graft.ddl.cust_bkt c " +
        "ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey"
      // The zero-shuffle evidence must be SELF-CONTAINED (the r14 lesson:
      // rows/schema stayed green in the driver harness but the pinned
      // shuffle count flipped to non-zero under inherited session confs).
      // Pin EVERY conf the exchange-free plan depends on, not just the
      // two that pick the join strategy: bucketed-scan recognition
      // (sources.bucketing.enabled), the auto-disable rule that may drop
      // the advertised HashPartitioning when it judges it unhelpful
      // (autoBucketedScan), the bucket-coalescing rewrite that could
      // mismatch the two sides' partitionings (coalesceBucketsInJoin),
      // and shuffle.partitions (= the bucket count, so no requirement
      // can ask for a wider distribution than the scans provide).
      val pinned = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.sources.bucketing.enabled" -> "true",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false",
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8")
      val saved = pinned.map { case (k, _) => k -> ext.conf.getOption(k) }
      val shuffles = try {
        pinned.foreach { case (k, v) => ext.conf.set(k, v) }
        ext.sql(qText).queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
      } finally {
        saved.foreach {
          case (k, Some(v)) => ext.conf.set(k, v)
          case (k, None) => ext.conf.unset(k)
        }
      }
      ext.sql(qText).withColumn("shuffles",
        lit(shuffles).cast("int"))
    })
  )

  /** q156's labeled training slice: three miniature single-language
    * corpora as SHARED literals — the Spark side builds a DataFrame, the
    * oracle a VALUES list, from the SAME strings, so both engines train
    * the identical char-n-gram model. ASCII only (no locale-sensitive
    * lowercasing divergence between JVM and DuckDB). */
  private val langIdTraining: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog while the rain " +
      "in spain stays mainly on the plain and children read their books " +
      "in the quiet evening light"),
    "en" -> ("a journey of a thousand miles begins with a single step and " +
      "every good boy deserves fruit when the weather turns warm in the " +
      "early summer months"),
    "fr" -> ("le renard brun saute par dessus le chien paresseux pendant " +
      "que la pluie en espagne reste surtout dans la plaine et les " +
      "enfants lisent leurs livres le soir"),
    "fr" -> ("un voyage de mille lieues commence par un premier pas et " +
      "chaque bon garcon merite des fruits quand le temps devient chaud " +
      "au debut des mois d ete"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund " +
      "waehrend der regen in spanien meistens in der ebene bleibt und " +
      "die kinder abends ihre buecher lesen"),
    "de" -> ("eine reise von tausend meilen beginnt mit einem einzigen " +
      "schritt und jeder gute junge verdient obst wenn das wetter in den " +
      "fruehen sommermonaten warm wird"))

  /** q156's planted foreign targets (distinct from the training
    * sentences), keyed by negative doc_ids so they can't collide with the
    * corpus. */
  private val langIdPlanted: Seq[(Long, String)] = Seq(
    -1L -> ("she walks to the market every morning to buy fresh bread " +
      "and the children follow along the narrow street"),
    -2L -> ("elle marche au marche chaque matin pour acheter du pain " +
      "frais et les enfants suivent le long de la rue etroite"),
    -3L -> ("sie geht jeden morgen zum markt um frisches brot zu kaufen " +
      "und die kinder folgen ihr die enge strasse entlang"))

  /** q115's decode/relational seam: the dHash half (ImageIO decode → 8
    * bytes per asset) lands here so the DuckDB oracle can replay the
    * banded near-dup from byte-identical inputs. Fixed path (no sf tag):
    * Verify and its oracle compare always run as a pair on one corpus —
    * the same single-writer discipline as the q34-q39 fixtures. */
  private val imageHashFixtureDir = "/tmp/graft_image_hashes_v1"

  /** q145's merge table: bpeTrain(nMerges = 20) on sf0.01 documents
    * (doc_id < 100), frozen so both engines apply the identical program.
    * Regenerate with `graft.tools.BpeDump` if the corpus changes. */
  private val bpeFrozenMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "e" -> "</w>", "n" -> "</w>", "er" -> "</w>", "o" -> "w",
    "ow" -> "</w>", "s" -> "t", "o" -> "r", "h" -> "</w>", "l" -> "u",
    "a" -> "t", "i" -> "n", "a" -> "</w>", "y" -> "</w>", "t" -> "</w>",
    "g" -> "</w>", "a" -> "r", "p" -> "ar", "f" -> "i", "fi" -> "l")

  /** Incremental horizon for the q34-q39 pipeline runs: mid-fixture so the
    * OR-of-timestamp predicates genuinely filter (fixtures span 03-01..03-07). */
  private val refSince = java.sql.Timestamp.valueOf("2024-03-03 00:00:00")

  /** q144's lake + session: an extensions-enabled sibling session whose
    * `graft` catalog is rooted at a per-corpus TxTable fixture — the
    * corpus `orders` committed as two halves (even o_orderkey at v1, odd
    * at v2) so VERSION AS OF is observable from SQL text. The fixture is
    * content-checked (head must be exactly v2) and rebuilt from scratch
    * otherwise, so a crashed half-build never poisons the compare. */
  private val sqlLakeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), SparkSession]
  private def sqlLakeRoot(dir: String): String =
    "/tmp/graft_sql_lake_v1/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
  private def sqlLakeSession(s: SparkSession, dir: String): SparkSession =
    sqlLakeCache.getOrElseUpdate((s, dir), {
      val root = sqlLakeRoot(dir)
      val tableDir = s"$root/lake/orders"
      val complete = graft.merge.TxTable.exists(s, tableDir) &&
        graft.merge.TxTable.headVersion(s, tableDir).contains(2L)
      if (!complete) {
        val p = new org.apache.hadoop.fs.Path(tableDir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        val orders = T(s, dir, "orders")
        graft.merge.TxTable.append(s, tableDir,
          orders.filter(col("o_orderkey") % 2 === 0))
        graft.merge.TxTable.append(s, tableDir,
          orders.filter(col("o_orderkey") % 2 =!= 0))
      }
      val nationDir = s"$root/lake/nation"
      if (!graft.merge.TxTable.exists(s, nationDir))
        graft.merge.TxTable.append(s, nationDir, T(s, dir, "nation"))
      val ext = org.apache.spark.sql.graftbridge.SessionBridge
        .withExtensions(s, new GraftExtensions()(_))
      ext.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      ext.conf.set("spark.sql.catalog.graft.root", root)
      ext
    })

  // memoized per session: each call otherwise re-lists and re-footers 13
  // parquet dirs, pure driver latency repeated across the six q34-q39 runs
  @volatile private var refSrcCache: (SparkSession, graft.ops.ScenarioSources) = null
  private def refSrc(s: SparkSession): graft.ops.ScenarioSources = {
    val c = refSrcCache
    if (c != null && (c._1 eq s)) c._2
    else {
      val built = graft.demo.ReferenceFixtures.parquetSources(s)
      refSrcCache = (s, built)
      built
    }
  }

  /** q06 body: five branches over orders+events mirroring the reference's
    * 8-branch UNION ALL (extract.py:277-415). */
  private def timelineUnion(s: SparkSession, dir: String): DataFrame = {
    val orders = T(s, dir, "orders")
    val events = T(s, dir, "events")
    val customer = T(s, dir, "customer")
    import Timeline._

    val b1 = orders.select(
      sourceKey("ORD", col("o_orderkey")).as("source_key"),
      lit("ORDER_PLACED").as("event_type"),
      col("o_orderdate").as("event_time"),
      col("o_custkey").cast("string").as("actor"),
      concat(lit("Order placed: "), col("o_orderstatus")).as("description"),
      col("o_totalprice").as("amount"))

    val b2 = orders.filter(col("o_orderstatus") === "F").select(
      sourceKey("FIL", col("o_orderkey")).as("source_key"),
      lit("ORDER_FILLED").as("event_type"),
      col("o_orderdate").as("event_time"),
      nullString.as("actor"),          // P4 typed NULL
      nullString.as("description"),
      col("o_totalprice").as("amount"))

    val b3 = events.filter(col("event_type") === "signup").select(
      sourceKey("SU", col("event_id")).as("source_key"),
      lit("USER_SIGNUP").as("event_type"),
      col("ts").as("event_time"),
      col("user_id").cast("string").as("actor"),
      lit("Signup").as("description"),
      nullDouble.as("amount"))

    val b4 = events.filter(col("event_type") === "purchase").select(
      sourceKey("PUR", col("event_id")).as("source_key"),
      lit("PURCHASE").as("event_type"),
      col("ts").as("event_time"),
      col("user_id").cast("string").as("actor"),
      concat(lit("Purchase: "),
        col("value").cast("decimal(12,2)").cast("string")).as("description"),
      col("value").as("amount"))

    val b5 = events.filter(col("event_type") === "error").select(
      sourceKey("ERR", col("event_id")).as("source_key"),
      lit("ERROR_EVENT").as("event_type"),
      col("ts").as("event_time"),
      col("user_id").cast("string").as("actor"),
      concat(lit("Error"),
        optionalFragment(" | user: ", expr("nullif(user_id, 0)"))).as("description"),
      col("value").as("amount"))

    // J7/J8: a branch that joins inside the union (extract.py:352,371-373) —
    // the dim side broadcast so the branch adds no shuffle.
    val b6 = orders.filter(col("o_orderstatus") === "O")
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(
        sourceKey("OPB", col("o_orderkey")).as("source_key"),
        lit("ORDER_OPENED").as("event_type"),
        col("o_orderdate").as("event_time"),
        col("c_name").as("actor"),
        concat(lit("Open order by: "), col("c_name")).as("description"),
        col("o_totalprice").as("amount"))

    unionBranches(Seq(b1, b2, b3, b4, b5, b6))
      .orderBy(col("event_time"), col("source_key"))
      .limit(2000)
  }

  // -------------------------------------------------------------------
  // DuckDB oracles (ANSI SQL, DuckDB 1.0 dialect where they differ)
  // -------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_incremental_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00' OR o_totalprice >= 450000.0
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "q03_customer_geo" ->
      """SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region,
        | c.c_acctbal, c.c_mktsegment
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin,

    "q04_orders_rollup" ->
      """SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
        | COUNT(l.l_linenumber) AS n_items,
        | COUNT(DISTINCT l.l_suppkey) AS n_suppliers,
        | CAST(COALESCE(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_returned,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_value,
        | CAST(SUM(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS DOUBLE)
        |   / COUNT(l.l_shipdate) AS avg_ship_days
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate""".stripMargin,

    "q05_nation_pairs" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | COUNT(*) AS n_shipments,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |GROUP BY sn.n_name, cn.n_name""".stripMargin,

    "q06_timeline_union" ->
      """WITH u AS (
        | SELECT 'ORD_' || CAST(o_orderkey AS VARCHAR) AS source_key,
        |   'ORDER_PLACED' AS event_type, o_orderdate AS event_time,
        |   CAST(o_custkey AS VARCHAR) AS actor,
        |   'Order placed: ' || o_orderstatus AS description,
        |   o_totalprice AS amount
        | FROM orders
        | UNION ALL
        | SELECT 'FIL_' || CAST(o_orderkey AS VARCHAR), 'ORDER_FILLED', o_orderdate,
        |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), o_totalprice
        | FROM orders WHERE o_orderstatus = 'F'
        | UNION ALL
        | SELECT 'SU_' || CAST(event_id AS VARCHAR), 'USER_SIGNUP', ts,
        |   CAST(user_id AS VARCHAR), 'Signup', CAST(NULL AS DOUBLE)
        | FROM events WHERE event_type = 'signup'
        | UNION ALL
        | SELECT 'PUR_' || CAST(event_id AS VARCHAR), 'PURCHASE', ts,
        |   CAST(user_id AS VARCHAR),
        |   'Purchase: ' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), value
        | FROM events WHERE event_type = 'purchase'
        | UNION ALL
        | SELECT 'ERR_' || CAST(event_id AS VARCHAR), 'ERROR_EVENT', ts,
        |   CAST(user_id AS VARCHAR),
        |   'Error' || COALESCE(' | user: ' || CAST(NULLIF(user_id, 0) AS VARCHAR), ''), value
        | FROM events WHERE event_type = 'error'
        | UNION ALL
        | SELECT 'OPB_' || CAST(o_orderkey AS VARCHAR), 'ORDER_OPENED', o_orderdate,
        |   c_name, 'Open order by: ' || c_name, o_totalprice
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | WHERE o_orderstatus = 'O')
        |SELECT * FROM u WHERE event_time IS NOT NULL
        |ORDER BY event_time, source_key LIMIT 2000""".stripMargin,

    "q07_latest_per_user" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        | event_type AS last_event_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1""".stripMargin,

    "q08_json_flatten" ->
      """SELECT event_id,
        | TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS p_k_long,
        | props AS p_full_text,
        | json_extract_string(props, '$.k') AS k_str,
        | TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
        | CASE WHEN json_extract_string(props, '$.k') IS NULL THEN NULL
        |      WHEN lower(json_extract_string(props, '$.k')) IN ('true','1','yes') THEN TRUE
        |      ELSE FALSE END AS k_bool
        |FROM events""".stripMargin,

    "q09_dedup_exact" ->
      """SELECT sha256(text) AS content_sha, MIN(doc_id) AS keeper_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY sha256(text)""".stripMargin,

    "q10_doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_subtokens
        |FROM documents""".stripMargin,

    "q11_lang_profile" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
        | CAST(SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long_docs
        |FROM documents GROUP BY lang""".stripMargin,

    "q12_text_quality" ->
      """SELECT doc_id,
        | CAST(len(text) AS BIGINT) AS n_chars,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len,
        | CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
        |   / len(text) AS alpha_ratio,
        | CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |       t -> list_contains(['the','a','of','and','to','in','is','it','for','on'], t))) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(lower(text)), '\s+')) AS en_stopword_ratio
        |FROM documents""".stripMargin,

    "q13_ann_topk" -> exactAnnOracleSql,

    "q14_scd2_rebuild" ->
      """SELECT user_id, event_id AS version_id, ts AS version_started_at,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version_ended_at,
        | (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current_version
        |FROM events""".stripMargin,

    "q15_watermark_scan" ->
      """SELECT event_type, COUNT(*) AS n_events, MIN(ts) AS min_ts, MAX(ts) AS max_ts,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 90 SECOND
        |GROUP BY event_type""".stripMargin,

    "q19_user_durations" ->
      """SELECT user_id, COUNT(*) AS n_events, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        | round(((epoch_us(MAX(ts))//1000000) - (epoch_us(MIN(ts))//1000000))/60.0, 2)
        |   AS span_minutes,
        | ((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))//1000)/1000.0 AS span_seconds
        |FROM events GROUP BY user_id""".stripMargin,

    "q20_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_dot_product(a.v, b.v)
        |     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(sim, 6) AS sim_r6 FROM p WHERE sim >= 0.4""".stripMargin,

    "q59_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_dot_product(a.v, b.v)
        |     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id),
        | f AS (SELECT id_a, id_b, sim FROM p WHERE sim >= 0.4),
        | k AS (SELECT id_b AS vec_id, MIN(id_a) AS cand,
        |   round(MAX(sim), 6) AS max_sim_r6 FROM f GROUP BY id_b)
        |SELECT e.vec_id, COALESCE(k.cand, e.vec_id) AS keeper_id, k.max_sim_r6
        |FROM e LEFT JOIN k USING (vec_id)""".stripMargin,

    "q60_semantic_dedup_bucketed" -> semanticDedupBucketedOracleSql,

    "q63_truncation_profile" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb,
        |   list_dot_product(a.v, b.v)
        |     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(sim, 6) AS cos_full_r6,
        | round(list_dot_product(va[1:32], vb[1:32])
        |   / (sqrt(list_dot_product(va[1:32], va[1:32]))
        |    * sqrt(list_dot_product(vb[1:32], vb[1:32]))), 6) AS cos_d32_r6,
        | round(list_dot_product(va[1:16], vb[1:16])
        |   / (sqrt(list_dot_product(va[1:16], va[1:16]))
        |    * sqrt(list_dot_product(vb[1:16], vb[1:16]))), 6) AS cos_d16_r6
        |FROM p WHERE sim >= 0.4""".stripMargin,

    "q61_semantic_dedup_incremental" -> semanticDedupIncrementalOracleSql,

    // q64: q16's pair machinery + a recursive CTE computing each node's
    // minimum reachable id over the undirected pair graph — the
    // declarative fixpoint the iterative Spark propagation must match.
    "q64_neardup_clusters" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents WHERE doc_id < 500),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairs AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
        |est AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT p.doc_a, p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est_jaccard
        |  FROM pairs p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est_jaccard >= 0.6),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM est
        |          UNION ALL SELECT doc_b, doc_a FROM est),
        |reach(doc_id, m) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, reach.m FROM edges e JOIN reach ON reach.doc_id = e.v)
        |SELECT doc_id, min(m) AS cluster_id FROM reach GROUP BY doc_id""".stripMargin,

    // q78: q64's component chain + singleton fallback for unclustered
    // docs, then the literal 80/10/10 bucket cuts (round(0.8·65536)=52429,
    // round(0.9·65536)=58982) on the q46 md5-bucket rule over cluster_id.
    "q78_leakage_safe_split" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents WHERE doc_id < 500),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairs AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
        |est AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT p.doc_a, p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est_jaccard
        |  FROM pairs p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est_jaccard >= 0.6),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM est
        |          UNION ALL SELECT doc_b, doc_a FROM est),
        |reach(doc_id, m) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, reach.m FROM edges e JOIN reach ON reach.doc_id = e.v),
        |lab AS (SELECT doc_id, min(m) AS cluster_id FROM reach GROUP BY doc_id),
        |units AS (
        | SELECT d.doc_id, coalesce(lab.cluster_id, d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN lab USING (doc_id) WHERE d.doc_id < 500),
        |b AS (SELECT doc_id, cluster_id,
        |  CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4) AS INTEGER) AS bk
        | FROM units)
        |SELECT doc_id, cluster_id,
        | CASE WHEN bk < 52429 THEN 'train'
        |      WHEN bk < 58982 THEN 'val' ELSE 'test' END AS split
        |FROM b""".stripMargin,

    // q65: the q64 machinery split into the SAME two stages the Spark side
    // runs — stage-A pairs (both ids < 250, the persisted-label build) and
    // stage-B incremental edges (new docs >= 250 vs the indexed corpus plus
    // in-batch smaller ids; since every corpus id < every batch id, the
    // candidate predicate collapses to y.doc_id < x.doc_id) — then one
    // recursive CTE over their union. The incremental fold must reproduce
    // this fixpoint exactly, min-label invariant included.
    "q65_clusters_incremental" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents WHERE doc_id < 500),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairsA AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        | WHERE x.doc_id < 250 AND y.doc_id < 250),
        |estA AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT p.doc_a, p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est
        |  FROM pairsA p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est >= 0.6),
        |candB AS (
        | SELECT DISTINCT y.doc_id AS doc_a, x.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash
        | WHERE x.doc_id >= 250 AND y.doc_id < x.doc_id),
        |estB AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT c.doc_a, c.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est
        |  FROM candB c
        |  JOIN sigs sa ON sa.doc_id = c.doc_a
        |  JOIN sigs sb ON sb.doc_id = c.doc_b) z
        | WHERE est >= 0.6),
        |allp AS (SELECT doc_a, doc_b FROM estA
        |         UNION SELECT doc_a, doc_b FROM estB),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM allp
        |          UNION ALL SELECT doc_b, doc_a FROM allp),
        |reach(doc_id, m) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, reach.m FROM edges e JOIN reach ON reach.doc_id = e.v)
        |SELECT doc_id, min(m) AS cluster_id FROM reach GROUP BY doc_id""".stripMargin,

    // q66: the q65 machinery plus a SECOND fixpoint over stage-A edges
    // alone; the delta is the anti/diff-join of the two label tables —
    // exactly the rows the stage-B fold changed or created.
    "q66_clusters_delta" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents WHERE doc_id < 500),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairsA AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        | WHERE x.doc_id < 250 AND y.doc_id < 250),
        |estA AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT p.doc_a, p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est
        |  FROM pairsA p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est >= 0.6),
        |candB AS (
        | SELECT DISTINCT y.doc_id AS doc_a, x.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash
        | WHERE x.doc_id >= 250 AND y.doc_id < x.doc_id),
        |estB AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT c.doc_a, c.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est
        |  FROM candB c
        |  JOIN sigs sa ON sa.doc_id = c.doc_a
        |  JOIN sigs sb ON sb.doc_id = c.doc_b) z
        | WHERE est >= 0.6),
        |edgesA AS (SELECT doc_a AS u, doc_b AS v FROM estA
        |           UNION ALL SELECT doc_b, doc_a FROM estA),
        |reachA(doc_id, m) AS (
        | SELECT DISTINCT u, u FROM edgesA
        | UNION
        | SELECT e.u, reachA.m FROM edgesA e JOIN reachA ON reachA.doc_id = e.v),
        |labelsA AS (SELECT doc_id, min(m) AS cluster_id FROM reachA GROUP BY doc_id),
        |allp AS (SELECT doc_a, doc_b FROM estA
        |         UNION SELECT doc_a, doc_b FROM estB),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM allp
        |          UNION ALL SELECT doc_b, doc_a FROM allp),
        |reach(doc_id, m) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, reach.m FROM edges e JOIN reach ON reach.doc_id = e.v),
        |full_labels AS (SELECT doc_id, min(m) AS cluster_id FROM reach GROUP BY doc_id)
        |SELECT f.doc_id, f.cluster_id
        |FROM full_labels f LEFT JOIN labelsA a ON f.doc_id = a.doc_id
        |WHERE a.doc_id IS NULL OR a.cluster_id <> f.cluster_id""".stripMargin,

    // q62: the q16 portable-md5 MinHash SQL staged twice — stage A keepers
    // (doc_id < 250, in-batch only) form the index; stage B scores the
    // doc_id >= 250 batch against (index ∪ in-batch smaller ids) with
    // first-seen priority (ORDER BY prio, tgt ⇔ Spark's min(struct)).
    "q62_minhash_incremental" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents WHERE doc_id < 500),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairsA AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
        | WHERE x.doc_id < 250 AND y.doc_id < 250),
        |estA AS (
        | SELECT doc_b FROM (
        |  SELECT p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est
        |  FROM pairsA p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est >= 0.6),
        |keptA AS (
        | SELECT doc_id FROM documents WHERE doc_id < 250
        |  AND doc_id NOT IN (SELECT doc_b FROM estA)),
        |-- batch universe capped to match the Spark side's doc_id < 500
        |cand AS (
        | SELECT DISTINCT x.doc_id, y.doc_id AS tgt, 0 AS prio
        | FROM bands x JOIN bands y ON x.band_id = y.band_id AND x.band_hash = y.band_hash
        | WHERE x.doc_id >= 250 AND y.doc_id IN (SELECT doc_id FROM keptA)
        | UNION
        | SELECT DISTINCT x.doc_id, y.doc_id AS tgt, 1 AS prio
        | FROM bands x JOIN bands y ON x.band_id = y.band_id AND x.band_hash = y.band_hash
        | WHERE x.doc_id >= 250 AND y.doc_id >= 250 AND y.doc_id < x.doc_id),
        |fB AS (
        | SELECT doc_id, tgt, prio, est FROM (
        |  SELECT c.doc_id, c.tgt, c.prio,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est
        |  FROM cand c
        |  JOIN sigs sa ON sa.doc_id = c.doc_id
        |  JOIN sigs sb ON sb.doc_id = c.tgt) z
        | WHERE est >= 0.6),
        |kB AS (
        | SELECT doc_id, tgt AS cand, max_est_jaccard FROM (
        |  SELECT doc_id, tgt,
        |   row_number() OVER (PARTITION BY doc_id ORDER BY prio, tgt) AS rn,
        |   max(est) OVER (PARTITION BY doc_id) AS max_est_jaccard
        |  FROM fB) z WHERE rn = 1)
        |SELECT d.doc_id, COALESCE(kB.cand, d.doc_id) AS keeper_id, kB.max_est_jaccard
        |FROM documents d LEFT JOIN kB USING (doc_id)
        |WHERE d.doc_id >= 250 AND d.doc_id < 500""".stripMargin,

    // q86: the blocked pair space equals the declarative triple condition
    // (shared lowercased prefix + length within maxDist + levenshtein cut),
    // so the oracle states the contract directly as one self-join.
    "q86_fuzzy_blocked_dedup" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS head
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        | AND substr(lower(a.head), 1, 10) = substr(lower(b.head), 1, 10)
        | AND abs(length(a.head) - length(b.head)) <= 5
        |WHERE levenshtein(a.head, b.head) <= 5""".stripMargin,

    "q21_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        | s AS (SELECT doc_id, list_distinct(toks) AS uni,
        |   list_distinct(list_transform(range(1, greatest(len(toks) - 1, 2)),
        |     i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS tri
        |  FROM t)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(len(list_distinct(list_intersect(a.uni, b.uni))) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.uni, b.uni))) AS jaccard_1gram,
        | CAST(len(list_distinct(list_intersect(a.tri, b.tri))) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.tri, b.tri))) AS jaccard_3gram
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 250""".stripMargin,

    "q22_token_explode" ->
      """SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |      FROM documents) u
        |GROUP BY token
        |ORDER BY n_occurrences DESC, token LIMIT 20""".stripMargin,

    "q23_running_window" ->
      """SELECT user_id, event_id, ts,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_sum3,
        | COUNT(*) OVER w AS n_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q24_semi_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers, 'with_orders' AS cohort
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, COUNT(*) AS n_customers, 'no_orders' AS cohort
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q25_sql_text" ->
      """SELECT event_id,
        | TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        | CASE WHEN CAST(user_id % 2 AS VARCHAR) IS NULL THEN NULL
        |      WHEN lower(CAST(user_id % 2 AS VARCHAR)) IN ('true','1','yes') THEN TRUE
        |      ELSE FALSE END AS odd_user
        |FROM events""".stripMargin,

    "q26_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        | SELECT user_id, event_id, ts,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        | FROM flagged)
        |SELECT user_id, session_no, COUNT(*) AS n_events,
        | MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM numbered GROUP BY user_id, session_no""".stripMargin,

    "q103_event_throttle" ->
      """WITH flagged AS (
        | SELECT user_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 10*60*1000000 THEN 1
        |       ELSE 0 END AS new_burst
        | FROM events
        | WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
        | CAST(SUM(new_burst) AS BIGINT) AS n_kept,
        | CAST(COUNT(*) - SUM(new_burst) AS BIGINT) AS n_suppressed
        |FROM flagged GROUP BY user_id, event_type""".stripMargin,

    "q104_snapshot_diff" ->
      """WITH nxt AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey % 13 <> 0
        | UNION ALL
        | SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey % 17 = 0),
        |j AS (
        | SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN p.o_orderkey IS NULL THEN 'inserted'
        |       WHEN n.o_orderkey IS NULL THEN 'deleted'
        |       WHEN (p.o_custkey IS DISTINCT FROM n.o_custkey)
        |         OR (p.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
        |         OR (p.o_totalprice IS DISTINCT FROM n.o_totalprice)
        |         OR (p.o_orderdate IS DISTINCT FROM n.o_orderdate)
        |         OR (p.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
        |        THEN 'updated' END AS change_type
        | FROM orders p FULL OUTER JOIN nxt n ON p.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, change_type FROM j WHERE change_type IS NOT NULL""".stripMargin,

    "q101_session_window" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30*60*1000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        | SELECT user_id, ts,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        | FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        | MAX(ts) + INTERVAL 30 MINUTE AS session_end_gap,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY user_id, session_no""".stripMargin,

    "q102_pagerank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        | FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p
        |          UNION ALL SELECT id_b, id_a FROM p),
        |nodes AS (SELECT vec_id AS id FROM embeddings),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |r0 AS (SELECT id, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn),
        |c1 AS (SELECT ed.dst AS id, r0.rank / deg.deg AS c
        |       FROM edges ed JOIN r0 ON r0.id = ed.src
        |       JOIN deg ON deg.src = ed.src),
        |s1 AS (SELECT id, CAST(sum(CAST(c AS DECIMAL(18,12))) AS DOUBLE) AS cs
        |       FROM c1 GROUP BY id),
        |r1 AS (SELECT nodes.id,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |    + CAST(0.85 AS DOUBLE) * coalesce(s1.cs, CAST(0 AS DOUBLE)) AS rank
        | FROM nodes LEFT JOIN s1 USING (id), nn),
        |c2 AS (SELECT ed.dst AS id, r1.rank / deg.deg AS c
        |       FROM edges ed JOIN r1 ON r1.id = ed.src
        |       JOIN deg ON deg.src = ed.src),
        |s2 AS (SELECT id, CAST(sum(CAST(c AS DECIMAL(18,12))) AS DOUBLE) AS cs
        |       FROM c2 GROUP BY id),
        |r2 AS (SELECT nodes.id,
        |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
        |    + CAST(0.85 AS DOUBLE) * coalesce(s2.cs, CAST(0 AS DOUBLE)) AS rank
        | FROM nodes LEFT JOIN s2 USING (id), nn)
        |SELECT id AS vec_id, round(rank, 9) AS rank_r9 FROM r2""".stripMargin,

    "q27_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q96_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q94_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |   AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q95_large_orders" ->
      """WITH big AS (
        | SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        | HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
        |SELECT c_name, o_orderkey, o_totalprice,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        | AND o_orderkey IN (SELECT l_orderkey FROM big)
        |GROUP BY c_name, o_orderkey, o_totalprice""".stripMargin,

    "q31_quantiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | round(quantile_cont(value, 0.99), 6) AS p99,
        | MIN(value) AS v_min, MAX(value) AS v_max
        |FROM events GROUP BY event_type""".stripMargin,

    "q33_pivot" ->
      """SELECT user_id,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS "click",
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS "error",
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS "purchase",
        | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS "signup",
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS "view"
        |FROM events GROUP BY user_id""".stripMargin,

    "q57_pack_sequences" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |p0 AS (SELECT doc_id, unnest(range(CAST(len(t) AS BIGINT))) AS pos, t
        |       FROM t),
        |tok AS (SELECT doc_id, pos, t[pos + 1] AS token FROM p0),
        |vocab AS (
        | SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
        | FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |         AS token FROM documents) u
        | GROUP BY token),
        |v AS (SELECT token,
        |  CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |    AS token_id
        | FROM vocab),
        |enc AS (SELECT tok.doc_id, tok.pos, v.token_id
        |        FROM tok JOIN v USING (token)),
        |d AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_tokens,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 4
        |    AS shard
        | FROM documents),
        |c AS (
        | SELECT doc_id, shard, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |    AS cum_before
        | FROM d),
        |pk AS (SELECT doc_id, shard,
        |       CAST(cum_before // 512 AS BIGINT) AS pack_id,
        |       CAST(cum_before % 512 AS BIGINT) AS pack_offset FROM c)
        |SELECT pk.shard, pk.pack_id,
        | CAST(COUNT(DISTINCT enc.doc_id) AS BIGINT) AS n_docs,
        | CAST(COUNT(*) AS BIGINT) AS n_tokens,
        | string_agg(CAST(enc.token_id AS VARCHAR), ' '
        |   ORDER BY pk.pack_offset, enc.pos) AS seq
        |FROM enc JOIN pk USING (doc_id)
        |GROUP BY pk.shard, pk.pack_id""".stripMargin,

    "q56_label_centroids" ->
      """WITH e AS (
        | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        | FROM embeddings),
        |p AS (SELECT vec_id, label, v,
        |      unnest(range(CAST(len(v) AS BIGINT))) AS pos FROM e),
        |x AS (SELECT vec_id, label, pos, v[pos + 1] AS x FROM p),
        |cent AS (
        | SELECT label, pos,
        |  CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE) / COUNT(x) AS c
        | FROM x GROUP BY label, pos),
        |per AS (
        | SELECT x.vec_id, x.label,
        |  CAST(SUM(CAST(x.x * cent.c AS DECIMAL(18,12))) AS DOUBLE) AS dot,
        |  CAST(SUM(CAST(x.x * x.x AS DECIMAL(18,12))) AS DOUBLE) AS nx,
        |  CAST(SUM(CAST(cent.c * cent.c AS DECIMAL(18,12))) AS DOUBLE) AS nc
        | FROM x JOIN cent USING (label, pos)
        | GROUP BY x.vec_id, x.label),
        |cv AS (SELECT label, dot / sqrt(nx * nc) AS cos FROM per
        |       WHERE nx > 0 AND nc > 0)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        | round(CAST(SUM(CAST(cos AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6)
        |   AS mean_cos_r6
        |FROM cv GROUP BY label""".stripMargin,

    "q55_asof_exec" ->
      """WITH oa AS (
        | SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        | FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.ts,
        | oa.o_orderdate AS asof_o_orderdate,
        | oa.o_orderkey AS asof_o_orderkey,
        | oa.day_total AS asof_day_total
        |FROM events e
        |ASOF LEFT JOIN oa
        |  ON e.user_id = oa.o_custkey AND e.ts >= oa.o_orderdate""".stripMargin,

    "q54_weighted_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
        |  < CASE source WHEN 'src0' THEN 65536 WHEN 'src1' THEN 32768
        |                WHEN 'src2' THEN 8192 ELSE 0 END""".stripMargin,

    "q51_vocab_encode" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |p AS (SELECT doc_id, unnest(range(CAST(len(t) AS BIGINT))) AS pos, t
        |      FROM t),
        |tok AS (SELECT doc_id, pos, t[pos + 1] AS token FROM p),
        |vocab AS (
        | SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
        | FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |         AS token FROM documents) u
        | GROUP BY token),
        |v AS (SELECT token,
        |  CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
        |    AS token_id
        | FROM vocab)
        |SELECT tok.doc_id, tok.pos, tok.token, v.token_id
        |FROM tok LEFT JOIN v USING (token)""".stripMargin,

    "q52_sequence_pack" ->
      """WITH d AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_tokens,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 4
        |    AS shard
        | FROM documents),
        |c AS (
        | SELECT doc_id, shard, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |    AS cum_before
        | FROM d)
        |SELECT doc_id, shard, CAST(cum_before // 512 AS BIGINT) AS pack_id,
        | CAST(cum_before % 512 AS BIGINT) AS pack_offset, n_tokens
        |FROM c""".stripMargin,

    "q53_decontaminate" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |g AS (
        | SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
        |   list_distinct(list_transform(range(1, len(t) - 1),
        |     i -> array_to_string(t[i : i + 2], ' ')))
        |  ELSE [] END) AS gram
        | FROM t),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |train AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0)
        |SELECT train.doc_id,
        | CAST(COUNT(DISTINCT train.gram) AS BIGINT) AS n_shared_grams
        |FROM train JOIN bench USING (gram)
        |GROUP BY train.doc_id""".stripMargin,

    "q50_bloom_prune" ->
      """SELECT o.o_orderstatus, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY o.o_orderstatus""".stripMargin,

    "q48_pii_scrub" ->
      """WITH s AS (
        | SELECT doc_id,
        |  text || ' contact user' || doc_id ||
        |    '@example.com or 555-123-4567 ref 123456789' AS synth
        | FROM documents)
        |SELECT doc_id,
        | regexp_replace(
        |  regexp_replace(
        |   regexp_replace(synth,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |  '\b\d{9,}\b', '<ID>', 'g') AS clean,
        | CAST(len(regexp_extract_all(synth,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(synth, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
        |  + len(regexp_extract_all(synth, '\b\d{9,}\b')) AS BIGINT) AS n_pii
        |FROM s""".stripMargin,

    "q49_chunk_tokens" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
        |c AS (SELECT doc_id, toks, n_tok,
        |  CASE WHEN n_tok <= 24 THEN 1
        |       ELSE (n_tok - 24 + 11) // 12 + 1 END AS n_chunks FROM n),
        |w AS (SELECT doc_id, toks, n_tok,
        |  unnest(range(n_chunks)) AS chunk_no FROM c)
        |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
        | array_to_string(toks[chunk_no*12+1 : chunk_no*12+24], ' ') AS chunk,
        | least(24, n_tok - chunk_no*12) AS chunk_tokens
        |FROM w""".stripMargin,

    "q46_det_sample" ->
      """SELECT doc_id, source,
        | CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
        |   AS bucket,
        | CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 8
        |   AS shard
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
        |      < 8192""".stripMargin,

    // q105: the whole sampling pipeline — priorities, top-k cut, τ, and
    // estimates — is IEEE-exact (power-of-two multiply + one correctly-
    // rounded divide), so every column value-checks bit-for-bit.
    "q105_priority_sample" ->
      """WITH p AS (
        | SELECT doc_id, n_chars,
        |  (CAST(n_chars AS DOUBLE) * 65536.0) /
        |   CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |     AS INTEGER) + 1 AS DOUBLE) AS sample_pri,
        |  md5(CAST(doc_id AS VARCHAR)) AS tb
        | FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT *, row_number()
        |  OVER (ORDER BY sample_pri DESC, tb, doc_id) AS rn FROM p),
        |tau AS (SELECT coalesce(max(CASE WHEN rn = 51 THEN sample_pri END),
        |  0.0) AS tau FROM r)
        |SELECT doc_id, n_chars, sample_pri,
        | greatest(CAST(n_chars AS DOUBLE), tau.tau) AS est_weight
        |FROM r, tau WHERE rn <= 50""".stripMargin,

    // q106: rank-cut equi-depth cells — integer division on the row_number
    // replays exactly; value bounds are raw doubles.
    "q106_equidepth_histogram" ->
      """WITH nn AS (SELECT CAST(o_totalprice AS DOUBLE) AS x, o_orderkey AS t
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |c AS (SELECT count(*) AS total FROM nn),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, t) AS rn FROM nn)
        |SELECT CAST(((rn - 1) * 8) // c.total AS BIGINT) AS bin,
        | CAST(count(*) AS BIGINT) AS n, min(x) AS lo, max(x) AS hi
        |FROM r, c GROUP BY 1""".stripMargin,

    // q107: md5 is md5 in both engines, and addition commutes — the
    // signature replays exactly whatever the row order.
    "q107_corpus_manifest" ->
      """SELECT source AS group_key, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) - count(text) AS BIGINT) AS n_null_content,
        | CAST(min(doc_id) AS VARCHAR) AS min_id,
        | CAST(max(doc_id) AS VARCHAR) AS max_id,
        | CAST(sum(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
        |   coalesce(text, '')), 1, 8)) AS BIGINT)) AS BIGINT) AS content_sig
        |FROM documents GROUP BY source""".stripMargin,

    // q108: the q76 tokenization replayed into posting lists, then the
    // positional intersection stated directly.
    "q108_phrase_search" ->
      """WITH t AS (
        | SELECT doc_id,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents WHERE text IS NOT NULL),
        |tp AS (SELECT doc_id, w,
        |  unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS p FROM t),
        |toks AS (SELECT doc_id, p - 1 AS pos, w[p] AS tok FROM tp
        |  WHERE w[p] <> ''),
        |a AS (SELECT doc_id, pos FROM toks WHERE tok = 'key'),
        |b AS (SELECT doc_id, pos FROM toks WHERE tok = 'scan')
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
        |FROM a JOIN b ON a.doc_id = b.doc_id AND a.pos + 1 = b.pos
        |GROUP BY a.doc_id""".stripMargin,

    // q109: the binned exactly-once equi-join must equal this plain
    // inequality overlap join — the oracle IS the semantics contract.
    "q109_interval_overlap" ->
      """WITH a AS (SELECT user_id, min(ts) AS v_start,
        |  max(ts) + INTERVAL 1 SECOND AS v_end
        | FROM events WHERE event_type = 'view' GROUP BY user_id),
        |b AS (SELECT user_id, min(ts) AS c_start,
        |  max(ts) + INTERVAL 1 SECOND AS c_end
        | FROM events WHERE event_type = 'click' GROUP BY user_id)
        |SELECT a.user_id, v_start, v_end, c_start, c_end,
        | least(epoch_us(v_end), epoch_us(c_end)) -
        |  greatest(epoch_us(v_start), epoch_us(c_start)) AS overlap_micros
        |FROM a JOIN b ON a.user_id = b.user_id
        | AND v_start < c_end AND c_start < v_end""".stripMargin,

    // q110: q32 treatment — exact counts value-checked; the sketch's
    // never-undercount guarantee and the 2N/width band are deterministic
    // booleans (fixed MurmurHash3 seeds), pinned TRUE.
    "q110_cm_counts" ->
      """SELECT event_type AS item, CAST(count(*) AS BIGINT) AS exact_n,
        | TRUE AS cm_never_under, TRUE AS cm_within_band
        |FROM events GROUP BY event_type""".stripMargin,

    // q111: the window form IS the contract — the bounded-heap aggregate
    // must reproduce it row-for-row (tie order on the STRING form of the
    // id, matching the aggregate's keying).
    "q111_topk_per_group" ->
      """SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, tie, val FROM (
        | SELECT o_custkey, CAST(o_orderkey AS VARCHAR) AS tie,
        |  CAST(o_totalprice AS DOUBLE) AS val,
        |  row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY CAST(o_totalprice AS DOUBLE) DESC,
        |            CAST(o_orderkey AS VARCHAR)) AS rnk
        | FROM orders) r WHERE rnk <= 3""".stripMargin,

    // q112: the q58 3-gram replay → tf vectors → term-keyed pair join;
    // integer dots, IEEE sqrt/multiply/divide — bit-exact. maxDf 64
    // mirrors the Spark side (evidence-based fence; no gram reaches it
    // at oracle scale — dfs top out at 7 — so the result set equals the
    // unfenced space).
    "q112_sparse_cosine" ->
      """WITH t AS (
        | SELECT doc_id,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN
        |   list_transform(range(1, CAST(len(w) AS BIGINT) - 1),
        |     i -> array_to_string(w[i : i + 2], ' '))
        |  ELSE [] END) AS tok FROM t),
        |tf AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM g GROUP BY 1, 2),
        |kept AS (SELECT tf.* FROM tf JOIN (
        |  SELECT tok FROM tf GROUP BY tok HAVING count(*) <= 64) d
        |  USING (tok)),
        |norms AS (SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS norm
        |  FROM kept GROUP BY 1),
        |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        | FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b, dot,
        | CAST(dot AS DOUBLE) / (na.norm * nb.norm) AS cosine
        |FROM dots JOIN norms na ON na.doc_id = doc_a
        | JOIN norms nb ON nb.doc_id = doc_b
        |WHERE CAST(dot AS DOUBLE) / (na.norm * nb.norm) >= 0.5""".stripMargin,

    // q113: the chained strictly-after min-aggregates stated as CTEs; the
    // monotone-null funnel depth as a CASE sum.
    "q113_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY 1)
        |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
        | CAST(CASE WHEN s1.t_view IS NULL THEN 0 ELSE 1 END +
        |      CASE WHEN s2.t_click IS NULL THEN 0 ELSE 1 END +
        |      CASE WHEN s3.t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |   AS converted_steps
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        | LEFT JOIN s3 USING (user_id)""".stripMargin,

    // q114: both engines truncate weeks to ISO Monday, so the day
    // difference is divisible by 7 and the offset is lossless integer
    // division.
    "q114_cohort_retention" ->
      """WITH cohort AS (SELECT user_id,
        |  CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        | FROM events GROUP BY 1),
        |active AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS week FROM events)
        |SELECT cohort_week,
        | CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT)
        |   AS week_offset,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // q115: the banded-Hamming relational half replayed from the decode
    // half's fixture (8 bytes per asset, dumped by the query itself):
    // band explode, (band, value)-equality candidate join, XOR popcount
    // verify, threshold — DuckDB's >> is the same arithmetic shift and
    // bit_count the same two's-complement popcount as Spark's. Only the
    // ImageIO decode stays model-tested.
    "q115_image_neardup" ->
      s"""WITH h AS (
        | SELECT asset_id, phash
        | FROM read_parquet('$imageHashFixtureDir/*.parquet')),
        |b AS (
        | SELECT asset_id, phash, (phash >> (band * 8)) & 255 AS bv, band
        | FROM h, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) t(band)),
        |cand AS (
        | SELECT DISTINCT x.asset_id AS asset_a, x.phash AS pa,
        |                 y.asset_id AS asset_b, y.phash AS pb
        | FROM b x JOIN b y ON x.band = y.band AND x.bv = y.bv
        |   AND x.asset_id < y.asset_id)
        |SELECT asset_a, asset_b,
        | CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 4""".stripMargin,

    // q116: the rank-window form is the contract (STRING tie order on the
    // user id, matching the aggregate's keying; val cast back to BIGINT).
    "q116_trending" ->
      """WITH daily AS (
        | SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
        |  CAST(count(*) AS BIGINT) AS n_events
        | FROM events GROUP BY 1, 2)
        |SELECT day, CAST(rnk AS BIGINT) AS rnk, user_id,
        | CAST(n_events AS BIGINT) AS n_events FROM (
        | SELECT day, CAST(user_id AS VARCHAR) AS user_id, n_events,
        |  row_number() OVER (PARTITION BY day
        |   ORDER BY n_events DESC, CAST(user_id AS VARCHAR)) AS rnk
        | FROM daily) r WHERE rnk <= 3""".stripMargin,

    // q117: q105's arithmetic with a per-group window + per-group τ; the
    // tie rule is the key's STRING form (the aggregate's keying).
    "q117_priority_sample_grouped" ->
      """WITH p AS (
        | SELECT source AS group_key, CAST(doc_id AS VARCHAR) AS key,
        |  CAST(n_chars AS DOUBLE) AS w,
        |  (CAST(n_chars AS DOUBLE) * 65536.0) /
        |   CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |     AS INTEGER) + 1 AS DOUBLE) AS pri
        | FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY group_key
        |  ORDER BY pri DESC, key) AS rn FROM p),
        |tau AS (SELECT group_key,
        |  coalesce(max(CASE WHEN rn = 6 THEN pri END), 0.0) AS tau
        | FROM r GROUP BY 1)
        |SELECT r.group_key, r.key, CAST(rn AS BIGINT) AS rnk,
        | pri AS sample_pri, greatest(w, tau.tau) AS est_weight
        |FROM r JOIN tau USING (group_key) WHERE rn <= 5""".stripMargin,

    // q118: exact join cardinality value-checked; the CM inner-product
    // bound's booleans are deterministic (fixed hashes) and pinned TRUE.
    "q118_join_size_estimate" ->
      """SELECT CAST(count(*) AS BIGINT) AS exact_join_size,
        | TRUE AS est_never_under, TRUE AS est_within_band
        |FROM events e JOIN orders o ON e.user_id = o.o_custkey""".stripMargin,

    // q119: identical SQL window semantics in both engines — fractions
    // replay bit-for-bit; ntile's uneven-bucket rule matches too.
    "q119_ranked_analytics" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders WHERE o_orderkey % 17 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q120_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())""".stripMargin,

    // q121: LAST_VALUE IGNORE NULLS over the same dense grid; the daily
    // sums are decimal-exact, so the filled copies replay bit-for-bit.
    "q121_gap_fill" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(DATE '1996-01-01',
        |    DATE '1996-12-31', INTERVAL 1 day))::DATE AS d),
        |pris AS (SELECT DISTINCT o_orderpriority AS pri FROM orders
        |         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |           AND o_orderdate <  TIMESTAMP '1997-01-01'),
        |daily AS (
        |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev0
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2)
        |SELECT p.pri, s.d,
        |  COALESCE(dl.rev0, 0.0) AS rev_day,
        |  COALESCE(LAST_VALUE(dl.rev0 IGNORE NULLS) OVER (
        |    PARTITION BY p.pri ORDER BY s.d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
        |    AS rev_ffill
        |FROM spine s CROSS JOIN pris p
        |LEFT JOIN daily dl ON dl.pri = p.pri AND dl.d = s.d""".stripMargin,

    // q122: arg_min/arg_max on the identical fixed-width order key.
    "q122_ohlc_resample" ->
      """SELECT event_type, CAST(ts AS DATE) AS bucket,
        | arg_min(value, printf('%020d-%010d', epoch_us(ts), event_id)) AS open,
        | arg_max(value, printf('%020d-%010d', epoch_us(ts), event_id)) AS close,
        | min(value) AS low, max(value) AS high,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    // q123: every event expanded into its 2 overlapping buckets (width 6 h,
    // slide 3 h; k = 0,1 always lands inside — width/slide exact).
    "q123_hopping_window" ->
      """WITH expanded AS (
        |  SELECT time_bucket(INTERVAL 3 hours, ts) - TO_HOURS(3*k) AS w_start,
        |    event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0,1]) AS k) ks)
        |SELECT w_start, w_start + INTERVAL 6 hours AS w_end, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM expanded GROUP BY 1, 2, 3""".stripMargin,

    // q125: identical dense grid, then decimal-summed ROWS frames.
    "q125_moving_avg" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(DATE '1996-01-01',
        |    DATE '1996-12-31', INTERVAL 1 day))::DATE AS d),
        |pris AS (SELECT DISTINCT o_orderpriority AS pri FROM orders
        |         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |           AND o_orderdate <  TIMESTAMP '1997-01-01'),
        |daily AS (
        |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev0
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT p.pri, s.d, COALESCE(dl.rev0, 0.0) AS rev_day
        |  FROM spine s CROSS JOIN pris p
        |  LEFT JOIN daily dl ON dl.pri = p.pri AND dl.d = s.d)
        |SELECT pri, d, rev_day,
        |  CAST(SUM(CAST(rev_day AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
        |    / COUNT(*) OVER w7 AS ma7,
        |  rev_day / CAST(SUM(CAST(rev_day AS DECIMAL(18,2)))
        |    OVER (PARTITION BY pri) AS DOUBLE) AS share
        |FROM grid
        |WINDOW w7 AS (PARTITION BY pri ORDER BY d
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    // q126-q128: dialect-shared SQL — DuckDB runs the same statements.
    "q126_exists_decorrelated" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F'
        |                    AND o2.o_totalprice > 450000)""".stripMargin,

    "q127_scalar_subquery" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(*)
        |  FROM orders o2
        |  WHERE o2.o_orderpriority = o.o_orderpriority)""".stripMargin,

    "q128_set_ops" ->
      """(SELECT user_id FROM events
        |   WHERE event_type = 'purchase' AND value > 100
        | INTERSECT
        | SELECT user_id FROM events
        |   WHERE event_type = 'error' AND value > 100)
        |EXCEPT
        |SELECT user_id FROM events
        |  WHERE event_type = 'signup' AND value > 150""".stripMargin,

    // q129: the same WITH RECURSIVE statement runs on both engines.
    "q129_recursive_cte" ->
      """WITH RECURSIVE edges AS (
        |  SELECT CONCAT('R', CAST(r_regionkey AS STRING)) AS parent,
        |         CONCAT('N', CAST(n_nationkey AS STRING)) AS child
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  UNION ALL
        |  SELECT CONCAT('N', CAST(n_nationkey AS STRING)),
        |         CONCAT('S', CAST(s_suppkey AS STRING))
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |),
        |walk AS (
        |  SELECT 'R0' AS node, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT e.child, w.depth + 1
        |  FROM walk w JOIN edges e ON e.parent = w.node
        |)
        |SELECT node, depth FROM walk""".stripMargin,

    // q130: the oracle extracts the same typed path via its JSON functions.
    "q130_variant_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |   AS k_sum,
        | CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |   AS k_min,
        | CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |   AS k_max
        |FROM events GROUP BY event_type""".stripMargin,

    // q131/q132: dialect-shared statements.
    "q131_filtered_agg" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |    AS BIGINT) AS n_urgent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |    AS DOUBLE) AS rev_hot,
        |  CAST(count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
        |    AS BIGINT) AS big_buyers
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q132_lateral_topk" ->
      """SELECT r.r_name, t.n_name, t.cnt
        |FROM region r,
        |LATERAL (SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
        |         FROM nation n
        |         JOIN customer c ON c_nationkey = n_nationkey
        |         WHERE n_regionkey = r.r_regionkey
        |         GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2) t""".stripMargin,

    // q133: the long form re-derived with FILTER counts + UNION ALL.
    "q133_unpivot" ->
      """WITH p AS (
        |  SELECT user_id,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
        |      AS click,
        |    CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
        |      AS error
        |  FROM events GROUP BY user_id)
        |SELECT user_id, 'click' AS event_type, click AS cnt FROM p
        |UNION ALL
        |SELECT user_id, 'error' AS event_type, error AS cnt FROM p""".stripMargin,

    // q134: quantile_cont is the same linear-interpolation definition.
    "q134_grouped_median" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS med,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    // q135: both engines lowercase-hex md5 the same bytes, so the global
    // shuffle order — and therefore every fixed-size shard boundary —
    // replays exactly.
    "q135_shard_manifest" ->
      """WITH ranked AS (
        | SELECT doc_id, n_chars,
        |  row_number() OVER (
        |    ORDER BY md5('shard|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents)
        |SELECT CAST((rn-1)//250 AS BIGINT) AS shard,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(min(doc_id) AS BIGINT) AS min_doc,
        | CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM ranked GROUP BY 1""".stripMargin,

    // q136: the tie-break (cnt DESC, event_type ASC) makes the mode a
    // function of the data, not the engine.
    "q136_grouped_mode" ->
      """WITH c AS (
        | SELECT user_id, event_type, count(*) AS cnt
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT user_id, event_type, cnt,
        |  row_number() OVER (
        |    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rk
        | FROM c)
        |SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rk = 1""".stripMargin,

    // q137: identical integer-micros ordering key and frame bound; the
    // decimal-exact sum keeps the trailing aggregate hashable.
    "q137_range_frame" ->
      """SELECT user_id, event_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_24h,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        | RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // q138: q64's component pipeline (same CTE chain) extended with the
    // ranked keep-best selection — survivor choice is value-checked, not
    // just cluster membership.
    "q138_dedup_keep_best" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents WHERE doc_id < 500),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairs AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
        |est AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT p.doc_a, p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est_jaccard
        |  FROM pairs p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est_jaccard >= 0.6),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM est
        |          UNION ALL SELECT doc_b, doc_a FROM est),
        |reach(doc_id, m) AS (
        | SELECT DISTINCT u, u FROM edges
        | UNION
        | SELECT e.u, reach.m FROM edges e JOIN reach ON reach.doc_id = e.v),
        |clusters AS (SELECT doc_id, min(m) AS cluster_id FROM reach GROUP BY doc_id),
        |members AS (
        | SELECT c.cluster_id, c.doc_id, d.n_chars
        | FROM clusters c JOIN documents d USING (doc_id)),
        |ranked AS (
        | SELECT cluster_id, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk
        | FROM members),
        |sizes AS (
        | SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM members GROUP BY 1)
        |SELECT r.cluster_id, r.doc_id AS kept_doc, CAST(r.n_chars AS BIGINT) AS kept_chars,
        | s.n_members, s.n_members - 1 AS n_dropped
        |FROM ranked r JOIN sizes s USING (cluster_id) WHERE rk = 1""".stripMargin,

    // q139: identical running-sum formulation; integer weights make the
    // half-total cut exact on both engines.
    "q139_weighted_median" ->
      """WITH t AS (
        | SELECT l_returnflag AS flag, l_extendedprice AS price,
        |  CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber
        | FROM lineitem),
        |c AS (
        | SELECT flag, price, qty,
        |  sum(qty) OVER (PARTITION BY flag
        |    ORDER BY price, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(qty) OVER (PARTITION BY flag) AS tot
        | FROM t)
        |SELECT flag, min(price) AS w_median,
        | CAST(min(tot) AS BIGINT) AS total_weight
        |FROM c WHERE 2*cum >= tot GROUP BY flag""".stripMargin,

    // q140: identical statement — both engines decorrelate; counts hash.
    "q140_sole_late_supplier" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        | AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        | AND EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s.s_name""".stripMargin,

    // q141: identical statement; decimal-exact mean keeps the threshold
    // compare engine-independent.
    "q141_dormant_high_balance" ->
      """SELECT c.c_nationkey AS nation, CAST(count(*) AS BIGINT) AS numcust,
        | CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (
        |   SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |          / count(*)
        |   FROM customer c2 WHERE c2.c_acctbal > 0.0)
        | AND NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        |GROUP BY c.c_nationkey""".stripMargin,

    // q142: decimal-exact revenue; six-decimal share rounding absorbs the
    // sub-ulp window-summation-order difference.
    "q142_revenue_share" ->
      """WITH rev AS (
        | SELECT n.n_regionkey AS region, n.n_name AS nation,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        | FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | GROUP BY 1, 2)
        |SELECT region, nation, revenue,
        | round(revenue / sum(revenue) OVER (PARTITION BY region), 6) AS share
        |FROM rev""".stripMargin,

    // q143: rank() ties are order-independent, so the banded top-k set is
    // a pure function of the data.
    "q143_ranked_ties" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_band, rnk FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY floor(o_totalprice / 50000) DESC) AS BIGINT) AS rnk
        | FROM orders) t WHERE rnk <= 5""".stripMargin,

    // q144: the Spark side ran pure SQL through the graft catalog over a
    // TxTable whose v1 commit is exactly the even-o_orderkey half of
    // `orders`; the oracle replays head as all rows and v1 as that half.
    // DuckDB's sum(BIGINT) widens to HUGEINT — cast back for the compare.
    "q144_sql_lakehouse" ->
      """WITH h AS (SELECT o_orderstatus, count(*) AS n_all,
        |                  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |           FROM orders GROUP BY o_orderstatus),
        |     v AS (SELECT o_orderstatus, count(*) AS n_v1
        |           FROM orders WHERE o_orderkey % 2 = 0
        |           GROUP BY o_orderstatus)
        |SELECT h.o_orderstatus, h.n_all, h.sum_key, v.n_v1
        |FROM h JOIN v ON h.o_orderstatus = v.o_orderstatus""".stripMargin,

    // q145: generated — 20 chained literal replace() passes; see
    // bpeApplyOracleSql for the encoding argument.
    "q145_bpe_apply" -> bpeApplyOracleSql,
    "q81_bpe_segment" -> bpeTrainSegmentOracleSql,

    // q148: the stream replicated the even-o_orderkey filter of `orders`
    // exactly-once; the oracle replays the transform relationally.
    // DuckDB's sum(BIGINT) widens to HUGEINT — cast back for the compare.
    "q148_stream_replicate" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders WHERE o_orderkey % 2 = 0
        |GROUP BY o_orderstatus""".stripMargin,

    // q149: after the full maintenance loop (pack, z-order rewrite, log
    // compaction, vacuum) the table must still be exactly `orders` —
    // every maintenance action is a permutation of the live rows.
    // the maintain() cycles replay relationally: three slices (key%9 in
    // 0..2) deleted, their even keys re-inserted — final live set =
    // NOT(key%9<3 AND odd). Every maintenance action in between is a
    // permutation of live rows; dv_bounded = true pins the policy's
    // read-tax bound as a measured fact.
    "q149_sql_maintenance" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | true AS dv_bounded
        |FROM orders
        |WHERE NOT (o_orderkey % 9 < 3 AND o_orderkey % 2 = 1)
        |GROUP BY o_orderstatus""".stripMargin,

    // q150: the evolution sequence replayed relationally — the CTAS rows
    // carry a typed NULL for the later-declared column, the INSERT rows
    // carry values, the UPDATE is CASE; v1_cols = 2 IS the time-travel
    // assertion (the pre-ALTER snapshot's column count).
    "q150_sql_evolution" ->
      """WITH base AS (
        | SELECT o_orderkey, o_orderstatus, CAST(NULL AS BIGINT) AS prio
        | FROM orders WHERE o_orderkey % 4 <> 1
        | UNION ALL
        | SELECT o_orderkey, o_orderstatus, o_orderkey % 7
        | FROM orders WHERE o_orderkey % 4 = 1),
        |t AS (
        | SELECT o_orderstatus,
        |  CASE WHEN prio IS NULL AND o_orderkey % 10 = 0 THEN 99
        |       ELSE prio END AS prio
        | FROM base)
        |SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(coalesce(prio, -1)) AS BIGINT) AS prio_sum,
        | count(prio) AS prio_n, 2 AS v1_cols
        |FROM t GROUP BY o_orderstatus""".stripMargin,

    // q151: both stages replay as the SAME delete-filtered aggregate —
    // merge-on-read and purged reads must agree row-for-row. files_moved
    // = 0 and had_dvs = true are the mechanics pinned as literals;
    // deleted_n is recomputed relationally (the vectors' cardinality IS
    // the count of matching rows).
    "q151_sql_dv_delete" ->
      """WITH t AS (
        | SELECT o_orderstatus, o_totalprice FROM orders
        | WHERE o_orderkey % 10 <> 3 AND o_orderkey % 7 <> 2),
        |a AS (
        | SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  0 AS files_moved, true AS had_dvs,
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderkey % 10 = 3 OR o_orderkey % 7 = 2) AS deleted_n
        | FROM t GROUP BY o_orderstatus)
        |SELECT 'mor' AS stage, * FROM a
        |UNION ALL
        |SELECT 'purged' AS stage, * FROM a""".stripMargin,

    // q152: q147's MERGE set-algebra shape under the merge-on-read
    // engine — matched tombstones (odd & %5=0) removed, matched
    // survivors (odd) price-tripled, guarded inserts (odd, not target,
    // not tombstone) tripled, target-only (even keys of the %3=1 slice)
    // untouched; files_moved = 0 is the merge-on-read promise.
    "q152_sql_dv_merge" ->
      """WITH fin AS (
        | SELECT k, st,
        |  CASE WHEN k % 2 = 1 THEN price * 3 ELSE price END AS price
        | FROM (SELECT o_orderkey AS k, o_orderstatus AS st,
        |              o_totalprice AS price
        |       FROM orders WHERE o_orderkey % 3 = 1)
        | WHERE NOT (k % 2 = 1 AND k % 5 = 0)
        | UNION ALL
        | SELECT o_orderkey, o_orderstatus, o_totalprice * 3 FROM orders
        | WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 <> 1
        |   AND o_orderkey % 5 <> 0)
        |SELECT st, count(*) AS n,
        | CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | 0 AS files_moved
        |FROM fin GROUP BY st""".stripMargin,

    // q153: the mapping DDL replays as plain relational algebra — the
    // CTAS and INSERT halves reunite the whole corpus, the rename is an
    // output alias, the dropped column simply never projects. 0 and 4
    // are the metadata-only / time-travel literals the Spark side pins.
    "q153_sql_column_mapping" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | 0 AS files_moved, 4 AS v1_cols
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    // q154: DDL-first CREATE TABLE replays as the plain corpus aggregate
    // — the DDL contributes zero rows by definition; 0/0/true are the
    // schema-only-commit, zero-data-files, and declared-layout literals
    // the Spark side measures.
    "q154_sql_create_table" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | CAST(0 AS BIGINT) AS empty_n, 0 AS v1_live, true AS partitioned
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    // q156: the WHOLE trained classifier replays relationally — training
    // counts over the shared literal corpora, add-α mean-probability
    // scores (one IEEE division per gram, decimal-exact mean), and the
    // per-doc argmax as a row_number window with the same deterministic
    // tie-break. Both engines see identical training/planted strings
    // (interpolated from one Scala constant).
    "q156_lang_id" -> {
      val trainVals = langIdTraining
        .map { case (l, t) => s"('$l', '$t')" }.mkString(", ")
      val plantedVals = langIdPlanted
        .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
      s"""WITH train(lang, text) AS (SELECT * FROM (VALUES $trainVals)),
         |planted(doc_id, text) AS (SELECT * FROM (VALUES $plantedVals)),
         |tgt AS (SELECT doc_id, text FROM documents WHERE doc_id < 200
         |        UNION ALL SELECT doc_id, text FROM planted),
         |refg AS (
         | SELECT lang, g FROM (
         |  SELECT lang, substr(lower(text), CAST(i AS INT), 2) AS g FROM (
         |   SELECT lang, text, unnest(range(1,
         |    CAST(greatest(length(text) - 1, 1) AS BIGINT) + 1)) AS i
         |   FROM train) p2) x2
         | WHERE length(g) = 2
         | UNION ALL
         | SELECT lang, g FROM (
         |  SELECT lang, substr(lower(text), CAST(i AS INT), 3) AS g FROM (
         |   SELECT lang, text, unnest(range(1,
         |    CAST(greatest(length(text) - 2, 1) AS BIGINT) + 1)) AS i
         |   FROM train) p3) x3
         | WHERE length(g) = 3),
         |tgtg AS (
         | SELECT doc_id, g FROM (
         |  SELECT doc_id, substr(lower(text), CAST(i AS INT), 2) AS g FROM (
         |   SELECT doc_id, text, unnest(range(1,
         |    CAST(greatest(length(text) - 1, 1) AS BIGINT) + 1)) AS i
         |   FROM tgt WHERE text IS NOT NULL) q2) y2
         | WHERE length(g) = 2
         | UNION ALL
         | SELECT doc_id, g FROM (
         |  SELECT doc_id, substr(lower(text), CAST(i AS INT), 3) AS g FROM (
         |   SELECT doc_id, text, unnest(range(1,
         |    CAST(greatest(length(text) - 2, 1) AS BIGINT) + 1)) AS i
         |   FROM tgt WHERE text IS NOT NULL) q3) y3
         | WHERE length(g) = 3),
         |cg AS (SELECT lang, g, count(*) AS cg FROM refg GROUP BY 1, 2),
         |ct AS (SELECT lang, count(*) AS ct FROM refg GROUP BY 1),
         |v AS (SELECT count(DISTINCT g) AS v FROM refg),
         |scored AS (
         | SELECT t.doc_id, ct.lang,
         |  (CAST(coalesce(cg.cg, 0) AS DOUBLE) + 0.5) /
         |  (CAST(ct.ct AS DOUBLE) + 0.5 * CAST(v.v AS DOUBLE)) AS pr
         | FROM tgtg t CROSS JOIN ct CROSS JOIN v
         | LEFT JOIN cg ON cg.lang = ct.lang AND cg.g = t.g),
         |per AS (
         | SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_grams,
         |  round(CAST(sum(CAST(pr AS DECIMAL(18,12))) AS DOUBLE) / count(*), 9)
         |    AS score_r9
         | FROM scored GROUP BY 1, 2),
         |win AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |         ORDER BY score_r9 DESC, lang ASC) AS rn FROM per)
         |SELECT t.doc_id, w.lang, w.score_r9,
         | CAST(coalesce(w.n_grams, 0) AS BIGINT) AS n_grams
         |FROM tgt t LEFT JOIN (SELECT * FROM win WHERE rn = 1) w
         |USING (doc_id)""".stripMargin
    },

    // q158: the identity allocation replays relationally — ids are
    // row_number() in each insert's ORDER BY, offset by the prior batch;
    // true/next are the GENERATED-ALWAYS-refusal and allocator-state
    // literals the Spark side measures.
    "q158_sql_identity" ->
      """WITH b1 AS (
        | SELECT CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS id,
        |        n_name
        | FROM nation WHERE n_regionkey = 0),
        |b2 AS (
        | SELECT CAST(row_number() OVER (ORDER BY n_name)
        |          + (SELECT count(*) FROM b1) AS BIGINT) AS id, n_name
        | FROM nation WHERE n_regionkey = 1),
        |allr AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
        |SELECT id, n_name, true AS refused,
        | CAST((SELECT count(*) FROM allr) + 1 AS BIGINT) AS next_v
        |FROM allr""".stripMargin,

    // q159: the evolved-merge result replays relationally — even keys
    // carry a NULL status (the backfill contract), odd keys their real
    // one; the NULL group's n/total pin that old rows joined the evolved
    // schema without a rewrite.
    "q159_sql_merge_evolution" ->
      """WITH t AS (
        | SELECT o_orderkey AS k, o_totalprice AS price,
        |        CAST(NULL AS VARCHAR) AS status
        | FROM orders WHERE o_orderkey % 2 = 0
        | UNION ALL
        | SELECT o_orderkey, o_totalprice, o_orderstatus
        | FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT status, count(*) AS n,
        | CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | count(status) AS with_status
        |FROM t GROUP BY status""".stripMargin,

    // q160: the identity-merge replays relationally — initial ids are
    // name-rank over the two-region slice; inserted ids are 10 + name-rank
    // over ALL source rows (matched rows' reservations are gaps); 36 is
    // the allocator literal (10 + 25 reserved + 1).
    "q160_sql_merge_identity" ->
      """WITH b0 AS (
        | SELECT CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS id,
        |        n_name, n_regionkey
        | FROM nation WHERE n_regionkey IN (0, 1)),
        |res AS (
        | SELECT CAST(row_number() OVER (ORDER BY n_name) + 10 AS BIGINT)
        |          AS id, n_name, n_regionkey
        | FROM nation)
        |SELECT id, n_name, CAST(n_regionkey + 100 AS BIGINT) AS n_regionkey,
        |       CAST(36 AS BIGINT) AS next_v
        |FROM b0
        |UNION ALL
        |SELECT r.id, r.n_name, CAST(r.n_regionkey AS BIGINT),
        |       CAST(36 AS BIGINT)
        |FROM res r WHERE r.n_name NOT IN (SELECT n_name FROM b0)""".stripMargin,

    // q161: the default-value regimes replay relationally — omission
    // rows carry the declared constants, explicit rows their own values,
    // pre-ADD rows the frozen existence default (7), the post-ADD batch
    // its explicit score over current defaults.
    "q161_sql_column_defaults" ->
      """SELECT n_name, CAST(0 AS INT) AS visits, true AS is_active,
        |       DATE '2020-01-01' AS valid_from, CAST(7 AS INT) AS score
        |FROM nation WHERE n_regionkey <= 1
        |UNION ALL
        |SELECT n_name, CAST(n_nationkey AS INT), false,
        |       DATE '2021-06-15', CAST(7 AS INT)
        |FROM nation WHERE n_regionkey = 2
        |UNION ALL
        |SELECT n_name, CAST(0 AS INT), true, DATE '2020-01-01',
        |       CAST(100 AS INT)
        |FROM nation WHERE n_regionkey = 3""".stripMargin,

    // q162: the convert + delete + time travel replays relationally —
    // head holds the odd keys, v1 the full adopted set.
    "q162_sql_convert" ->
      """SELECT n_nationkey, n_name, CAST(n_regionkey AS BIGINT)
        |         AS n_regionkey, 'head' AS snap
        |FROM nation WHERE n_nationkey % 2 = 1
        |UNION ALL
        |SELECT n_nationkey, n_name, CAST(n_regionkey AS BIGINT), 'v1'
        |FROM nation""".stripMargin,

    // q165: the generated day column replays as a plain date cast over
    // the same events slice — n/users/consistent pin every value.
    "q165_sql_generated" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |       count(DISTINCT user_id) AS users,
        |       count(*) AS consistent
        |FROM events WHERE event_id % 20 = 0
        |GROUP BY 1""".stripMargin,

    // q166: the co-bucketed join+rollup replays relationally, with the
    // measured shuffle count pinned at ZERO.
    "q166_sql_spj" ->
      """SELECT c.c_custkey, max(c.c_name) AS c_name,
        |       count(*) AS n_orders, sum(o.o_orderkey) AS sum_key,
        |       CAST(0 AS INT) AS shuffles
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey""".stripMargin,

    // q164: the bucket-pruned lookup returns exactly the customer's
    // orders, and the plan evidence literals pin 1 file scanned of 8.
    "q164_sql_bucketed" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(8 AS INT) AS total_files, CAST(1 AS INT) AS files_scanned
        |FROM orders WHERE o_custkey = 37""".stripMargin,

    // q163: the published head = nation minus region 4 plus the +100
    // backfill rows; 'pre' = the untouched pre-branch snapshot.
    "q163_sql_branch_wap" ->
      """SELECT n_nationkey, n_name, n_regionkey, 'head' AS snap
        |FROM nation WHERE n_regionkey <> 4
        |UNION ALL
        |SELECT n_nationkey + 100, n_name || '_BF', n_regionkey, 'head'
        |FROM nation WHERE n_regionkey = 0
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'pre' FROM nation""".stripMargin,

    // q155: the widening sequence replays relationally — even keys as-is
    // (the values an INT held exactly), odd keys shifted beyond int32
    // range; 0 and 'INT' are the metadata-only / time-travel literals
    // the Spark side measures. The key_sum only matches if the engine
    // reads the old int32 files as BIGINT exactly.
    "q155_sql_type_widening" ->
      """WITH t AS (
        | SELECT o_orderkey AS k, o_orderstatus, o_totalprice FROM orders
        | WHERE o_orderkey % 2 = 0
        | UNION ALL
        | SELECT o_orderkey + 8000000000, o_orderstatus, o_totalprice
        | FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(k) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | 0 AS files_moved, 'INT' AS v1_type
        |FROM t GROUP BY o_orderstatus""".stripMargin,

    // q146: the SQL DML sequence replayed relationally — DELETE is
    // WHERE NOT, UPDATE is CASE; the decimal-exact sum is the house
    // cross-engine pattern.
    "q146_sql_dml" ->
      """WITH t AS (
        | SELECT o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        | FROM orders WHERE o_orderkey % 10 <> 3)
        |SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM t GROUP BY o_orderstatus""".stripMargin,

    // q147: the tri-clause MERGE as set algebra — matched tombstones
    // deleted, matched survivors' and inserted rows' price normalized
    // (×3 in both clauses; diverging UPDATE/INSERT values are also
    // supported via the __graft_upd side channel — spec-covered),
    // target-only rows untouched.
    "q147_sql_merge" ->
      """WITH tgt AS (
        | SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS price
        | FROM orders WHERE o_orderkey % 3 = 0),
        |fin AS (
        | SELECT k, st,
        |  CASE WHEN k % 2 = 0 THEN price * 3 ELSE price END AS price
        | FROM tgt WHERE NOT (k % 2 = 0 AND k % 5 = 0)
        | UNION ALL
        | SELECT o_orderkey, o_orderstatus, o_totalprice * 3 FROM orders
        | WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0
        |   AND o_orderkey % 5 <> 0)
        |SELECT st, count(*) AS n,
        | CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM fin GROUP BY st""".stripMargin,

    // q124: q26's gap-session algebra with session_window's exact
    // semantics — new session at gap >= 30 min (the window is [start,
    // last+gap)), end = last event + gap.
    "q124_session_window" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30*60*1000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        | SELECT user_id, ts,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        | FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        | MAX(ts) + INTERVAL 30 minutes AS session_end,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY user_id, session_no""".stripMargin,

    "q47_stratified_sample" ->
      """SELECT lang, source, doc_id, strat_rank FROM (
        | SELECT lang, source, doc_id,
        |  CAST(row_number() OVER (PARTITION BY lang, source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS strat_rank
        | FROM documents) r
        |WHERE strat_rank <= 20""".stripMargin,

    "q45_heavy_hitters" ->
      """SELECT CAST(user_id AS VARCHAR) AS item,
        | CAST(COUNT(*) AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS est_err
        |FROM events GROUP BY user_id
        |ORDER BY cnt DESC, item LIMIT 10""".stripMargin,

    "q44_range_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id AS user_id,
        | CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_2h
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 2 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id""".stripMargin,

    "q29_multimodal_features" ->
      """SELECT doc_id AS asset_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |                 ELSE 'video' END AS modality,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | CAST(NULL AS INTEGER) AS width,
        | CAST(NULL AS INTEGER) AS height,
        | CAST(NULL AS INTEGER) AS channels,
        | CAST(NULL AS INTEGER) AS sample_rate_hz,
        | CAST(NULL AS BIGINT) AS duration_ms,
        | CAST(16 AS INTEGER) AS feature_dim,
        | TRUE AS feature_nonzero
        |FROM documents""".stripMargin,

    "q100_robust_outliers" ->
      """WITH med AS (
        | SELECT event_type, quantile_cont(value, 0.5) AS med
        | FROM events GROUP BY event_type),
        |mad AS (
        | SELECT e.event_type, quantile_cont(abs(e.value - med.med), 0.5) AS mad,
        |  any_value(med.med) AS med
        | FROM events e JOIN med USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        | round(any_value(mad.med), 6) AS med_r6,
        | round(any_value(mad.mad), 6) AS mad_r6,
        | CAST(count(CASE WHEN abs(e.value - mad.med) > mad.mad * 3.0
        |   THEN 1 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN mad USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    "q97_quantile_fold" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50_exact_r6,
        | TRUE AS p50_within_band
        |FROM events GROUP BY event_type""".stripMargin,

    "q32_sketches" ->
      """SELECT event_type,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        | TRUE AS users_within_5pct,
        | round(quantile_cont(value, 0.5), 6) AS p50_r6,
        | TRUE AS p50_within_band
        |FROM events GROUP BY event_type""".stripMargin,

    // q83: the q32 oracle treatment for the folded estimate — exact
    // distinct value-checked, the estimate's 5% band as a literal-TRUE
    // boolean the Spark side must reproduce.
    "q83_distinct_fold" ->
      """SELECT event_type,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        | TRUE AS users_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,

    "q30_asof_join" ->
      """WITH oa AS (
        | SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        | FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.ts,
        | oa.o_orderdate AS asof_o_orderdate,
        | oa.o_orderkey AS asof_o_orderkey,
        | oa.day_total AS asof_day_total
        |FROM events e
        |ASOF LEFT JOIN oa
        |  ON e.user_id = oa.o_custkey AND e.ts >= oa.o_orderdate""".stripMargin,

    "q17_simhash" -> simhashOracleSql,
    "q18_lsh_ann" -> lshAnnOracleSql,
    "q28_ivf_ann" -> ivfAnnOracleSql,
    "q67_pq_ann" -> pqAnnOracleSql,
    "q72_pq_refined" -> pqRefinedOracleSql,
    "q73_ivfpq_refined" -> ivfPqRefinedOracleSql,
    "q84_kmeans_clusters" -> kmeansOracleSql,
    "q85_cluster_balanced_sample" -> kmeansSampleOracleSql,
    "q87_zorder_layout" -> zorderOracleSql,
    "q88_embedding_outliers" -> kmeansOutlierOracleSql,
    "q90_kmeans_incremental" -> kmeansIncrementalOracleSql,

    // q74: positional 8-gram twin of the q58/q69 tokenization (1-based
    // DuckDB starts vs 0-based Spark starts — countDistinct over positions
    // is offset-invariant); hot set grouped on raw gram text where Spark
    // groups its xxhash64 (the q09/q69 collision-only divergence).
    "q74_dup_spans" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents),
        |gpos AS (
        | SELECT doc_id, w, unnest(CASE WHEN len(w) >= 8 THEN
        |    range(1, CAST(len(w) AS BIGINT) - 6) ELSE [] END) AS s
        | FROM t),
        |g AS (
        | SELECT doc_id, s, array_to_string(w[s : s + 7], ' ') AS gram
        | FROM gpos),
        |hot AS (
        | SELECT gram FROM g GROUP BY gram
        | HAVING count(DISTINCT doc_id) >= 2),
        |hs AS (SELECT g.doc_id, g.s FROM g JOIN hot USING (gram)),
        |spans AS (SELECT doc_id, count(*) AS dup_spans FROM hs GROUP BY doc_id),
        |cov AS (
        | SELECT doc_id, count(DISTINCT p) AS dup_tokens
        | FROM (SELECT doc_id, unnest(range(s, s + 8)) AS p FROM hs) z
        | GROUP BY doc_id),
        |nt AS (
        | SELECT doc_id, CASE WHEN text IS NULL THEN 0
        |   ELSE CAST(len(w) AS BIGINT) END AS n_toks
        | FROM t)
        |SELECT nt.doc_id, nt.n_toks,
        | CAST(coalesce(spans.dup_spans, 0) AS BIGINT) AS dup_spans,
        | CAST(coalesce(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        | round(CASE WHEN nt.n_toks > 0
        |   THEN CAST(coalesce(cov.dup_tokens, 0) AS DOUBLE) / nt.n_toks
        |   ELSE 0.0 END, 6) AS dup_ratio_r6
        |FROM nt
        |LEFT JOIN spans USING (doc_id)
        |LEFT JOIN cov USING (doc_id)""".stripMargin,

    // q75: q74's hot-span machinery + the ordered rebuild from uncovered
    // positions (string_agg ORDER BY p = Spark's array_sort of (p, tok)).
    "q75_remove_dup_spans" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents),
        |gpos AS (
        | SELECT doc_id, w, unnest(CASE WHEN len(w) >= 8 THEN
        |    range(1, CAST(len(w) AS BIGINT) - 6) ELSE [] END) AS s
        | FROM t),
        |g AS (
        | SELECT doc_id, s, array_to_string(w[s : s + 7], ' ') AS gram
        | FROM gpos),
        |hot AS (
        | SELECT gram FROM g GROUP BY gram
        | HAVING count(DISTINCT doc_id) >= 2),
        |hs AS (SELECT g.doc_id, g.s FROM g JOIN hot USING (gram)),
        |covered AS (
        | SELECT DISTINCT doc_id, unnest(range(s, s + 8)) AS p FROM hs),
        |tp AS (
        | SELECT doc_id, w, unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS p
        | FROM t WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, p, w[p] AS tok FROM tp),
        |kept AS (
        | SELECT k.doc_id, k.p, k.tok FROM toks k
        | LEFT JOIN covered c ON c.doc_id = k.doc_id AND c.p = k.p
        | WHERE c.p IS NULL),
        |rebuilt AS (
        | SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
        |  count(*) AS toks_kept
        | FROM kept GROUP BY doc_id),
        |nt AS (
        | SELECT doc_id, CASE WHEN text IS NULL THEN 0
        |   ELSE CAST(len(w) AS BIGINT) END AS n_toks
        | FROM t)
        |SELECT nt.doc_id, coalesce(rebuilt.clean_text, '') AS clean_text,
        | nt.n_toks,
        | CAST(nt.n_toks - coalesce(rebuilt.toks_kept, 0) AS BIGINT) AS toks_removed
        |FROM nt LEFT JOIN rebuilt USING (doc_id)""".stripMargin,

    // q76: the whole pipeline is +, *, / on integer-derived doubles (IEEE
    // correctly-rounded, unlike log) plus the decimal-exact mean — so the
    // cross-engine hash matches bit-for-bit.
    "q76_bigram_fluency" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents),
        |tp AS (
        | SELECT doc_id, w, unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS p
        | FROM t WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, p, w[p] AS tok FROM tp),
        |lagd AS (
        | SELECT doc_id, tok,
        |  lag(tok) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        | FROM toks),
        |big AS (SELECT doc_id, prev, tok FROM lagd WHERE prev IS NOT NULL),
        |cb AS (SELECT prev, tok, count(*) AS cb FROM big GROUP BY prev, tok),
        |cp AS (SELECT prev, count(*) AS cp FROM big GROUP BY prev),
        |v AS (SELECT count(DISTINCT tok) AS v FROM toks),
        |scored AS (
        | SELECT big.doc_id, (cb.cb + 0.5) / (cp.cp + 0.5 * v.v) AS pr
        | FROM big JOIN cb USING (prev, tok) JOIN cp USING (prev) CROSS JOIN v),
        |agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(CAST(pr AS DECIMAL(18,12))) AS DOUBLE) / count(*), 9)
        |    AS mean_prob_r9
        | FROM scored GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        | agg.mean_prob_r9
        |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,
    // q82: q76's machinery with the two corpus roles split — counts and
    // vocabulary from doc_id < 250, scoring over doc_id >= 250 with LEFT
    // joins + coalesce(0) for out-of-reference bigrams.
    "q82_fluency_cross" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents),
        |tp AS (
        | SELECT doc_id, w, unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS p
        | FROM t WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, p, w[p] AS tok FROM tp),
        |lagd AS (
        | SELECT doc_id, tok,
        |  lag(tok) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        | FROM toks),
        |big AS (SELECT doc_id, prev, tok FROM lagd WHERE prev IS NOT NULL),
        |refbig AS (SELECT * FROM big WHERE doc_id < 250),
        |tgtbig AS (SELECT * FROM big WHERE doc_id >= 250),
        |cb AS (SELECT prev, tok, count(*) AS cb FROM refbig GROUP BY prev, tok),
        |cp AS (SELECT prev, count(*) AS cp FROM refbig GROUP BY prev),
        |v AS (SELECT count(DISTINCT tok) AS v FROM toks WHERE doc_id < 250),
        |scored AS (
        | SELECT tgtbig.doc_id,
        |  (coalesce(cb.cb, 0) + 0.5) / (coalesce(cp.cp, 0) + 0.5 * v.v) AS pr
        | FROM tgtbig
        | LEFT JOIN cb USING (prev, tok)
        | LEFT JOIN cp USING (prev)
        | CROSS JOIN v),
        |agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(CAST(pr AS DECIMAL(18,12))) AS DOUBLE) / count(*), 9)
        |    AS mean_prob_r9
        | FROM scored GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        | agg.mean_prob_r9
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |WHERE d.doc_id >= 250""".stripMargin,

    // q91: q82's tokenize/lag CTEs extended one more lag; the stupid-
    // backoff CASE mirrors the Spark when-chain exactly (same nesting,
    // same 0.4 multiplier association), counts integer, divisions IEEE,
    // mean decimal-exact.
    "q91_trigram_fluency" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
        | FROM documents),
        |tp AS (
        | SELECT doc_id, w, unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS p
        | FROM t WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, p, w[p] AS tok FROM tp),
        |lagd AS (
        | SELECT doc_id, tok,
        |  lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY p) AS p1,
        |  lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY p) AS p2
        | FROM toks),
        |tri AS (SELECT doc_id, p2, p1, tok FROM lagd WHERE p2 IS NOT NULL),
        |reftri AS (SELECT * FROM tri WHERE doc_id < 250),
        |tgttri AS (SELECT * FROM tri WHERE doc_id >= 250),
        |refbig AS (SELECT p1, tok FROM lagd
        |           WHERE p1 IS NOT NULL AND doc_id < 250),
        |c3 AS (SELECT p2, p1, tok, count(*) AS c3 FROM reftri GROUP BY 1,2,3),
        |c3ctx AS (SELECT p2, p1, count(*) AS c3ctx FROM reftri GROUP BY 1,2),
        |c2 AS (SELECT p1, tok, count(*) AS c2 FROM refbig GROUP BY 1,2),
        |c2ctx AS (SELECT p1, count(*) AS c2ctx FROM refbig GROUP BY 1),
        |c1 AS (SELECT tok, count(*) AS c1 FROM toks WHERE doc_id < 250 GROUP BY 1),
        |nv AS (SELECT count(*) AS n_tok, count(DISTINCT tok) AS v
        |       FROM toks WHERE doc_id < 250),
        |scored AS (
        | SELECT g.doc_id,
        |  CASE WHEN c3.c3 IS NOT NULL THEN c3.c3 / c3ctx.c3ctx
        |  ELSE 0.4 * (CASE WHEN c2.c2 IS NOT NULL THEN c2.c2 / c2ctx.c2ctx
        |   ELSE 0.4 * (CASE WHEN c1.c1 IS NOT NULL THEN c1.c1 / nv.n_tok
        |    ELSE CAST(1.0 AS DOUBLE) / nv.v END) END) END AS s
        | FROM tgttri g
        | LEFT JOIN c3 USING (p2, p1, tok)
        | LEFT JOIN c3ctx USING (p2, p1)
        | LEFT JOIN c2 USING (p1, tok)
        | LEFT JOIN c2ctx USING (p1)
        | LEFT JOIN c1 USING (tok)
        | CROSS JOIN nv),
        |agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  round(CAST(sum(CAST(s AS DECIMAL(18,12))) AS DOUBLE) / count(*), 9)
        |    AS mean_score_r9
        | FROM scored GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.n_trigrams, 0) AS BIGINT) AS n_trigrams,
        | agg.mean_score_r9
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |WHERE d.doc_id >= 250""".stripMargin,

    "q68_ivfpq_ann" -> ivfPqAnnOracleSql,
    "q70_ann_recall" -> annRecallOracleSql,

    // q69: the segment-dedup pipeline replayed — q49's split/range/slice
    // technique for segmentation, HAVING count(DISTINCT doc_id) for the
    // boilerplate cut (DuckDB groups on segment text where Spark shuffles
    // its xxhash64 — identical up to a 64-bit collision), ordered
    // string_agg for the rebuild, LEFT JOIN + coalesce('') so fully-
    // boilerplate docs survive as empty rows.
    "q69_segment_dedup" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
        |w AS (SELECT doc_id, toks, unnest(range((n_tok + 7) // 8)) AS seg_no FROM n),
        |s AS (SELECT doc_id, CAST(seg_no AS BIGINT) AS seg_no,
        |  array_to_string(toks[seg_no*8+1 : seg_no*8+8], ' ') AS seg FROM w),
        |hot AS (SELECT seg FROM s GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (SELECT * FROM s WHERE seg NOT IN (SELECT seg FROM hot)),
        |reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_no) AS clean_text,
        |        CAST(count(*) AS BIGINT) AS segs_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs FROM s GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(reb.clean_text, '') AS clean_text,
        | CAST(coalesce(tot.n_segs, 0) AS BIGINT) AS n_segs,
        | CAST(coalesce(tot.n_segs, 0) - coalesce(reb.segs_kept, 0) AS BIGINT)
        |   AS segs_removed
        |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)""".stripMargin,

    // q77: q69's segmentation replayed in two stages — the index CTE is
    // stage A's per-segment distinct-doc counts (doc_id < 250), the batch
    // cut compares batch + index counts against the threshold, rebuild
    // anchored on the batch corpus rows. DuckDB groups on segment text
    // where Spark folds the xxhash64 index (collision-only divergence).
    "q77_segment_dedup_incremental" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
        |w AS (SELECT doc_id, toks, unnest(range((n_tok + 7) // 8)) AS seg_no FROM n),
        |s AS (SELECT doc_id, CAST(seg_no AS BIGINT) AS seg_no,
        |  array_to_string(toks[seg_no*8+1 : seg_no*8+8], ' ') AS seg FROM w),
        |idx AS (SELECT seg, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |        FROM s WHERE doc_id < 250 GROUP BY seg),
        |b AS (SELECT * FROM s WHERE doc_id >= 250),
        |bc AS (SELECT seg, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM b GROUP BY seg),
        |hot AS (SELECT bc.seg FROM bc LEFT JOIN idx USING (seg)
        |        WHERE bc.n_docs + coalesce(idx.n_docs, 0) >= 2),
        |kept AS (SELECT * FROM b WHERE seg NOT IN (SELECT seg FROM hot)),
        |reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_no) AS clean_text,
        |        CAST(count(*) AS BIGINT) AS segs_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs FROM b GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(reb.clean_text, '') AS clean_text,
        | CAST(coalesce(tot.n_segs, 0) AS BIGINT) AS n_segs,
        | CAST(coalesce(tot.n_segs, 0) - coalesce(reb.segs_kept, 0) AS BIGINT)
        |   AS segs_removed
        |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)
        |WHERE d.doc_id >= 250""".stripMargin,

    // q80: q69's segmentation carrying source, distinct (source, seg)
    // presence, text-keyed pair join where Spark pair-expands per-segment
    // source sets; Jaccard is the same IEEE-exact division as q21.
    "q80_source_overlap" ->
      """WITH t AS (
        | SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, source, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM t),
        |w AS (SELECT doc_id, source, toks, unnest(range((n_tok + 7) // 8)) AS seg_no FROM n),
        |s AS (SELECT doc_id, source,
        |  array_to_string(toks[seg_no*8+1 : seg_no*8+8], ' ') AS seg FROM w),
        |pres AS (SELECT DISTINCT source AS src, seg FROM s),
        |per AS (SELECT src, CAST(count(*) AS BIGINT) AS n_segs FROM pres GROUP BY src),
        |pairs AS (
        | SELECT a.src AS src_a, b.src AS src_b, CAST(count(*) AS BIGINT) AS shared_segments
        | FROM pres a JOIN pres b ON a.seg = b.seg AND a.src < b.src
        | GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.shared_segments,
        | pa.n_segs AS n_segs_a, pb.n_segs AS n_segs_b,
        | CAST(p.shared_segments AS DOUBLE) /
        |   (pa.n_segs + pb.n_segs - p.shared_segments) AS jaccard
        |FROM pairs p
        |JOIN per pa ON pa.src = p.src_a
        |JOIN per pb ON pb.src = p.src_b""".stripMargin,

    // q79: per-source copy counts from the literal rate map (whole epochs
    // + md5-bucket fractional epoch), expanded by unnest(range(n)).
    "q79_epoch_mixture" ->
      """WITH b AS (
        | SELECT doc_id, source,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) AS bk
        | FROM documents),
        |n AS (SELECT doc_id, source,
        |  CASE WHEN source = 'src0' THEN 2 + (CASE WHEN bk < 32768 THEN 1 ELSE 0 END)
        |       WHEN source = 'src1' THEN 1
        |       WHEN source = 'src2' THEN (CASE WHEN bk < 16384 THEN 1 ELSE 0 END)
        |       ELSE 0 END AS ne
        | FROM b),
        |u AS (SELECT doc_id, source, unnest(range(ne)) AS ep FROM n)
        |SELECT doc_id, source, CAST(ep AS BIGINT) AS epoch FROM u""".stripMargin,

    // q71: thresholds derived from lang counts — floor(sqrt(n_min/n)·65536)
    // is engine-exact (double division, IEEE sqrt, power-of-two scale);
    // acceptance is q46's md5-bucket rule.
    "q71_temperature_sample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS n_min FROM c),
        |t AS (SELECT lang, CAST(floor(
        |   sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE)) * 65536.0)
        |  AS INTEGER) AS mix_thr FROM c, m)
        |SELECT d.doc_id, d.lang,
        | CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
        |   AS mix_bucket,
        | t.mix_thr
        |FROM documents d JOIN t ON d.lang IS NOT DISTINCT FROM t.lang
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
        |      < t.mix_thr""".stripMargin,

    "q58_repetition" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        | FROM documents),
        |g AS (
        | SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN
        |   list_transform(range(1, CAST(len(w) AS BIGINT)),
        |     i -> array_to_string(w[i : i + 1], ' '))
        |  ELSE [] END) AS gram
        | FROM t),
        |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        | CAST(COUNT(*) AS BIGINT) AS n_distinct,
        | round(1 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
        |   AS dup_frac_r6,
        | round(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
        |   AS top_frac_r6
        |FROM c GROUP BY doc_id""".stripMargin,

    "q40_tfidf" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |          FROM toks GROUP BY term),
        |r AS (
        | SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |  CAST(row_number() OVER (PARTITION BY tf.doc_id
        |    ORDER BY tf.tf DESC, dfreq.df ASC, tf.term) AS BIGINT) AS rnk
        | FROM tf JOIN dfreq USING (term))
        |SELECT doc_id, term, tf, df, rnk,
        | round(tf * ln((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df), 6)
        |   AS tfidf_r6
        |FROM r WHERE rnk <= 5""".stripMargin,

    // q92: one UNION ALL branch per profiled column; count(DISTINCT)
    // matches count_distinct's null exclusion, min/max stringify under
    // binary collation on both engines, the HLL band is the q32 TRUE
    // literal.
    "q92_column_profile" -> {
      def branch(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           | CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           | round((count(*) - count($c)) / count(*), 6) AS null_frac_r6,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | TRUE AS distinct_within_5pct,
           | CAST(min($c) AS VARCHAR) AS min_str,
           | CAST(max($c) AS VARCHAR) AS max_str
           |FROM documents""".stripMargin
      Seq("doc_id", "text", "lang", "source", "n_chars")
        .map(branch).mkString("\nUNION ALL\n")
    },

    "q98_drift" ->
      """WITH an AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
        |            WHERE doc_id < 250 AND n_chars IS NOT NULL),
        |bn AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
        |       WHERE doc_id >= 250 AND n_chars IS NOT NULL),
        |mm AS (SELECT min(x) AS lo, max(x) AS hi
        |       FROM (SELECT x FROM an UNION ALL SELECT x FROM bn)),
        |ga AS (SELECT CAST(least(7, floor((x - mm.lo) * 8.0 / (mm.hi - mm.lo))) AS BIGINT) AS bin,
        |        count(*) AS n_a FROM an, mm GROUP BY 1),
        |gb AS (SELECT CAST(least(7, floor((x - mm.lo) * 8.0 / (mm.hi - mm.lo))) AS BIGINT) AS bin,
        |        count(*) AS n_b FROM bn, mm GROUP BY 1),
        |ta AS (SELECT count(*) AS c FROM an),
        |tb AS (SELECT count(*) AS c FROM bn)
        |SELECT bin, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        | round(coalesce(n_a, 0) / ta.c, 6) AS frac_a_r6,
        | round(coalesce(n_b, 0) / tb.c, 6) AS frac_b_r6
        |FROM ga FULL OUTER JOIN gb USING (bin), ta, tb""".stripMargin,

    "q99_theta_overlap" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS key_a, b.event_type AS key_b,
        | CAST(count(*) AS BIGINT) AS exact_shared,
        | TRUE AS shared_within_band
        |FROM du a JOIN du b
        | ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin,

    "q93_histogram" ->
      """WITH mm AS (SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
        |                   CAST(max(o_totalprice) AS DOUBLE) AS hi
        |            FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT CAST(o_totalprice AS DOUBLE) AS x,
        |  CAST(least(9, floor((CAST(o_totalprice AS DOUBLE) - mm.lo) * 10.0
        |    / (mm.hi - mm.lo))) AS BIGINT) AS bin
        | FROM orders, mm WHERE o_totalprice IS NOT NULL)
        |SELECT bin, min(x) AS lo, max(x) AS hi, CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY bin""".stripMargin,

    "q89_skew_profile" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key_value,
        |            count(*) AS n_rows FROM events GROUP BY 1),
        |t AS (SELECT count(*) AS tot FROM events)
        |SELECT key_value, n_rows, round(n_rows / tot, 6) AS share_r6,
        | CAST(ceil(n_rows / 500.0) AS BIGINT) AS suggested_salt
        |FROM c, t ORDER BY n_rows DESC, key_value LIMIT 10""".stripMargin,

    "q41_salted_agg" ->
      """SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id""".stripMargin,

    "q43_quantize_int8" ->
      """WITH el AS (
        | SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
        |mx AS (SELECT vec_id, max(abs(x)) AS mx FROM el GROUP BY vec_id),
        |e AS (
        | SELECT el.vec_id, mx,
        |  abs(x - floor(x * 127 / mx + 0.5) * mx / 127) AS err
        | FROM el JOIN mx USING (vec_id))
        |SELECT vec_id, round(mx / 127, 6) AS scale_r6,
        | round(max(err), 6) AS max_abs_err_r6,
        | round(CAST(SUM(CAST(err AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6)
        |   AS mean_abs_err_r6
        |FROM e GROUP BY vec_id, mx""".stripMargin,

    "q42_salted_join" ->
      """SELECT o.o_orderstatus, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus""".stripMargin,

    // q157: the hot path of the salted join IS the plain join — the
    // salting machinery must be invisible in the result set.
    "q157_salted_join_hot" ->
      """WITH dim AS (
        | SELECT DISTINCT event_type AS k, upper(event_type) AS tag
        | FROM events)
        |SELECT e.event_type AS k, d.tag, count(*) AS n,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events e JOIN dim d ON e.event_type = d.k
        |GROUP BY 1, 2""".stripMargin,

    "q16_minhash_neardup" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS t
        | FROM documents),
        |mins AS (
        | SELECT doc_id, r.i,
        |  min(substr(md5(CAST(r.i AS VARCHAR) || '|' || t), 1, 16)) AS h
        | FROM toks CROSS JOIN range(32) r(i) GROUP BY doc_id, r.i),
        |sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mins GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, b.b AS band_id,
        |  md5(array_to_string(sig[b.b*8+1 : b.b*8+8], ',')) AS band_hash
        | FROM sigs CROSS JOIN range(4) b(b)),
        |pairs AS (
        | SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        | FROM bands x JOIN bands y ON x.band_id = y.band_id
        |  AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
        |est AS (
        | SELECT doc_a, doc_b, est_jaccard FROM (
        |  SELECT p.doc_a, p.doc_b,
        |   CAST(len(list_filter(generate_series(1, 32),
        |     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)/32 AS est_jaccard
        |  FROM pairs p
        |  JOIN sigs sa ON sa.doc_id = p.doc_a
        |  JOIN sigs sb ON sb.doc_id = p.doc_b) z
        | WHERE est_jaccard >= 0.6),
        |keep AS (
        | SELECT doc_b AS doc_id, min(doc_a) AS cand, max(est_jaccard) AS max_est_jaccard
        | FROM est GROUP BY doc_b)
        |SELECT d.doc_id, coalesce(k.cand, d.doc_id) AS keeper_id, k.max_est_jaccard
        |FROM documents d LEFT JOIN keep k ON d.doc_id = k.doc_id""".stripMargin,

    "q34_ref_scenarios" ->
      s"""SELECT
        | s.id AS scenario_id, s.scenario_display_name,
        | s.status AS scenario_status, s.is_starter, s.currency, s.currency_code,
        | s.scenario_start_year, s.scenario_end_year,
        | s.scenario_region_name, s.scenario_country_name,
        | s.created_at, s.created_by, s.submitted_at, s.submitted_by,
        | s.locked_at, s.locked_by, s.updated_at, s.updated_by,
        | s.withdraw_at, s.withdraw_by, s.delete_at,
        | s.model_id, m.model_display_name, m.model_type, m.model_publish_level,
        | m.therapeutic_area_name, m.model_disease_area_name AS disease_area_name,
        | m.has_inherent_event AS loe_enabled,
        | m.model_region_display_name AS model_region_name,
        | m.model_country_display_name AS model_country_name,
        | fi.forecast_cycle_display_name AS forecast_cycle_name,
        | fi.forecast_cycle_start_dt AS forecast_cycle_start,
        | fi.forecast_cycle_end_dt AS forecast_cycle_end,
        | fi.horizon_start_limit, fi.horizon_end_limit, fi.starter_created,
        | greatest(s.created_at, coalesce(s.updated_at, s.created_at),
        |   coalesce(s.submitted_at, s.created_at), coalesce(s.locked_at, s.created_at),
        |   coalesce(s.withdraw_at, s.created_at)) AS wm_ts
        |FROM ${rp("fc_scenario")} s
        |JOIN ${rp("fc_model")} m ON s.model_id = m.id
        |JOIN ${rp("fc_forecast_init")} fi ON s.forecast_init_id = fi.id
        |WHERE s.created_at >= $refSinceSql OR s.updated_at >= $refSinceSql
        |   OR s.submitted_at >= $refSinceSql OR s.locked_at >= $refSinceSql
        |   OR s.withdraw_at >= $refSinceSql""".stripMargin,

    "q35_ref_node_inputs" ->
      s"""WITH j AS (
        | SELECT nd.id AS source_id, nd.scenario_id, nd.model_node_id,
        |  mn.node_display_name, mn.node_type,
        |  mt.tab_display_name AS tab_name, mt.tab_level,
        |  mg.group_display_name AS group_name, mg.group_type,
        |  mn.node_seq, mn.flow,
        |  nd.created_at AS version_started_at, nd.end_at AS version_ended_at,
        |  nd.created_by AS edited_by, nd.input_hash, nd.input_validated,
        |  nd.input_validation_message AS validation_message,
        |  nd.source AS data_source, nd.input_data,
        |  CASE WHEN json_valid(nd.input_data) THEN nd.input_data END AS js
        | FROM ${rp("fc_scenario_node_data")} nd
        | JOIN ${rp("fc_model_node")} mn ON nd.model_node_id = mn.id
        | JOIN ${rp("fc_model_node_groups")} mg ON mn.model_node_group_id = mg.id
        | JOIN ${rp("fc_model_node_tab")} mt ON mg.model_node_tab_id = mt.id
        | WHERE nd.created_at >= $refSinceSql
        |    OR (nd.end_at IS NOT NULL AND nd.end_at >= $refSinceSql))
        |SELECT source_id, scenario_id, model_node_id, node_display_name, node_type,
        | tab_name, tab_level, group_name, group_type, node_seq, flow,
        | version_started_at, version_ended_at,
        | (version_ended_at IS NULL) AS is_current_version,
        | edited_by, input_hash, input_validated, validation_message, data_source,
        | TRY_CAST(json_extract_string(js, '$$.value') AS DOUBLE) AS inp_value,
        | json_extract_string(js, '$$.unit') AS inp_unit,
        | TRY_CAST(json_extract_string(js, '$$.start_year') AS INTEGER) AS inp_start_year,
        | TRY_CAST(json_extract_string(js, '$$.end_year') AS INTEGER) AS inp_end_year,
        | json_extract_string(js, '$$.input_type') AS inp_input_type,
        | json_extract_string(js, '$$.timeframe') AS inp_timeframe,
        | json_extract_string(js, '$$.dosing_type') AS inp_dosing_type,
        | CASE WHEN json_extract_string(js, '$$.actuals_flag') IS NULL THEN NULL
        |      WHEN lower(json_extract_string(js, '$$.actuals_flag')) IN ('true','1','yes') THEN TRUE
        |      ELSE FALSE END AS inp_actuals_flag,
        | json_extract_string(js, '$$.curve_type') AS inp_curve_type,
        | json_extract_string(js, '$$.selected_output') AS inp_selected_output,
        | CASE WHEN json_extract_string(js, '$$.pfs_flag') IS NULL THEN NULL
        |      WHEN lower(json_extract_string(js, '$$.pfs_flag')) IN ('true','1','yes') THEN TRUE
        |      ELSE FALSE END AS inp_pfs_flag,
        | CASE WHEN json_extract_string(js, '$$.ppc_flag') IS NULL THEN NULL
        |      WHEN lower(json_extract_string(js, '$$.ppc_flag')) IN ('true','1','yes') THEN TRUE
        |      ELSE FALSE END AS inp_ppc_flag,
        | input_data AS input_data_full_text,
        | greatest(version_started_at,
        |   coalesce(version_ended_at, version_started_at)) AS wm_ts
        |FROM j""".stripMargin,

    "q36_ref_run_summary" ->
      s"""WITH g AS (
        | SELECT sr.id AS run_id, sr.scenario_id, sr.run_status, sr.run_at,
        |  sr.run_by, sr.run_complete_at, sr.fail_reason,
        |  CAST(COUNT(DISTINCT rb.id) AS INTEGER) AS branch_count,
        |  CAST(COUNT(nc.id) AS INTEGER) AS total_nodes_processed,
        |  CAST(COALESCE(SUM(CASE WHEN nc.status = 'success' THEN 1 ELSE 0 END), 0) AS INTEGER) AS nodes_success,
        |  CAST(COALESCE(SUM(CASE WHEN nc.status = 'failed' THEN 1 ELSE 0 END), 0) AS INTEGER) AS nodes_failed,
        |  CAST(COALESCE(SUM(CASE WHEN nc.status = 'timeout' THEN 1 ELSE 0 END), 0) AS INTEGER) AS nodes_timeout
        | FROM ${rp("fc_scenario_run")} sr
        | LEFT JOIN ${rp("fc_scenario_run_branch")} rb ON rb.scenario_run_id = sr.id
        | LEFT JOIN ${rp("fc_scenario_node_calc")} nc ON nc.scenario_run_branch_id = rb.id
        | WHERE sr.run_at >= $refSinceSql
        |    OR (sr.run_complete_at IS NOT NULL AND sr.run_complete_at >= $refSinceSql)
        | GROUP BY sr.id, sr.scenario_id, sr.run_status, sr.run_at, sr.run_by,
        |  sr.run_complete_at, sr.fail_reason)
        |SELECT run_id, scenario_id, run_status, run_at, run_by, run_complete_at,
        | round(((epoch_us(run_complete_at)//1000000)
        |   - (epoch_us(run_at)//1000000))/60.0, 2) AS run_duration_minutes,
        | fail_reason, branch_count, total_nodes_processed,
        | nodes_success, nodes_failed, nodes_timeout,
        | 0 AS node_edits_since_prev_run, 0 AS event_edits_since_prev_run,
        | greatest(run_at, coalesce(run_complete_at, run_at)) AS wm_ts
        |FROM g""".stripMargin,

    // NOTE round(…,3) here mirrors the reference's ROUND(EXTRACT(EPOCH…),3);
    // Spark and DuckDB round doubles differently ONLY at exact .5ms ties,
    // which the ms-granular fixture timestamps cannot produce. Sub-ms
    // sources would switch this to the truncating µs-div pattern (q19).
    "q37_ref_node_calc" ->
      s"""SELECT nc.id AS source_id, sr.id AS run_id, sr.scenario_id,
        | rb.id AS branch_id, rb.event_tag, nc.model_node_id,
        | mn.node_display_name, mn.node_type,
        | nc.status AS calc_status, nc.fail_reason,
        | nc.processing_start_at, nc.processing_end_at,
        | round(epoch_us(nc.processing_end_at)/1000000.0
        |   - epoch_us(nc.processing_start_at)/1000000.0, 3) AS processing_duration_s,
        | nc.output_data AS output_data_text,
        | nc.created_at AS wm_ts
        |FROM ${rp("fc_scenario_node_calc")} nc
        |JOIN ${rp("fc_scenario_run_branch")} rb ON nc.scenario_run_branch_id = rb.id
        |JOIN ${rp("fc_scenario_run")} sr ON rb.scenario_run_id = sr.id
        |JOIN ${rp("fc_model_node")} mn ON nc.model_node_id = mn.id
        |WHERE nc.created_at >= $refSinceSql""".stripMargin,

    "q38_ref_event_inputs" ->
      s"""WITH j AS (
        | SELECT ed.id AS source_id, st.scenario_id,
        |  et.display_name AS event_type_name, et.inherent AS is_inherent,
        |  pn.node_display_name AS population_node_name,
        |  ppn.node_display_name AS parent_product_name,
        |  ed.created_at AS version_started_at, ed.end_at AS version_ended_at,
        |  ed.created_by AS edited_by, ed.event_data_hash, ed.is_overridden,
        |  ed.event_shares_overridden AS override_data_text,
        |  ed.is_validated, ed.input_validation_message AS validation_message,
        |  ed.event_data,
        |  CASE WHEN json_valid(ed.event_data) THEN ed.event_data END AS js
        | FROM ${rp("fc_scenario_event_data")} ed
        | JOIN ${rp("fc_scenario_event_type")} st ON ed.scenario_event_type_id = st.id
        | JOIN ${rp("fc_event_type")} et ON st.event_type_id = et.id
        | LEFT JOIN ${rp("fc_model_node")} pn ON ed.population_node_id = pn.id
        | LEFT JOIN ${rp("fc_model_node")} ppn ON ed.parent_product_node_id = ppn.id
        | WHERE ed.created_at >= $refSinceSql
        |    OR (ed.end_at IS NOT NULL AND ed.end_at >= $refSinceSql))
        |SELECT source_id, scenario_id, event_type_name, is_inherent,
        | population_node_name, parent_product_name,
        | version_started_at, version_ended_at,
        | (version_ended_at IS NULL) AS is_current_version,
        | edited_by, event_data_hash, is_overridden, override_data_text,
        | is_validated, validation_message,
        | TRY_CAST(json_extract_string(js, '$$.year') AS INTEGER) AS evt_year,
        | TRY_CAST(json_extract_string(js, '$$.share_value') AS DOUBLE) AS evt_share_value,
        | json_extract_string(js, '$$.entry_quarter') AS evt_entry_quarter,
        | TRY_CAST(json_extract_string(js, '$$.erosion_rate') AS DOUBLE) AS evt_erosion_rate,
        | json_extract_string(js, '$$.launch_date') AS evt_launch_date,
        | TRY_CAST(json_extract_string(js, '$$.steady_state') AS DOUBLE) AS evt_steady_state,
        | TRY_CAST(json_extract_string(js, '$$.sob_value') AS DOUBLE) AS evt_sob_value,
        | event_data AS event_data_full_text,
        | greatest(version_started_at,
        |   coalesce(version_ended_at, version_started_at)) AS wm_ts
        |FROM j""".stripMargin,

    "q39_ref_timeline" ->
      s"""WITH u AS (
        | SELECT id AS scenario_id, created_at AS event_time,
        |   'SCENARIO_CREATED' AS event_type, 'LIFECYCLE' AS event_category,
        |   created_by AS actor, 'Scenario created' AS description,
        |   CAST(NULL AS VARCHAR) AS run_id, CAST(NULL AS VARCHAR) AS node_name,
        |   CAST(NULL AS VARCHAR) AS event_type_name,
        |   'SC_' || id AS source_key
        | FROM ${rp("fc_scenario")} WHERE created_at >= $refSinceSql
        | UNION ALL
        | SELECT id, submitted_at, 'SUBMITTED', 'LIFECYCLE', submitted_by,
        |   'Scenario submitted', NULL, NULL, NULL, 'SUBM_' || id
        | FROM ${rp("fc_scenario")} WHERE submitted_at >= $refSinceSql
        | UNION ALL
        | SELECT id, locked_at, 'LOCKED', 'LIFECYCLE', locked_by,
        |   'Scenario locked', NULL, NULL, NULL, 'LOCK_' || id
        | FROM ${rp("fc_scenario")} WHERE locked_at >= $refSinceSql
        | UNION ALL
        | SELECT id, withdraw_at, 'WITHDRAWN', 'LIFECYCLE', withdraw_by,
        |   'Scenario withdrawn', NULL, NULL, NULL, 'WITH_' || id
        | FROM ${rp("fc_scenario")} WHERE withdraw_at >= $refSinceSql
        | UNION ALL
        | SELECT nd.scenario_id, nd.created_at, 'NODE_EDITED', 'INPUT_CHANGE',
        |   nd.created_by,
        |   'Node edited: ' || mn.node_display_name
        |     || ' | Validated: ' || CAST(nd.input_validated AS VARCHAR),
        |   NULL, mn.node_display_name, NULL, 'NE_' || nd.id
        | FROM ${rp("fc_scenario_node_data")} nd
        | JOIN ${rp("fc_model_node")} mn ON nd.model_node_id = mn.id
        | WHERE nd.created_at >= $refSinceSql
        | UNION ALL
        | SELECT st.scenario_id, ed.created_at, 'EVENT_EDITED', 'EVENT_CHANGE',
        |   ed.created_by,
        |   'Event edited: ' || et.display_name
        |     || COALESCE(' | Segment: ' || pn.node_display_name, ''),
        |   NULL, NULL, et.display_name, 'EVT_' || ed.id
        | FROM ${rp("fc_scenario_event_data")} ed
        | JOIN ${rp("fc_scenario_event_type")} st ON ed.scenario_event_type_id = st.id
        | JOIN ${rp("fc_event_type")} et ON st.event_type_id = et.id
        | LEFT JOIN ${rp("fc_model_node")} pn ON ed.population_node_id = pn.id
        | WHERE ed.created_at >= $refSinceSql
        | UNION ALL
        | SELECT scenario_id, run_at, 'RUN_TRIGGERED', 'RUN', run_by,
        |   'Run started', id, NULL, NULL, 'RT_' || id
        | FROM ${rp("fc_scenario_run")} WHERE run_at >= $refSinceSql
        | UNION ALL
        | SELECT scenario_id, run_complete_at, 'RUN_COMPLETED', 'RUN', run_by,
        |   'Run completed: ' || run_status
        |     || COALESCE(' | Error: ' || fail_reason, ''),
        |   id, NULL, NULL, 'RC_' || id
        | FROM ${rp("fc_scenario_run")}
        | WHERE run_complete_at >= $refSinceSql AND run_complete_at IS NOT NULL)
        |SELECT *, CAST(event_time AS DATE) AS event_date, event_time AS wm_ts
        |FROM u WHERE event_time IS NOT NULL""".stripMargin
  )

  /** read_parquet over a materialized reference-fixture table (the oracle's
    * view of the exact bytes the Spark side read). */
  private def rp(table: String): String =
    s"read_parquet('${graft.demo.ReferenceFixtures.parquetDir}/$table/*.parquet')"

  private val refSinceSql = "TIMESTAMP '2024-03-03 00:00:00'"

  /** q145's oracle: bpeSegment's sequential greedy merge program replayed
    * with LITERAL `replace()` (no regex — RE2 has no lookaround anyway).
    * Encoding: a word's symbols joined by DOUBLE spaces with double-space
    * sentinels (`"  a  b  </w>  "`); one merge pass (L, R) is
    * `replace(s, ' L  R ', ' LR ')` — the pattern consumes one space of
    * each flanking separator and the replacement restores them, so
    * separators stay exactly double and SQL replace()'s non-overlapping
    * continue-after-replacement scan computes precisely the left-to-right
    * fold `Corpus.mergePass` does (verified: "a a a" -> ["aa","a"],
    * "a b a b" -> ["ab","ab"]). Symbols never contain spaces (tokens are
    * whitespace-split), so the separator is unambiguous. */
  /** q81's oracle: BPE TRAINING itself replayed in DuckDB — the 20
    * (pair-count → argmax → greedy merge) iterations unrolled as chained
    * MATERIALIZED CTEs over the double-space symbol encoding (q145's
    * replace() trick — each stage's merge pair is the stage's own 1-row
    * argmax, tie-broken (count DESC, left, right) exactly as bpeTrain),
    * then the segmentation join under the LEARNED merges. MATERIALIZED
    * matters: each stage reads its predecessor twice (merge + apply), so
    * inlined CTEs would expand 2^20-fold. This closes the last
    * `no_oracle` row — training, not just application, is hash-checked. */
  private def bpeTrainSegmentOracleSql: String = {
    val n = 20
    val initial = "'  ' || array_to_string(list_append(" +
      "regexp_extract_all(word, '.'), '</w>'), '  ') || '  '"
    val stages = (1 to n).map { k =>
      val j = k - 1
      s"""x$k AS (SELECT word, wcount, string_split(trim(s), '  ') AS subs FROM seg$j),
         |e$k AS (SELECT wcount, subs,
         |  unnest(range(CAST(len(subs) - 1 AS BIGINT))) AS pos FROM x$k),
         |c$k AS (SELECT subs[pos + 1] AS l, subs[pos + 2] AS r,
         |  CAST(sum(wcount) AS BIGINT) AS pc FROM e$k GROUP BY 1, 2),
         |m$k AS (SELECT l, r FROM c$k WHERE pc >= 2
         |  ORDER BY pc DESC, l, r LIMIT 1),
         |seg$k AS MATERIALIZED (SELECT w.word, w.wcount,
         |  replace(w.s, ' ' || m.l || '  ' || m.r || ' ',
         |          ' ' || m.l || m.r || ' ') AS s
         |  FROM seg$j w, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       | SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       | FROM documents WHERE doc_id < 100),
       |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wcount FROM w0 GROUP BY word),
       |seg0 AS MATERIALIZED (SELECT word, wcount, $initial AS s FROM wf),
       |$stages,
       |subs AS (SELECT word, string_split(trim(s), '  ') AS subs FROM seg$n),
       |sp0 AS (SELECT word, subs, unnest(range(CAST(len(subs) AS BIGINT))) AS sub_pos
       |        FROM subs),
       |sp AS (SELECT word, CAST(sub_pos AS BIGINT) AS sub_pos,
       |               subs[sub_pos + 1] AS subword FROM sp0),
       |dt AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |       FROM documents WHERE doc_id < 100),
       |dp AS (SELECT doc_id, unnest(range(CAST(len(t) AS BIGINT))) AS pos, t FROM dt),
       |dw AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, t[pos + 1] AS word FROM dp)
       |SELECT dw.doc_id, dw.pos, dw.word, sp.sub_pos, sp.subword
       |FROM dw JOIN sp USING (word)""".stripMargin
  }

  private def bpeApplyOracleSql: String = {
    def q(s: String) = s.replace("'", "''")
    val initial = "'  ' || array_to_string(list_append(" +
      "regexp_extract_all(word, '.'), '</w>'), '  ') || '  '"
    val folded = bpeFrozenMerges.foldLeft(initial) { case (acc, (l, r)) =>
      s"replace($acc, ' ${q(l)}  ${q(r)} ', ' ${q(l)}${q(r)} ')"
    }
    s"""WITH words AS (
       | SELECT DISTINCT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       | FROM documents WHERE doc_id < 100),
       |seg AS (SELECT word, $folded AS s FROM words),
       |subs AS (SELECT word, string_split(trim(s), '  ') AS subs FROM seg),
       |sp0 AS (SELECT word, subs, unnest(range(CAST(len(subs) AS BIGINT))) AS sub_pos
       |        FROM subs),
       |sp AS (SELECT word, CAST(sub_pos AS BIGINT) AS sub_pos,
       |               subs[sub_pos + 1] AS subword FROM sp0),
       |dt AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |       FROM documents WHERE doc_id < 100),
       |dp AS (SELECT doc_id, unnest(range(CAST(len(t) AS BIGINT))) AS pos, t FROM dt),
       |dw AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, t[pos + 1] AS word FROM dp)
       |SELECT dw.doc_id, dw.pos, dw.word, sp.sub_pos, sp.subword
       |FROM dw JOIN sp USING (word)""".stripMargin
  }

  /** q17's oracle: the portable simhash transliterated — md5-half token
    * bits, 32 packed-lane sums, 64-term fingerprint pack. Generated because
    * the lane/pack expressions are mechanical; bit-b literals are embedded
    * as computed values (DuckDB's checked `<<` cannot shift into the sign
    * bit, Scala's `1L << 63` can). */
  private def simhashOracleSql: String = {
    val sums = (0 until 32).map(b =>
      s" CAST(SUM(((hlo >> $b) & 1) + (((hhi >> $b) & 1) << 32)) AS BIGINT) AS p$b")
      .mkString(",\n")
    def bitCount(b: Int): String =
      if (b < 32) s"(p${b % 32} & 4294967295)" else s"(p${b % 32} >> 32)"
    val packTerms = (0 until 64).map(b =>
      s"  (CASE WHEN 2 * ${bitCount(b)} > n THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" +\n")
    s"""WITH toks AS (
       | SELECT doc_id,
       |  unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS t
       | FROM documents),
       |h AS (
       | SELECT doc_id,
       |  CAST(('0x' || substr(md5(t), 1, 8))::UBIGINT AS BIGINT) AS hlo,
       |  CAST(('0x' || substr(md5(t), 9, 8))::UBIGINT AS BIGINT) AS hhi
       | FROM toks),
       |g AS (
       | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
       |$sums
       | FROM h GROUP BY doc_id)
       |SELECT doc_id,
       |$packTerms AS simhash64
       |FROM g""".stripMargin
  }

  /** q18's oracle: the SAME hyperplane sign literals as lshBucket, so bucket
    * assignment, hamming-1 probing, cosine, and ranking reproduce exactly
    * (identical double arithmetic — the q13-proven pattern). */
  private def lshAnnOracleSql: String = {
    val planes = graft.ext.SimSearch.hyperplaneSigns(6, 64)
    def arr(signs: Seq[Double]): String =
      signs.map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    val bucketTerms = planes.zipWithIndex.map { case (sg, p) =>
      s"(CASE WHEN list_dot_product(v, ${arr(sg)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n   + ")
    val xors = Seq(1, 2, 4, 8, 16, 32).map(m =>
      s"  UNION ALL SELECT query_id, q_vec, xor(bucket0, $m) AS bucket FROM q")
      .mkString("\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |  $bucketTerms AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS q_vec, bucket AS bucket0
       |      FROM b WHERE vec_id < 5),
       |probes AS (
       | SELECT DISTINCT query_id, q_vec, bucket FROM (
       |  SELECT query_id, q_vec, bucket0 AS bucket FROM q
       |$xors) px),
       |sims AS (
       | SELECT query_id, c.vec_id AS neighbor_id,
       |  max(list_dot_product(q_vec, c.v)
       |    / (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(c.v, c.v)))) AS sim
       | FROM probes p JOIN b c ON p.bucket = c.bucket AND c.vec_id <> p.query_id
       | GROUP BY query_id, c.vec_id),
       |r AS (SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk, sim FROM sims)
       |SELECT query_id, neighbor_id, rnk, round(sim, 6) AS sim_r6
       |FROM r WHERE rnk <= 10""".stripMargin
  }

  /** q60's oracle: [[lshAnnOracleSql]]'s shared-literal technique applied
    * to the banded multi-table form — the SAME 36 hyperplane sign vectors
    * as `SimSearch.semanticDedupAssignmentsBucketed(tables=12, r=3)`, the
    * same band slicing (`bucket >> t*3 & 7`), the same candidate predicate
    * (any table agrees, id_a < id_b, distinct), the same cosine and keeper
    * aggregation as q59. Identical double arithmetic ⇒ identical keepers. */
  private def semanticDedupBucketedOracleSql: String = {
    val tables = 12; val ppt = 3
    val planes = graft.ext.SimSearch.hyperplaneSigns(tables * ppt, 64)
    def arr(signs: Seq[Double]): String =
      signs.map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    val bucketTerms = planes.zipWithIndex.map { case (sg, p) =>
      s"(CASE WHEN list_dot_product(v, ${arr(sg)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n   + ")
    val tableRows = (0 until tables).map(t => s"($t)").mkString(",")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |  $bucketTerms AS bucket FROM e),
       |probes AS (
       | SELECT vec_id, t.t AS t, (bucket >> (t.t * $ppt)) & ${(1L << ppt) - 1} AS tb
       | FROM b, (VALUES $tableRows) t(t)),
       |cand AS (
       | SELECT DISTINCT p1.vec_id AS id_a, p2.vec_id AS id_b
       | FROM probes p1 JOIN probes p2
       |   ON p1.t = p2.t AND p1.tb = p2.tb AND p1.vec_id < p2.vec_id),
       |pr AS (
       | SELECT c.id_a, c.id_b,
       |  list_dot_product(ba.v, bb.v)
       |    / (sqrt(list_dot_product(ba.v, ba.v)) * sqrt(list_dot_product(bb.v, bb.v))) AS sim
       | FROM cand c JOIN b ba ON ba.vec_id = c.id_a JOIN b bb ON bb.vec_id = c.id_b),
       |f AS (SELECT id_a, id_b, sim FROM pr WHERE sim >= 0.4),
       |k AS (SELECT id_b AS vec_id, MIN(id_a) AS cand,
       |  round(MAX(sim), 6) AS max_sim_r6 FROM f GROUP BY id_b)
       |SELECT e.vec_id, COALESCE(k.cand, e.vec_id) AS keeper_id, k.max_sim_r6
       |FROM e LEFT JOIN k USING (vec_id)""".stripMargin
  }

  /** q61's oracle: both stages of the incremental semantic dedup replayed
    * in DuckDB from the q60 literals. Stage A = the bucketed batch
    * algorithm over vec_id < 250; its keepers (vectors with no
    * smaller-id neighbor ≥ threshold) form the index. Stage B scores the
    * vec_id >= 250 batch against (index ∪ in-batch smaller ids) with
    * first-seen priority — `min(struct(prio, tgt))` in Spark ⇔
    * `ORDER BY prio, tgt LIMIT 1` per vector here; max_sim spans both
    * candidate classes, exactly as the Spark aggregate does. */
  private def semanticDedupIncrementalOracleSql: String = {
    val tables = 12; val ppt = 3
    val planes = graft.ext.SimSearch.hyperplaneSigns(tables * ppt, 64)
    def arr(signs: Seq[Double]): String =
      signs.map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    val bucketTerms = planes.zipWithIndex.map { case (sg, p) =>
      s"(CASE WHEN list_dot_product(v, ${arr(sg)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n   + ")
    val tableRows = (0 until tables).map(t => s"($t)").mkString(",")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |  $bucketTerms AS bucket FROM e),
       |probes AS (
       | SELECT vec_id, t.t AS t, (bucket >> (t.t * $ppt)) & ${(1L << ppt) - 1} AS tb
       | FROM b, (VALUES $tableRows) t(t)),
       |candA AS (
       | SELECT DISTINCT p1.vec_id AS id_a, p2.vec_id AS id_b
       | FROM probes p1 JOIN probes p2
       |   ON p1.t = p2.t AND p1.tb = p2.tb AND p1.vec_id < p2.vec_id
       | WHERE p1.vec_id < 250 AND p2.vec_id < 250),
       |fA AS (
       | SELECT c.id_a, c.id_b FROM candA c
       |  JOIN b ba ON ba.vec_id = c.id_a JOIN b bb ON bb.vec_id = c.id_b
       | WHERE list_dot_product(ba.v, bb.v)
       |    / (sqrt(list_dot_product(ba.v, ba.v)) * sqrt(list_dot_product(bb.v, bb.v)))
       |    >= 0.4),
       |keptA AS (
       | SELECT vec_id FROM e WHERE vec_id < 250
       |  AND vec_id NOT IN (SELECT id_b FROM fA)),
       |cand AS (
       | SELECT DISTINCT p1.vec_id, p2.vec_id AS tgt, 0 AS prio
       | FROM probes p1 JOIN probes p2 ON p1.t = p2.t AND p1.tb = p2.tb
       | WHERE p1.vec_id >= 250 AND p2.vec_id IN (SELECT vec_id FROM keptA)
       | UNION
       | SELECT DISTINCT p1.vec_id, p2.vec_id AS tgt, 1 AS prio
       | FROM probes p1 JOIN probes p2 ON p1.t = p2.t AND p1.tb = p2.tb
       | WHERE p1.vec_id >= 250 AND p2.vec_id >= 250 AND p2.vec_id < p1.vec_id),
       |fB AS (
       | SELECT c.vec_id, c.tgt, c.prio,
       |  list_dot_product(bn.v, bt.v)
       |    / (sqrt(list_dot_product(bn.v, bn.v)) * sqrt(list_dot_product(bt.v, bt.v))) AS sim
       | FROM cand c
       |  JOIN b bn ON bn.vec_id = c.vec_id JOIN b bt ON bt.vec_id = c.tgt
       | WHERE list_dot_product(bn.v, bt.v)
       |    / (sqrt(list_dot_product(bn.v, bn.v)) * sqrt(list_dot_product(bt.v, bt.v)))
       |    >= 0.4),
       |kB AS (
       | SELECT vec_id, tgt AS cand, max_sim_r6 FROM (
       |  SELECT vec_id, tgt,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY prio, tgt) AS rn,
       |   round(max(sim) OVER (PARTITION BY vec_id), 6) AS max_sim_r6
       |  FROM fB) z WHERE rn = 1)
       |SELECT e.vec_id, COALESCE(kB.cand, e.vec_id) AS keeper_id, kB.max_sim_r6
       |FROM e LEFT JOIN kB USING (vec_id) WHERE e.vec_id >= 250""".stripMargin
  }

  /** q13's oracle (also the exact arm of q70's recall harness): brute-force
    * cosine top-10 for the five seed queries, sim DESC + neighbor ASC
    * tiebreak — the same arithmetic order as
    * [[graft.ext.SimSearch.bruteForceTopK]]. */
  private def exactAnnOracleSql: String =
    """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |           FROM embeddings WHERE vec_id < 5),
      | c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      | sims AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |   list_dot_product(q.e, c.e)
      |     / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
      |  FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id),
      | r AS (SELECT query_id, neighbor_id,
      |   CAST(row_number() OVER (PARTITION BY query_id
      |     ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk, sim FROM sims)
      |SELECT query_id, neighbor_id, rnk, round(sim, 6) AS sim_r6
      |FROM r WHERE rnk <= 10""".stripMargin

  /** q70's oracle: both arms nested verbatim as derived-table CTEs — the
    * exact arm is [[exactAnnOracleSql]] (q13's proof), the approximate arm
    * is [[ivfPqAnnOracleSql]] (q68's proof) — intersected on
    * (query_id, neighbor_id) and counted per query. k=10 divides the hit
    * count; every seed query reports a row (LEFT JOIN + coalesce 0). */
  private def annRecallOracleSql: String =
    s"""WITH exact AS (SELECT query_id, neighbor_id FROM ($exactAnnOracleSql) x),
       |approx AS (SELECT query_id, neighbor_id FROM ($ivfPqAnnOracleSql) y),
       |h AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |      FROM exact e JOIN approx a USING (query_id, neighbor_id)
       |      GROUP BY e.query_id),
       |qs AS (SELECT DISTINCT vec_id AS query_id FROM embeddings WHERE vec_id < 5)
       |SELECT qs.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       | round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 10, 6) AS recall_r6
       |FROM qs LEFT JOIN h USING (query_id)""".stripMargin

  /** q67's oracle: the PQ pipeline rebuilt relationally. Codebook j = the
    * j-th 16-wide slice of the md5-ranked seed vectors over the NORMALIZED
    * corpus; encode = per-(vec, j) argmin of the shared ||a||²−2a·b+||b||²
    * expansion (tiebreak code ASC = Spark's array_sort of (d, c) structs);
    * ADC = cosine of the reconstruction, both j-sums ordered (Spark's
    * left-to-right reduce); ranking asim DESC, neighbor ASC. All doubles
    * flow through the same operations in the same order, so the hashes
    * match exactly. */
  private def pqAnnOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |en AS (SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1
      |   AS code, v
      | FROM en ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |cb AS (
      | SELECT j.j AS j, code, v[j.j*16+1 : j.j*16+16] AS cvec
      | FROM seeds CROSS JOIN range(4) j(j)),
      |subv AS (
      | SELECT vec_id, j.j AS j, v[j.j*16+1 : j.j*16+16] AS sv
      | FROM en CROSS JOIN range(4) j(j)),
      |codes AS (
      | SELECT vec_id, j, code, cvec FROM (
      |  SELECT s.vec_id, s.j, c.code, c.cvec,
      |   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
      |     list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cvec)
      |       + list_dot_product(c.cvec, c.cvec) ASC, c.code ASC) AS rn
      |  FROM subv s JOIN cb c ON c.j = s.j) z WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS q_vec FROM en WHERE vec_id < 5),
      |qsub AS (
      | SELECT query_id, j.j AS j, q_vec[j.j*16+1 : j.j*16+16] AS qv
      | FROM q CROSS JOIN range(4) j(j)),
      |terms AS (
      | SELECT qs.query_id, co.vec_id AS neighbor_id, qs.j,
      |  list_dot_product(qs.qv, co.cvec) AS t,
      |  list_dot_product(co.cvec, co.cvec) AS d
      | FROM qsub qs JOIN codes co ON co.j = qs.j
      | WHERE co.vec_id <> qs.query_id),
      |adc AS (SELECT query_id, neighbor_id,
      |  sum(t ORDER BY j) / sqrt(sum(d ORDER BY j)) AS asim
      |        FROM terms GROUP BY query_id, neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY asim DESC, neighbor_id ASC) AS BIGINT) AS rnk, asim FROM adc)
      |SELECT query_id, neighbor_id, rnk, round(asim, 6) AS asim_r6
      |FROM r WHERE rnk <= 10""".stripMargin

  /** q72's oracle: q67's pipeline with ONE Lloyd round spliced between the
    * seed codebook and the final encode. The refinement replays exactly
    * because it is order-independent arithmetic: encode₀ under the seed
    * books (same expansion + tiebreak as q67), per-(j, code, element) sums
    * of DECIMAL(27,10)-cast subvector components (exact, so partition order
    * is irrelevant), the mean taken in double; codes nobody chose keep the
    * seed centroid (LEFT JOIN + coalesce = Spark's clone-then-overwrite). */
  private def pqRefinedOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |en AS (SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1
      |   AS code, v
      | FROM en ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |cb0 AS (
      | SELECT j.j AS j, code, v[j.j*16+1 : j.j*16+16] AS cvec
      | FROM seeds CROSS JOIN range(4) j(j)),
      |subv AS (
      | SELECT vec_id, j.j AS j, v[j.j*16+1 : j.j*16+16] AS sv
      | FROM en CROSS JOIN range(4) j(j)),
      |codes0 AS (
      | SELECT vec_id, j, code FROM (
      |  SELECT s.vec_id, s.j, c.code,
      |   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
      |     list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cvec)
      |       + list_dot_product(c.cvec, c.cvec) ASC, c.code ASC) AS rn
      |  FROM subv s JOIN cb0 c ON c.j = s.j) z WHERE rn = 1),
      |csum AS (
      | SELECT s.j, c0.code, p.p AS p,
      |  CAST(sum(CAST(s.sv[p.p+1] AS DECIMAL(27,10))) AS DOUBLE) AS sx,
      |  count(*) AS n
      | FROM subv s JOIN codes0 c0 ON c0.vec_id = s.vec_id AND c0.j = s.j
      | CROSS JOIN range(16) p(p)
      | GROUP BY s.j, c0.code, p.p),
      |cbr AS (SELECT j, code, list(sx / n ORDER BY p) AS cvec
      |        FROM csum GROUP BY j, code),
      |cb AS (
      | SELECT c0.j, c0.code, coalesce(r.cvec, c0.cvec) AS cvec
      | FROM cb0 c0 LEFT JOIN cbr r ON r.j = c0.j AND r.code = c0.code),
      |codes AS (
      | SELECT vec_id, j, code, cvec FROM (
      |  SELECT s.vec_id, s.j, c.code, c.cvec,
      |   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
      |     list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cvec)
      |       + list_dot_product(c.cvec, c.cvec) ASC, c.code ASC) AS rn
      |  FROM subv s JOIN cb c ON c.j = s.j) z WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS q_vec FROM en WHERE vec_id < 5),
      |qsub AS (
      | SELECT query_id, j.j AS j, q_vec[j.j*16+1 : j.j*16+16] AS qv
      | FROM q CROSS JOIN range(4) j(j)),
      |terms AS (
      | SELECT qs.query_id, co.vec_id AS neighbor_id, qs.j,
      |  list_dot_product(qs.qv, co.cvec) AS t,
      |  list_dot_product(co.cvec, co.cvec) AS d
      | FROM qsub qs JOIN codes co ON co.j = qs.j
      | WHERE co.vec_id <> qs.query_id),
      |adc AS (SELECT query_id, neighbor_id,
      |  sum(t ORDER BY j) / sqrt(sum(d ORDER BY j)) AS asim
      |        FROM terms GROUP BY query_id, neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY asim DESC, neighbor_id ASC) AS BIGINT) AS rnk, asim FROM adc)
      |SELECT query_id, neighbor_id, rnk, round(asim, 6) AS asim_r6
      |FROM r WHERE rnk <= 10""".stripMargin

  /** q73's oracle: q68's coarse cell/probe CTEs spliced with q72's
    * refinement CTEs — codes and ADC run against the REFINED books (cb),
    * the coarse "seed|" centroids stay q68's. Every constituent is already
    * individually hash-proven; this pins their composition. */
  private def ivfPqRefinedOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |en AS (SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),
      |cells AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('seed|' || CAST(vec_id AS VARCHAR))) AS BIGINT) - 1
      |   AS cell_id, v AS centroid
      | FROM en ORDER BY md5('seed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |assign AS (
      | SELECT vec_id, cell_id FROM (
      |  SELECT en.vec_id, s.cell_id,
      |   row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |     list_dot_product(en.v, s.centroid)
      |       / (sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
      |     s.cell_id DESC) AS rn
      |  FROM en CROSS JOIN cells s) z WHERE rn = 1),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1
      |   AS code, v
      | FROM en ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |cb0 AS (
      | SELECT j.j AS j, code, v[j.j*16+1 : j.j*16+16] AS cvec
      | FROM seeds CROSS JOIN range(4) j(j)),
      |subv AS (
      | SELECT vec_id, j.j AS j, v[j.j*16+1 : j.j*16+16] AS sv
      | FROM en CROSS JOIN range(4) j(j)),
      |codes0 AS (
      | SELECT vec_id, j, code FROM (
      |  SELECT s.vec_id, s.j, c.code,
      |   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
      |     list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cvec)
      |       + list_dot_product(c.cvec, c.cvec) ASC, c.code ASC) AS rn
      |  FROM subv s JOIN cb0 c ON c.j = s.j) z WHERE rn = 1),
      |csum AS (
      | SELECT s.j, c0.code, p.p AS p,
      |  CAST(sum(CAST(s.sv[p.p+1] AS DECIMAL(27,10))) AS DOUBLE) AS sx,
      |  count(*) AS n
      | FROM subv s JOIN codes0 c0 ON c0.vec_id = s.vec_id AND c0.j = s.j
      | CROSS JOIN range(16) p(p)
      | GROUP BY s.j, c0.code, p.p),
      |cbr AS (SELECT j, code, list(sx / n ORDER BY p) AS cvec
      |        FROM csum GROUP BY j, code),
      |cb AS (
      | SELECT c0.j, c0.code, coalesce(r.cvec, c0.cvec) AS cvec
      | FROM cb0 c0 LEFT JOIN cbr r ON r.j = c0.j AND r.code = c0.code),
      |codes AS (
      | SELECT vec_id, j, code, cvec FROM (
      |  SELECT s.vec_id, s.j, c.code, c.cvec,
      |   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
      |     list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cvec)
      |       + list_dot_product(c.cvec, c.cvec) ASC, c.code ASC) AS rn
      |  FROM subv s JOIN cb c ON c.j = s.j) z WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS q_vec FROM en WHERE vec_id < 5),
      |probes AS (
      | SELECT query_id, q_vec, cell_id FROM (
      |  SELECT q.query_id, q.q_vec, s.cell_id,
      |   row_number() OVER (PARTITION BY q.query_id ORDER BY
      |     list_dot_product(q.q_vec, s.centroid)
      |       / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
      |     s.cell_id ASC) AS rn
      |  FROM q CROSS JOIN cells s) z WHERE rn <= 4),
      |qsub AS (
      | SELECT query_id, j.j AS j, q_vec[j.j*16+1 : j.j*16+16] AS qv
      | FROM q CROSS JOIN range(4) j(j)),
      |cand AS (
      | SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      | FROM probes p JOIN assign a ON a.cell_id = p.cell_id
      | WHERE a.vec_id <> p.query_id),
      |terms AS (
      | SELECT qs.query_id, ca.neighbor_id, qs.j,
      |  list_dot_product(qs.qv, co.cvec) AS t,
      |  list_dot_product(co.cvec, co.cvec) AS d
      | FROM cand ca
      | JOIN qsub qs ON qs.query_id = ca.query_id
      | JOIN codes co ON co.vec_id = ca.neighbor_id AND co.j = qs.j),
      |adc AS (SELECT query_id, neighbor_id,
      |  sum(t ORDER BY j) / sqrt(sum(d ORDER BY j)) AS asim
      |        FROM terms GROUP BY query_id, neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY asim DESC, neighbor_id ASC) AS BIGINT) AS rnk, asim FROM adc)
      |SELECT query_id, neighbor_id, rnk, round(asim, 6) AS asim_r6
      |FROM r WHERE rnk <= 10""".stripMargin

  /** q84's oracle: full-vector spherical k-means replayed exactly —
    * md5("kmseed|")-ranked seeds, cosine argmax assignment (ties to the
    * LARGER cluster id, the greatest-struct convention), then ONE Lloyd
    * round as decimal-exact element sums divided in double (the q72
    * refinement technique applied to whole vectors; empty clusters keep
    * their seed via the LEFT JOIN coalesce), and the final assignment
    * against the refined centroids. */
  private def kmeansOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |en AS (SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('kmseed|' || CAST(vec_id AS VARCHAR))) AS BIGINT) - 1
      |   AS cluster_id, v AS cv
      | FROM en ORDER BY md5('kmseed|' || CAST(vec_id AS VARCHAR)) LIMIT 8),
      |a0 AS (
      | SELECT vec_id, cluster_id FROM (
      |  SELECT en.vec_id, s.cluster_id,
      |   row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |     list_dot_product(en.v, s.cv)
      |       / (sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
      |     s.cluster_id DESC) AS rn
      |  FROM en CROSS JOIN seeds s) z WHERE rn = 1),
      |csum AS (
      | SELECT a0.cluster_id, p.p AS p,
      |  CAST(sum(CAST(en.v[p.p+1] AS DECIMAL(27,10))) AS DOUBLE) AS sx,
      |  count(*) AS n
      | FROM en JOIN a0 USING (vec_id) CROSS JOIN range(64) p(p)
      | GROUP BY a0.cluster_id, p.p),
      |c1 AS (SELECT cluster_id, list(sx / n ORDER BY p) AS cv FROM csum
      |       GROUP BY cluster_id),
      |cent AS (
      | SELECT s.cluster_id, coalesce(c1.cv, s.cv) AS cv
      | FROM seeds s LEFT JOIN c1 USING (cluster_id)),
      |a1 AS (
      | SELECT vec_id, cluster_id, sim FROM (
      |  SELECT en.vec_id, c.cluster_id,
      |   list_dot_product(en.v, c.cv)
      |     / (sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim,
      |   row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |     list_dot_product(en.v, c.cv)
      |       / (sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |     c.cluster_id DESC) AS rn
      |  FROM en CROSS JOIN cent c) z WHERE rn = 1)
      |SELECT vec_id, cluster_id, round(sim, 6) AS sim_r6 FROM a1""".stripMargin

  /** q87's oracle: min/max from the table itself (cast to double exactly
    * as the Spark side does), the same ((x−min)·256)/span floor-clamp
    * bucketing, and the 8-bit Morton interleave spelled out as shift/mask
    * terms — every operation IEEE-double or integer-exact, so zval hashes
    * bit-for-bit. */
  private def zorderOracleSql: String = {
    val terms = (0 until 8).flatMap(i => Seq(
      s"(((v1 >> $i) & 1) << ${2 * i})",
      s"(((v2 >> $i) & 1) << ${2 * i + 1})"))
    s"""WITH mm AS (SELECT
       |  CAST(min(o_custkey) AS DOUBLE) a1, CAST(max(o_custkey) AS DOUBLE) b1,
       |  CAST(min(o_totalprice) AS DOUBLE) a2, CAST(max(o_totalprice) AS DOUBLE) b2
       | FROM orders),
       |b AS (SELECT o_orderkey,
       |  CAST(least(255, floor((CAST(o_custkey AS DOUBLE) - a1) * 256.0 / (b1 - a1))) AS BIGINT) AS v1,
       |  CAST(least(255, floor((CAST(o_totalprice AS DOUBLE) - a2) * 256.0 / (b2 - a2))) AS BIGINT) AS v2
       | FROM orders, mm)
       |SELECT o_orderkey, ${terms.mkString(" | ")} AS zval FROM b""".stripMargin
  }

  /** q90's oracle: the whole incremental path replayed — q84's CTE chain
    * restricted to the EVEN half (seeds, one Lloyd round, final training
    * assignment a1), then the persisted state's derived centroids (member
    * means of a1: decimal-exact sums, ONE double cast, divide in double —
    * no seed coalesce, so member-less clusters retire), then the odd
    * half's assignment against those with the standard tie-break. */
  private def kmeansIncrementalOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |en AS (SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),
      |en0 AS (SELECT * FROM en WHERE vec_id % 2 = 0),
      |en1 AS (SELECT * FROM en WHERE vec_id % 2 = 1),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('kmseed|' || CAST(vec_id AS VARCHAR))) AS BIGINT) - 1
      |   AS cluster_id, v AS cv
      | FROM en0 ORDER BY md5('kmseed|' || CAST(vec_id AS VARCHAR)) LIMIT 8),
      |a0 AS (
      | SELECT vec_id, cluster_id FROM (
      |  SELECT en0.vec_id, s.cluster_id,
      |   row_number() OVER (PARTITION BY en0.vec_id ORDER BY
      |     list_dot_product(en0.v, s.cv)
      |       / (sqrt(list_dot_product(en0.v, en0.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
      |     s.cluster_id DESC) AS rn
      |  FROM en0 CROSS JOIN seeds s) z WHERE rn = 1),
      |csum AS (
      | SELECT a0.cluster_id, p.p AS p,
      |  CAST(sum(CAST(en0.v[p.p+1] AS DECIMAL(27,10))) AS DOUBLE) AS sx,
      |  count(*) AS n
      | FROM en0 JOIN a0 USING (vec_id) CROSS JOIN range(64) p(p)
      | GROUP BY a0.cluster_id, p.p),
      |c1 AS (SELECT cluster_id, list(sx / n ORDER BY p) AS cv FROM csum
      |       GROUP BY cluster_id),
      |cent AS (
      | SELECT s.cluster_id, coalesce(c1.cv, s.cv) AS cv
      | FROM seeds s LEFT JOIN c1 USING (cluster_id)),
      |a1 AS (
      | SELECT vec_id, cluster_id FROM (
      |  SELECT en0.vec_id, c.cluster_id,
      |   row_number() OVER (PARTITION BY en0.vec_id ORDER BY
      |     list_dot_product(en0.v, c.cv)
      |       / (sqrt(list_dot_product(en0.v, en0.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |     c.cluster_id DESC) AS rn
      |  FROM en0 CROSS JOIN cent c) z WHERE rn = 1),
      |csum2 AS (
      | SELECT a1.cluster_id, p.p AS p,
      |  CAST(sum(CAST(en0.v[p.p+1] AS DECIMAL(27,10))) AS DOUBLE) AS sx,
      |  count(*) AS n
      | FROM en0 JOIN a1 USING (vec_id) CROSS JOIN range(64) p(p)
      | GROUP BY a1.cluster_id, p.p),
      |cent2 AS (SELECT cluster_id, list(sx / n ORDER BY p) AS cv FROM csum2
      |          GROUP BY cluster_id),
      |a2 AS (
      | SELECT vec_id, cluster_id, sim FROM (
      |  SELECT en1.vec_id, c.cluster_id,
      |   list_dot_product(en1.v, c.cv)
      |     / (sqrt(list_dot_product(en1.v, en1.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS sim,
      |   row_number() OVER (PARTITION BY en1.vec_id ORDER BY
      |     list_dot_product(en1.v, c.cv)
      |       / (sqrt(list_dot_product(en1.v, en1.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |     c.cluster_id DESC) AS rn
      |  FROM en1 CROSS JOIN cent2 c) z WHERE rn = 1)
      |SELECT vec_id, cluster_id, round(sim, 6) AS sim_r6 FROM a2""".stripMargin

  /** q88's oracle: q84's assignment CTEs + the rank-based bottom-decile
    * flag (row_number over (sim ASC, vec_id ASC) vs floor(n·0.1) — all
    * integer arithmetic, so the boolean replays exactly). */
  private def kmeansOutlierOracleSql: String = {
    val base = kmeansOracleSql
    base.substring(0, base.lastIndexOf("SELECT vec_id")).stripTrailing + ",\n" +
      """flagged AS (
        | SELECT vec_id, cluster_id, sim,
        |  row_number() OVER (PARTITION BY cluster_id ORDER BY sim ASC, vec_id ASC)
        |    <= floor(count(*) OVER (PARTITION BY cluster_id) * 0.1) AS is_outlier
        | FROM a1)
        |SELECT vec_id, cluster_id, round(sim, 6) AS sim_r6, is_outlier
        |FROM flagged""".stripMargin
  }

  /** q85's oracle: q84's assignment CTEs + the per-cluster
    * md5("cbsample|") pick window, capped at the quota. */
  private def kmeansSampleOracleSql: String = {
    val base = kmeansOracleSql
    base.substring(0, base.lastIndexOf("SELECT vec_id")).stripTrailing + ",\n" +
      """picks AS (
        | SELECT vec_id, cluster_id,
        |  CAST(row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY md5('cbsample|' || CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
        |    AS pick
        | FROM a1)
        |SELECT vec_id, cluster_id, pick FROM picks WHERE pick <= 40""".stripMargin
  }

  /** q68's oracle: q28's cell assignment + probe CTEs (over the NORMALIZED
    * corpus, "seed|" ranking) spliced with q67's codebook + encode + ADC
    * CTEs ("pqseed|" ranking); candidates are the equi-join of probed
    * cells with assigned codes. Same tiebreaks as both parents. */
  private def ivfPqAnnOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |en AS (SELECT vec_id,
      |  list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),
      |cells AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('seed|' || CAST(vec_id AS VARCHAR))) AS BIGINT) - 1
      |   AS cell_id, v AS centroid
      | FROM en ORDER BY md5('seed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |assign AS (
      | SELECT vec_id, cell_id FROM (
      |  SELECT en.vec_id, s.cell_id,
      |   row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |     list_dot_product(en.v, s.centroid)
      |       / (sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
      |     s.cell_id DESC) AS rn
      |  FROM en CROSS JOIN cells s) z WHERE rn = 1),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR))) AS INTEGER) - 1
      |   AS code, v
      | FROM en ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |cb AS (
      | SELECT j.j AS j, code, v[j.j*16+1 : j.j*16+16] AS cvec
      | FROM seeds CROSS JOIN range(4) j(j)),
      |subv AS (
      | SELECT vec_id, j.j AS j, v[j.j*16+1 : j.j*16+16] AS sv
      | FROM en CROSS JOIN range(4) j(j)),
      |codes AS (
      | SELECT vec_id, j, code, cvec FROM (
      |  SELECT s.vec_id, s.j, c.code, c.cvec,
      |   row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
      |     list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cvec)
      |       + list_dot_product(c.cvec, c.cvec) ASC, c.code ASC) AS rn
      |  FROM subv s JOIN cb c ON c.j = s.j) z WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS q_vec FROM en WHERE vec_id < 5),
      |probes AS (
      | SELECT query_id, q_vec, cell_id FROM (
      |  SELECT q.query_id, q.q_vec, s.cell_id,
      |   row_number() OVER (PARTITION BY q.query_id ORDER BY
      |     list_dot_product(q.q_vec, s.centroid)
      |       / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
      |     s.cell_id ASC) AS rn
      |  FROM q CROSS JOIN cells s) z WHERE rn <= 4),
      |qsub AS (
      | SELECT query_id, j.j AS j, q_vec[j.j*16+1 : j.j*16+16] AS qv
      | FROM q CROSS JOIN range(4) j(j)),
      |cand AS (
      | SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      | FROM probes p JOIN assign a ON a.cell_id = p.cell_id
      | WHERE a.vec_id <> p.query_id),
      |terms AS (
      | SELECT qs.query_id, ca.neighbor_id, qs.j,
      |  list_dot_product(qs.qv, co.cvec) AS t,
      |  list_dot_product(co.cvec, co.cvec) AS d
      | FROM cand ca
      | JOIN qsub qs ON qs.query_id = ca.query_id
      | JOIN codes co ON co.vec_id = ca.neighbor_id AND co.j = qs.j),
      |adc AS (SELECT query_id, neighbor_id,
      |  sum(t ORDER BY j) / sqrt(sum(d ORDER BY j)) AS asim
      |        FROM terms GROUP BY query_id, neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY asim DESC, neighbor_id ASC) AS BIGINT) AS rnk, asim FROM adc)
      |SELECT query_id, neighbor_id, rnk, round(asim, 6) AS asim_r6
      |FROM r WHERE rnk <= 10""".stripMargin

  /** q28's oracle: seed centroids = top-16 corpus vectors by the portable
    * md5 ranking (exactly SimSearch.ivfTopK with lloydIters=0); assignment
    * tiebreak is cos DESC, cell DESC (Spark's greatest-of-structs), probe
    * tiebreak cos DESC, cell ASC (array_sort of (-cos, id)). */
  private def ivfAnnOracleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |seeds AS (
      | SELECT CAST(row_number() OVER (ORDER BY md5('seed|' || CAST(vec_id AS VARCHAR))) AS BIGINT) - 1
      |   AS cell_id, v AS centroid
      | FROM e ORDER BY md5('seed|' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |assign AS (
      | SELECT vec_id, v, cell_id FROM (
      |  SELECT e.vec_id, e.v, s.cell_id,
      |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |     list_dot_product(e.v, s.centroid)
      |       / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
      |     s.cell_id DESC) AS rn
      |  FROM e CROSS JOIN seeds s) z WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS q_vec FROM e WHERE vec_id < 5),
      |probes AS (
      | SELECT query_id, q_vec, cell_id FROM (
      |  SELECT q.query_id, q.q_vec, s.cell_id,
      |   row_number() OVER (PARTITION BY q.query_id ORDER BY
      |     list_dot_product(q.q_vec, s.centroid)
      |       / (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
      |     s.cell_id ASC) AS rn
      |  FROM q CROSS JOIN seeds s) z WHERE rn <= 4),
      |sims AS (
      | SELECT p.query_id, a.vec_id AS neighbor_id,
      |  list_dot_product(p.q_vec, a.v)
      |    / (sqrt(list_dot_product(p.q_vec, p.q_vec)) * sqrt(list_dot_product(a.v, a.v))) AS sim
      | FROM probes p JOIN assign a ON a.cell_id = p.cell_id AND a.vec_id <> p.query_id),
      |r AS (SELECT query_id, neighbor_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk, sim FROM sims)
      |SELECT query_id, neighbor_id, rnk, round(sim, 6) AS sim_r6
      |FROM r WHERE rnk <= 10""".stripMargin
}
