package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe: replicate the sf0.1 corpus k× (ids shifted so
  * dedup/join semantics stay honest) and time the heavy operators at 1×
  * and k×. A scale-safe operator should grow ~linearly (ratio ≈ k); a
  * superlinear ratio flags a pair-blowup or a single-partition collapse
  * before it would bite at 100 TB.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "Test/runMain graft.ScaleProbe [k]"
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCol: String, k: Int): DataFrame = {
    val n = 10000000L
    (0 until k).map(i =>
      df.withColumn(idCol, col(idCol) + lit(i * n)))
      .reduce(_ unionByName _)
  }

  private def time(label: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val rows = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $label: $rows rows in $s%.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs1 = graft.model.Tables.load(spark, sfDir, "documents").localCheckpoint()
    val docsK = replicate(docs1, "doc_id", k)
      .repartition(32).localCheckpoint() // k files -> realistic partitioning
    val emb1 = graft.model.Tables.load(spark, sfDir, "embeddings").localCheckpoint()
    val embK = replicate(emb1, "vec_id", k).repartition(32).localCheckpoint()

    val probes: Seq[(String, DataFrame => Long)] = Seq(
      ("exact_dedup", d => graft.ext.Dedup.exact(d, "doc_id", "text").count()),
      ("minhash_lsh", d => graft.ext.Dedup.minhashDedupAssignments(
        d, "doc_id", "text", n = 1, k = 32, bands = 4, threshold = 0.6).count()),
      ("simhash", d => graft.ext.Dedup.simhashTable(d, "doc_id", "text").count()),
      ("decontaminate", d => graft.ext.Corpus.contamination(
        d.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
        d.filter(col("doc_id") % 50 === 0), col("doc_id"), col("text"),
        n = 3).count()),
      ("chunk_pack", d => graft.ext.Corpus.packSequences(
        d, col("doc_id"), col("text"), 512, 8).count()),
      ("vocab_encode", d => graft.ext.Corpus.encode(
        d, col("doc_id"), col("text"),
        graft.ext.Corpus.buildVocab(d, col("text"))).count()),
      ("repetition_profile", d => graft.ext.TextStats.repetitionProfile(
        d, "doc_id", "text", 2).count()))

    println(s"[probe] docs 1x=${docs1.count()} ${k}x=${docsK.count()}")
    for ((name, f) <- probes) {
      f(docs1) // warm plans/codegen once
      val t1 = time(s"$name 1x")(f(docs1))
      val tk = time(s"$name ${k}x")(f(docsK))
      println(f"[probe] $name ratio=${tk / t1}%.1f (k=$k, linear=~$k)")
    }

    // ANN: queries fixed (50), corpus grows k x — should stay ~linear
    val q = emb1.filter(col("vec_id") < 50)
    def ann(corpus: DataFrame): Long =
      graft.ext.SimSearch.lshTopK(corpus, q, "vec_id", "embedding", 10).count()
    ann(emb1)
    val a1 = time("lsh_ann 1x")(ann(emb1))
    val ak = time(s"lsh_ann ${k}x")(ann(embK))
    println(f"[probe] lsh_ann ratio=${ak / a1}%.1f (k=$k, linear=~$k)")

    // vector ops: narrow per-row array folds + an O(labels) broadcast —
    // should be embarrassingly linear (no dim× explode/shuffle since r4)
    def quant(c: DataFrame): Long =
      graft.ext.SimSearch.quantizationError(c, "vec_id", "embedding").count()
    quant(emb1)
    val qz1 = time("quantize_int8 1x")(quant(emb1))
    val qzk = time(s"quantize_int8 ${k}x")(quant(embK))
    println(f"[probe] quantize_int8 ratio=${qzk / qz1}%.1f (k=$k, linear=~$k)")
    def cohesion(c: DataFrame): Long =
      graft.ext.SimSearch.labelCohesion(c, "vec_id", "embedding", "label").count()
    cohesion(emb1)
    val ch1 = time("label_cohesion 1x")(cohesion(emb1))
    val chk = time(s"label_cohesion ${k}x")(cohesion(embK))
    println(f"[probe] label_cohesion ratio=${chk / ch1}%.1f (k=$k, linear=~$k)")
    // PQ ANN: encode + ADC are one linear scan over m-byte codes — the
    // 100 TB win is the 64x byte shrink of what that scan READS (compose
    // with IVF cells for sublinear candidate counts)
    val pqQ = emb1.filter(col("vec_id") < 5).localCheckpoint()
    def pq(c: DataFrame): Long =
      graft.ext.SimSearch.pqTopK(c, pqQ, "vec_id", "embedding", 10).count()
    pq(emb1)
    val pq1 = time("pq_ann 1x")(pq(emb1))
    val pqk = time(s"pq_ann ${k}x")(pq(embK))
    println(f"[probe] pq_ann ratio=${pqk / pq1}%.1f (k=$k, linear=~$k; " +
      "scan reads m-byte codes, not raw floats)")

    // banded multi-table LSH semantic dedup (q60's scale path). Replicas
    // are deterministically PERTURBED, not copied — identical replicas
    // would grow the true near-dup pair count quadratically and probe a
    // fully-duplicated-corpus stress instead of scale. With density held
    // constant, growth tracks bucket occupancy (at real scale, planes are
    // tuned up with log n to hold occupancy flat).
    val embPK = (0 until k).map { i =>
      if (i == 0) emb1
      else emb1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> cast(x + (pmod($i * 31 + j, 7) - 3) * 0.17 as float))"))
    }.reduce(_ unionByName _).repartition(32).localCheckpoint()
    def semdedup(c: DataFrame): Long =
      graft.ext.SimSearch.semanticDedupAssignmentsBucketed(
        c, "vec_id", "embedding", 0.4,
        tables = 12, planesPerTable = 3, dim = 64).count()
    semdedup(emb1)
    val sd1 = time("semdedup_bucketed 1x")(semdedup(emb1))
    val sdk = time(s"semdedup_bucketed ${k}x")(semdedup(embPK))
    println(f"[probe] semdedup_bucketed ratio=${sdk / sd1}%.1f (k=$k, linear=~$k)")

    // solver-parameterized variant: (tables, planes) derived from EACH
    // corpus size by semDedupParamsFor, so the "planes grow with log n"
    // policy is exercised at both scale points, not just solvable. At the
    // deployed θ=0.4 the 63-bit bucket budget binds and the solver returns
    // the same r at both sizes (documented); θ=0.6 is where planes actually
    // grow with n — probe both. The hot-slice salt guard runs live here
    // (bound 256 = 4×targetOccupancy), exercising the production config.
    for (thr <- Seq(0.4, 0.6)) {
      def solved(c: DataFrame): (Long, (Int, Int)) = {
        val (df, lp) = graft.ext.SimSearch.semanticDedupAssignmentsBucketedSolved(
          c, "vec_id", "embedding", thr, dim = 64, hotSliceBound = 256)
        (df.count(), lp)
      }
      solved(emb1) // warm
      var lp1: (Int, Int) = (0, 0); var lpk: (Int, Int) = (0, 0)
      val s1 = time(f"semdedup_solved(θ=$thr%.1f) 1x") {
        val (n, lp) = solved(emb1); lp1 = lp; n
      }
      val sk = time(f"semdedup_solved(θ=$thr%.1f) ${k}x") {
        val (n, lp) = solved(embPK); lpk = lp; n
      }
      println(f"[probe] semdedup_solved(θ=$thr%.1f) ratio=${sk / s1}%.1f " +
        s"(k=$k, params 1x=(L=${lp1._1},r=${lp1._2}) " +
        s"${k}x=(L=${lpk._1},r=${lpk._2}))")
    }

    // Tx scoped merge: cost must track the BATCH, not the table — the
    // O(touched partitions) + O(1)-commit claim. Same fixed 200-doc batch
    // against a 1x-seeded and a kx-seeded table: ratio should be ~1
    // (sublinear), while compactData's full rewrite is the ~k baseline.
    val txScheme = graft.merge.MergeSink.PartitionScheme.keyHash(Seq("doc_id"), 64)
    val txBatch = docs1.limit(200)
      .withColumn("text", concat(col("text"), lit(" upd"))).localCheckpoint()
    def txUpsert(dir: String): Long = {
      graft.merge.MergeSink.upsertPartialScopedTx(spark, dir, txBatch,
        Seq("doc_id"), Seq("text"), txScheme)
      txBatch.count()
    }
    val txDir1 = java.nio.file.Files.createTempDirectory("probe-tx1").toString
    val txDirK = java.nio.file.Files.createTempDirectory("probe-txk").toString
    graft.merge.MergeSink.upsertPartialScopedTx(spark, txDir1, docs1,
      Seq("doc_id"), Seq("text"), txScheme)
    graft.merge.MergeSink.upsertPartialScopedTx(spark, txDirK, docsK,
      Seq("doc_id"), Seq("text"), txScheme)
    txUpsert(txDir1) // warm
    val tx1 = time("tx_scoped_upsert 1x-table")(txUpsert(txDir1))
    val txk = time(s"tx_scoped_upsert ${k}x-table")(txUpsert(txDirK))
    println(f"[probe] tx_scoped_upsert ratio=${txk / tx1}%.1f (k=$k, " +
      "table-size-independent=~1)")
    def txCompact(dir: String): Long = {
      graft.merge.TxTable.compactData(spark, dir, targetPartitions = 8)
      1L
    }
    val tc1 = time("tx_compact_data 1x")(txCompact(txDir1))
    val tck = time(s"tx_compact_data ${k}x")(txCompact(txDirK))
    println(f"[probe] tx_compact_data ratio=${tck / tc1}%.1f (k=$k, linear=~$k)")

    // iterative connected components over the xxhash64 (production) pair
    // set. Doc replicas are salted (every 7th word) so true cluster count
    // grows k x while cluster SIZE stays constant — identical replicas
    // would grow within-cluster pair counts quadratically and measure a
    // dup-stress, not scale (same rationale as embPK above).
    val docsPK = (0 until k).map { i =>
      if (i == 0) docs1
      else docs1.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", expr(
          s"array_join(transform(split(text, ' '), (w, j) -> " +
            s"CASE WHEN pmod(j + $i, 7) = 0 THEN concat(w, '_r$i') " +
            s"ELSE w END), ' ')"))
    }.reduce(_ unionByName _).repartition(32).localCheckpoint()
    def clusters(d: DataFrame): Long =
      graft.ext.Dedup.nearDupClusters(graft.ext.Dedup.minhashNearDups(
        d, "doc_id", "text", n = 1, k = 32, bands = 4, threshold = 0.6)).count()
    clusters(docs1)
    val cl1 = time("neardup_clusters 1x")(clusters(docs1))
    val clk = time(s"neardup_clusters ${k}x")(clusters(docsPK))
    println(f"[probe] neardup_clusters ratio=${clk / cl1}%.1f (k=$k, linear=~$k)")

    // incremental dedup: the 100 TB claim is per-BATCH cost independent of
    // corpus size — the corpus is its persisted index, probed by band
    // slice. Same fixed batch against a 1x- vs kx-built index: ~1 expected.
    val txtBatch = docs1.limit(200).localCheckpoint()
    val idx1 = graft.ext.Dedup.buildIndex(docs1, "doc_id", "text", threshold = 0.6)
    val idxK = graft.ext.Dedup.buildIndex(docsK, "doc_id", "text", threshold = 0.6)
    def incText(idx: graft.ext.Dedup.DedupIndex): Long =
      graft.ext.Dedup.incrementalAssignments(txtBatch, "doc_id", "text", idx,
        threshold = 0.6)._1.count()
    incText(idx1)
    val it1 = time("inc_minhash 1x-index")(incText(idx1))
    val itk = time(s"inc_minhash ${k}x-index")(incText(idxK))
    println(f"[probe] inc_minhash ratio=${itk / it1}%.1f (k=$k, " +
      "corpus-size-independent=~1)")
    val embBatch = emb1.limit(200).localCheckpoint()
    val sidx1 = graft.ext.SimSearch.buildSemIndex(emb1, "vec_id", "embedding",
      0.4, tables = 12, planesPerTable = 3, dim = 64)
    val sidxK = graft.ext.SimSearch.buildSemIndex(embPK, "vec_id", "embedding",
      0.4, tables = 12, planesPerTable = 3, dim = 64)
    def incSem(idx: graft.ext.SimSearch.SemIndex): Long =
      graft.ext.SimSearch.incrementalSemanticAssignments(embBatch, "vec_id",
        "embedding", idx, 0.4, tables = 12, planesPerTable = 3, dim = 64)._1.count()
    incSem(sidx1)
    val is1 = time("inc_semdedup 1x-index")(incSem(sidx1))
    val isk = time(s"inc_semdedup ${k}x-index")(incSem(sidxK))
    println(f"[probe] inc_semdedup ratio=${isk / is1}%.1f (k=$k, " +
      "corpus-size-independent=~1)")

    // incremental clustering: fold a fixed batch's edge set into persisted
    // cluster labels built over a 1x vs kx corpus. The fold itself is
    // batch-bounded (label-contracted edges -> driver union-find) plus ONE
    // narrow broadcast-relabel scan of the label table; the alternative a
    // streaming corpus has is reclustering from scratch (neardup_clusters
    // above), so the honest 100 TB claim is "fold ≪ recluster at kx".
    val labels1 = graft.ext.Dedup.nearDupClusters(graft.ext.Dedup.minhashNearDups(
      docs1, "doc_id", "text", n = 1, k = 32, bands = 4, threshold = 0.6))
      .localCheckpoint()
    val labelsK = graft.ext.Dedup.nearDupClusters(graft.ext.Dedup.minhashNearDups(
      docsPK, "doc_id", "text", n = 1, k = 32, bands = 4, threshold = 0.6))
      .localCheckpoint()
    val fe1 = graft.ext.Dedup.incrementalEdges(txtBatch, "doc_id", "text", idx1)
      .localCheckpoint()
    val feK = graft.ext.Dedup.incrementalEdges(txtBatch, "doc_id", "text", idxK)
      .localCheckpoint()
    def foldC(edges: DataFrame, labels: DataFrame): Long =
      graft.ext.Dedup.incrementalClusters(edges, labels).count()
    foldC(fe1, labels1)
    val fc1 = time("inc_clusters 1x")(foldC(fe1, labels1))
    val fcK = time(s"inc_clusters ${k}x")(foldC(feK, labelsK))
    println(f"[probe] inc_clusters ratio=${fcK / fc1}%.1f (k=$k; one narrow " +
      f"relabel scan — full ${k}x recluster is ${clk / fcK}%.1fx the fold cost)")

    // temporal joins: both sides grow k x. Each replica shifts its USER
    // universe too — shifting only surrogate ids would stack k duplicate
    // (custkey, orderdate) rows, violating the uniqueness AsOfJoin
    // documents and probing a tie-collapse workload instead of k x keys.
    def shiftUsers(df: DataFrame, userCol: String, idCol: String, i: Int) =
      df.withColumn(userCol, col(userCol) + lit(i * 10000000L))
        .withColumn(idCol, col(idCol) + lit(i * 10000000L))
    val ev1 = graft.model.Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts").localCheckpoint()
    val evK = (0 until k).map(i => shiftUsers(ev1, "user_id", "event_id", i))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    val od1 = graft.model.Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey")).localCheckpoint()
    val odK = (0 until k).map(i => shiftUsers(od1, "o_custkey", "o_orderkey", i))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    def asofComposed(e: DataFrame, o: DataFrame): Long =
      graft.ops.AsOfJoin.asof(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey")).count()
    def asofExec(e: DataFrame, o: DataFrame): Long =
      graft.plans.AsOfExec.asof(e, o, "user_id", "o_custkey",
        "ts", "o_orderdate").count()
    asofComposed(ev1, od1); asofExec(ev1, od1)
    val c1 = time("asof_composed 1x")(asofComposed(ev1, od1))
    val cK = time(s"asof_composed ${k}x")(asofComposed(evK, odK))
    println(f"[probe] asof_composed ratio=${cK / c1}%.1f (k=$k, linear=~$k)")
    val x1 = time("asof_exec 1x")(asofExec(ev1, od1))
    val xK = time(s"asof_exec ${k}x")(asofExec(evK, odK))
    println(f"[probe] asof_exec ratio=${xK / x1}%.1f (k=$k, linear=~$k)")

    // DELETE write amplification: the SAME sparse delete (one row in
    // ~2k, touching nearly every file) on identical kx tables — CoW
    // rewrites every touched file (~the table's bytes), merge-on-read
    // writes the matched positions. Both pay the same find-the-rows
    // scan; the gap IS the write amplification, and it widens linearly
    // with file size (at 100 TB-class files, CoW rewrites GBs per
    // touched file where DV writes KBs).
    {
      import graft.merge.TxTable
      def freshDir(tag: String): String =
        java.nio.file.Files.createTempDirectory(s"probe-$tag").toString + "/t"
      val cowDir = freshDir("del-cow"); val dvDir = freshDir("del-dv")
      val body = docsK.select(col("doc_id"), col("text"))
      TxTable.replace(spark, cowDir, body)
      TxTable.replace(spark, dvDir, body)
      val cond = col("doc_id") % 1999 === 0
      val tCow = time("delete_cow kx")(
        TxTable.deleteWhere(spark, cowDir, cond).matchedRows)
      val tDv = time("delete_dv kx")(
        TxTable.deleteWhereDV(spark, dvDir, cond).matchedRows)
      def liveBytes(d: String): Long = {
        val fs = new org.apache.hadoop.fs.Path(d)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        TxTable.liveFilePaths(spark, d)
          .map(p => fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
      }
      // bytes the delete WROTE: CoW = its rewritten files; DV = sidecar
      val fsDv = new org.apache.hadoop.fs.Path(dvDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dvBytes = fsDv.listStatus(new org.apache.hadoop.fs.Path(dvDir, "data"))
        .filter(_.getPath.getName.startsWith("dv-"))
        .map(s => fsDv.getContentSummary(s.getPath).getLength).sum
      println(f"[probe] delete write-amp: cow rewrote ~${liveBytes(cowDir)}%d B " +
        f"of table, dv sidecar wrote ${dvBytes}%d B " +
        f"(time cow/dv=${tCow / tDv}%.1f)")
    }

    spark.stop()
  }
}
