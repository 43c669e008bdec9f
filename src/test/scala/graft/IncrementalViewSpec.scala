package graft

import org.apache.spark.sql.functions._
import graft.merge.{IncrementalView, TxTable}

/** Incremental materialized aggregate view: every refresh must land the
  * view at EXACTLY the state a from-scratch aggregation of the source
  * snapshot would produce — the invariant checked after every step here —
  * while consuming only the change feed. */
class IncrementalViewSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (String, Long, Long)*) =
    rows.toDF("grp", "qty", "pb")

  /** Ground truth: aggregate the current snapshot directly. */
  private def recompute(dir: String): Map[String, (Long, Long)] =
    TxTable.read(spark, dir).map {
      _.groupBy("grp").agg(count(lit(1)).as("n"), sum("qty").as("s"))
        .as[(String, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    }.getOrElse(Map.empty)

  private def viewState(viewDir: String): Map[String, (Long, Long)] =
    TxTable.read(spark, viewDir).map {
      _.select("grp", "mv_count", "qty_sum")
        .as[(String, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    }.getOrElse(Map.empty)

  test("refresh ≡ recompute across appends, swaps, group deletion, and no-op calls") {
    val src = tmpDir("mv-src"); val view = tmpDir("mv-view")

    // nothing to do before the source exists
    assert(IncrementalView.refresh(spark, src, view,
      Seq("grp"), Seq("qty")).isEmpty)

    // first refresh = full build
    TxTable.append(spark, src, df(("a", 2L, 0L), ("a", 3L, 1L), ("b", 5L, 0L)),
      Seq("pb"))
    val r1 = IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).get
    assert(r1.full && viewState(view) == recompute(src))
    assert(viewState(view) == Map("a" -> ((2L, 5L)), "b" -> ((1L, 5L))))
    assert(IncrementalView.appliedVersion(spark, view)
      .contains(TxTable.headVersion(spark, src).get))

    // already at head: no-op
    assert(IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).isEmpty)

    // incremental: append adds a group and grows another
    TxTable.append(spark, src, df(("b", 1L, 1L), ("c", 7L, 0L)), Seq("pb"))
    val r2 = IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).get
    assert(!r2.full && r2.changedRows == 2L)
    assert(viewState(view) == recompute(src))

    // partition swap: pb=0 rewritten — "a" loses its pb=0 row (2),
    // "b" changes value, "c" is dropped entirely (group deletion)
    TxTable.replacePartitionsBy(spark, src, df(("b", 9L, 0L)), Seq("pb"))
    val r3 = IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).get
    assert(viewState(view) == recompute(src), s"r3=$r3")
    assert(!viewState(view).contains("c")) // count hit 0 → group gone

    // crash-replay safety: calling refresh again is a no-op (the txn mark
    // rode in the same commit as the data)
    assert(IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).isEmpty)
    assert(viewState(view) == recompute(src))
  }

  test("feed misuse fails loudly: applying from the wrong base trips the negative-count guard") {
    val src = tmpDir("mv-src2"); val view = tmpDir("mv-view2")
    TxTable.append(spark, src, df(("a", 1L, 0L)), Seq("pb"))
    IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"))
    // delete a's rows twice over by feeding the same swap through a view
    // whose mark was forged backwards — simulate by replaying the feed
    // after manually re-marking: swap pb=0 away from 'a', refresh, then
    // force a second application of the same delete via a stale-view copy
    TxTable.replacePartitionsBy(spark, src, df(("b", 1L, 0L)), Seq("pb"))
    IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"))
    TxTable.replacePartitionsBy(spark, src, df(("c", 1L, 0L)), Seq("pb"))
    // sabotage: rewrite the view with a's row already gone but the mark
    // rolled back, so the upcoming window re-deletes rows it never saw
    val forged = TxTable.read(spark, view).get
    TxTable.replace(spark, view, forged.filter(col("grp") =!= "b"),
      Nil, None, None, txn = Some(IncrementalView.MvApp -> 1L))
    val e = intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"))
    }
    assert(e.getMessage.contains("negative group count"), e.getMessage)
  }

  test("refresh stays exact across a row-level deleteWhere — the rewrite's cancelling (delete, insert) pairs net to zero") {
    val src = tmpDir("mv-del-src"); val view = tmpDir("mv-del-view")
    TxTable.append(spark, src,
      df(("a", 2L, 0L), ("a", 3L, 0L), ("b", 5L, 0L), ("c", 7L, 1L)),
      Seq("pb"))
    IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4)
    // row-level delete: the rewritten file's SURVIVING rows flow through
    // the change feed as delete+insert of identical rows — the signed
    // delta must cancel them and apply only the true deletion
    val st = TxTable.deleteWhere(spark, src, col("qty") === 3L)
    assert(st.matchedRows == 1L)
    val r = IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).get
    assert(!r.full && viewState(view) == recompute(src))
    assert(viewState(view) == Map("a" -> ((1L, 2L)), "b" -> ((1L, 5L)),
      "c" -> ((1L, 7L))))
  }

  test("refresh stays exact across a merge-on-read deleteWhereDV/updateWhereDV") {
    val src = tmpDir("mv-dv-src"); val view = tmpDir("mv-dv-view")
    TxTable.append(spark, src,
      df(("a", 2L, 0L), ("a", 3L, 0L), ("b", 5L, 0L), ("c", 7L, 1L)),
      Seq("pb"))
    IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4)
    // a dv commit presents as delete(file@oldDv)+insert(file@newDv) of the
    // touched file: survivors cancel, the vectored row nets to -1
    val st = TxTable.deleteWhereDV(spark, src, col("qty") === 3L)
    assert(st.matchedRows == 1L && st.filesTouched == 1)
    val r = IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).get
    assert(!r.full && viewState(view) == recompute(src))
    // and a MoR update flows as the same net change an in-place update does
    TxTable.updateWhereDV(spark, src, col("qty") === 5L,
      Map("qty" -> lit(50L)))
    IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4)
    assert(viewState(view) == recompute(src))
    assert(viewState(view)("b") == ((1L, 50L)))
  }

  test("min/max maintenance: insert-only folds in-feed; deletes of group extrema re-aggregate exactly") {
    val src = tmpDir("mv-mm-src"); val view = tmpDir("mv-mm-view")
    def mmState(viewDir: String): Map[String, (Long, Long, Long, Long)] =
      TxTable.read(spark, viewDir).map {
        _.select("grp", "mv_count", "qty_sum", "qty_min", "qty_max")
          .as[(String, Long, Long, Long, Long)].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
      }.getOrElse(Map.empty)
    def mmRecompute(dir: String): Map[String, (Long, Long, Long, Long)] =
      TxTable.read(spark, dir).map {
        _.groupBy("grp").agg(count(lit(1)), sum("qty"), min("qty"), max("qty"))
          .as[(String, Long, Long, Long, Long)].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
      }.getOrElse(Map.empty)
    def refresh() = IncrementalView.refresh(spark, src, view,
      Seq("grp"), Seq("qty"), buckets = 4, minMaxCols = Seq("qty"))

    // full build carries min/max
    TxTable.append(spark, src,
      df(("a", 2L, 0L), ("a", 9L, 1L), ("b", 5L, 0L)), Seq("pb"))
    assert(refresh().get.full && mmState(view) == mmRecompute(src))

    // insert-only window: extrema fold from the feed, no source rescan
    // (new max for a, new min for b, brand-new group c)
    TxTable.append(spark, src,
      df(("a", 11L, 1L), ("b", 1L, 1L), ("c", 7L, 0L)), Seq("pb"))
    val r2 = refresh().get
    assert(!r2.full && mmState(view) == mmRecompute(src))
    assert(mmState(view)("a") == ((3L, 22L, 2L, 11L)))

    // delete the MIN of a and the MAX of... delete a's current maximum
    // row too: both extrema retire in one window — the rescan regime
    TxTable.deleteWhere(spark, src, col("grp") === "a" && col("qty") === 2L)
    TxTable.deleteWhere(spark, src, col("grp") === "a" && col("qty") === 11L)
    val r3 = refresh().get
    assert(!r3.full && mmState(view) == mmRecompute(src))
    assert(mmState(view)("a") == ((1L, 9L, 9L, 9L)))

    // update that moves a group's minimum (rewrite = delete+insert pairs)
    TxTable.updateWhere(spark, src,
      col("grp") === "b" && col("qty") === 1L, Map("qty" -> lit(20L)))
    val r4 = refresh().get
    assert(!r4.full && mmState(view) == mmRecompute(src))
    assert(mmState(view)("b") == ((2L, 25L, 5L, 20L)))

    // mixed window: deletes in one group, pure inserts in another — only
    // the delete-touched group takes the rescan path, both land exact
    TxTable.deleteWhere(spark, src, col("grp") === "c")
    TxTable.append(spark, src, df(("b", 0L, 0L)), Seq("pb"))
    // (r5 may take the documented empty-bucket full-rebuild escape — the
    // deleted group was alone in its bucket; exactness is the contract)
    val r5 = refresh().get
    assert(mmState(view) == mmRecompute(src), r5.toString)
    assert(!mmState(view).contains("c"))
    assert(mmState(view)("b") == ((3L, 25L, 0L, 20L)))
  }

  test("full build reads the source AS OF the stamped version — a commit racing past headVersion() is never double-counted") {
    val src = tmpDir("mv-race-src"); val view = tmpDir("mv-race-view")
    TxTable.append(spark, src, df(("a", 2L, 0L)), Seq("pb"))
    val v1 = TxTable.headVersion(spark, src).get
    // the race: a second commit lands AFTER refresh captured srcHead = v1
    // but BEFORE it reads the source — reproduced by building at the now-
    // stale head (the window refresh itself cannot pause inside)
    TxTable.append(spark, src, df(("a", 3L, 0L)), Seq("pb"))
    val scheme = graft.merge.MergeSink.PartitionScheme.keyHash(Seq("grp"), 4)
    IncrementalView.fullBuild(spark, src, view, Seq("grp"), Seq("qty"),
      scheme, v1, 0L, 4).get
    // the view reflects ONLY v1; the racing commit is not baked in early
    assert(viewState(view) == Map("a" -> ((1L, 2L))))
    // ...so the next refresh applies it exactly once
    val r = IncrementalView.refresh(spark, src, view, Seq("grp"), Seq("qty"),
      buckets = 4).get
    assert(!r.full && viewState(view) == recompute(src))
    assert(viewState(view) == Map("a" -> ((2L, 5L))))
  }
}
