package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — derive a change feed from two table versions (the CDC
  * primitive for sources that only hand you full snapshots, and the
  * audit tool for [[graft.merge.TxTable]] time travel: diff version N
  * against N-1 to see what a commit really changed).
  */
object Diff {

  /** Row-level diff of `prev` → `next` keyed by `keys`: one output row
    * per changed key with change_type ∈ {inserted, deleted, updated}.
    * Unchanged keys (every compared column equal, null-safe) are absent.
    * `compareCols` defaults to every non-key column the two sides share.
    * One full-outer equi-join on the keys — the comparison is null-safe
    * (<=> semantics) so NULL → value and value → NULL both read as
    * updates, never as equality. Output: keys ++ (change_type). */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keys: Seq[String],
                   compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else prev.columns.toSeq.filterNot(keys.contains)
        .filter(next.columns.contains)
    val p = prev.select((keys ++ cmp).map(col): _*)
      .withColumn("__p", lit(1))
    val nx = next.select((keys ++ cmp).map(c =>
      col(c).as(if (keys.contains(c)) c else s"__n_$c")): _*)
      .withColumn("__n", lit(1))
    val joined = p.join(nx, keys, "full_outer")
    val changed = cmp.map(c => !(col(c) <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(keys.map(col) :+
      when(col("__p").isNull, lit("inserted"))
        .when(col("__n").isNull, lit("deleted"))
        .when(changed, lit("updated"))
        .otherwise(lit(null).cast("string")).as("change_type"): _*)
      .filter(col("change_type").isNotNull)
  }
}
