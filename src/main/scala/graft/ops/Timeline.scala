package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The timeline event-log builder: a UNION ALL of heterogeneous branches
  * aligned to one named schema (reference extract.py:277-415, SURVEY §2.8 U1).
  *
  * The reference aligns its 8 branches *positionally* — a silent-misalignment
  * hazard. We align by NAME: every branch produces the same named columns and
  * the combiner uses `unionByName`, so a branch with a missing/renamed column
  * fails analysis instead of silently writing into the wrong column.
  *
  * Branch idioms covered: literal event-type synthesis (P3), typed NULL
  * columns (P4), `'PREFIX_' || id` key synthesis (C1), null-propagating
  * concat + COALESCE-to-empty message fragments (C3, §2.12.c — `concat`, never
  * `concat_ws`, which would skip nulls and change semantics).
  */
object Timeline {

  /** Columns every branch must produce, in canonical order. */
  val schema: Seq[String] =
    Seq("source_key", "event_type", "event_time", "actor", "description", "amount")

  def nullString: Column = lit(null).cast("string")
  def nullDouble: Column = lit(null).cast("double")

  /** C1 key synthesis: 'PREFIX_' || id::text. */
  def sourceKey(prefix: String, id: Column): Column =
    concat(lit(prefix + "_"), id.cast("string"))

  /** C3: COALESCE(fragment || value, '') — relies on concat null-propagation. */
  def optionalFragment(label: String, value: Column): Column =
    coalesce(concat(lit(label), value.cast("string")), lit(""))

  /** Align a branch to the canonical schema and union all by name. */
  def unionBranches(branches: Seq[DataFrame]): DataFrame = {
    val aligned = branches.map(_.select(schema.map(col): _*))
    aligned.reduce(_ unionByName _)
      .filter(col("event_time").isNotNull) // F3: outer null filter after union
  }
}
