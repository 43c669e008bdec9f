package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the temporal-join companion to
  * [[AsOfJoin]]: every left row carrying a point timestamp is matched to the
  * right intervals `[start, end)` that contain it, subject to an equi-key.
  *
  * Spark plans a bare `ts >= start AND ts < end` join predicate as a
  * broadcast-nested-loop (or worse, a cartesian product) — O(|L|·|R|) per
  * key and a non-starter at 100 TB. Instead we discretize time into
  * fixed-width bins: each interval is exploded to the bins it covers
  * (bounded fan-out of `ceil(span/bin)+1` rows), each point maps to exactly
  * one bin, and the join becomes a plain shuffled equi-join on
  * `(key, bin)` followed by the exact containment filter. Each (point,
  * interval) pair meets exactly once — the point's bin is unique — so no
  * post-join dedup is needed. Pick `binSeconds` near the typical interval
  * span: shorter bins inflate the interval fan-out, longer bins inflate the
  * per-bin candidate set.
  *
  * At scale the shuffle is on (key, bin) — time-skew (everyone active in the
  * same hour) is spread across keys, and key-skew can be salted upstream
  * with [[Skew]] if one key dominates.
  */
object RangeJoin {

  /** Inner point-in-interval join. `points` must carry `pKey` and `ts`;
    * `intervals` must carry `iKey`, `start`, `end` (end exclusive).
    * Intervals with `end <= start` are empty and dropped, matching SQL
    * `ts >= start AND ts < end` semantics. Column sets must be disjoint.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pKey: String, iKey: String, ts: String, start: String, end: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val w = lit(binSeconds * 1000000L) // bin width in microseconds
    val binned = intervals
      .filter(col(end) > col(start))
      .withColumn("__bin",
        explode(sequence(floor(unix_micros(col(start)) / w),
          // end is exclusive: a bin is covered only if [start,end) reaches it
          floor((unix_micros(col(end)) - 1) / w))))
    val pointsB = points.withColumn("__bin", floor(unix_micros(col(ts)) / w))
    pointsB.join(binned,
        pointsB(pKey) === binned(iKey) && pointsB("__bin") === binned("__bin") &&
          col(ts) >= col(start) && col(ts) < col(end))
      .drop("__bin")
  }

  /** Interval-OVERLAP join — both sides carry `[start, end)` intervals and
    * a pair matches when they intersect (`aStart < bEnd AND bStart < aEnd`)
    * under an equi-key. The temporal-algebra workhorse behind "which
    * sessions touched which incident windows".
    *
    * Same discretization as [[pointInInterval]], plus an exactly-once
    * device replacing post-join dedup: a pair that overlaps meets in every
    * shared bin, but is EMITTED only in the bin of its intersection start —
    * `max(bin(aStart), bin(bStart))`. That bin is always covered by both
    * sides when they overlap (floor is monotone, and a non-empty half-open
    * intersection reaches it), so each overlapping pair appears exactly
    * once and the result needs no distinct(). The extra conjunct is a cheap
    * post-join filter; the join itself stays a shuffled equi-join on
    * `(key, bin)`.
    *
    * Column sets must be disjoint. Empty intervals (`end <= start`) on
    * either side drop, matching the strict-inequality overlap predicate. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aKey: String, bKey: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val w = lit(binSeconds * 1000000L) // bin width in microseconds
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bin",
        explode(sequence(floor(unix_micros(col(s)) / w),
          floor((unix_micros(col(e)) - 1) / w))))
    val ab = binned(a, aStart, aEnd)
    val bb = binned(b, bStart, bEnd).withColumnRenamed("__bin", "__bbin")
    ab.join(bb,
        ab(aKey) === bb(bKey) && ab("__bin") === bb("__bbin") &&
          col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
          ab("__bin") === greatest(floor(unix_micros(col(aStart)) / w),
            floor(unix_micros(col(bStart)) / w)))
      .drop("__bin", "__bbin")
  }
}
