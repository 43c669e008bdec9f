package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Predicate, StartsWith}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.merge.TxTable

/** The lakehouse commit log as a Spark [[FileIndex]] — the same seam Delta
  * and Iceberg use to put a transaction log under a stock parquet scan
  * (reference analogy: the target star schema the reference's consumers
  * query with plain SQL, `setup_target.py:11-242`). The planner sees an
  * ordinary `FileSourceScanExec` (vectorized parquet, pushed filters,
  * whole-stage codegen all intact); this index decides WHICH files that
  * scan may touch:
  *
  *  - hive-fragment partition pruning: `listFiles`' partition filters are
  *    evaluated against each live fragment's typed values — a pruned
  *    partition's files are never listed, same contract as Spark's own
  *    `PartitioningAwareFileIndex`;
  *  - log-level stats skipping: data filters of range/equality shape are
  *    checked against the per-file column envelopes the log recorded at
  *    stage time ([[TxTable.ColStat]]) — a file that cannot contain a
  *    matching row never reaches the `FileIndex` listing, the layer BELOW
  *    parquet's own row-group skipping. Skipping yields a superset of the
  *    matching files (data filters stay in the plan and re-apply per row),
  *    so an untranslatable predicate just skips nothing — never wrong.
  *
  * At 100 TB the replay cost is O(log), the listing O(live files) driver
  * memory — the same scaling contract as the Delta log. One snapshot is
  * taken at construction; `refresh()` re-replays.
  *
  * Partition column TYPES follow [[TxTable.read]]'s inference (the
  * basePath re-materialization), so the SQL front door and the Scala API
  * agree on every column's type; only column ORDER differs (SQL puts
  * partition columns last, the `HadoopFsRelation` contract).
  */
final class GraftFileIndex(spark: SparkSession, val dir: String,
                           val asOf: Option[Long],
                           excludeDv: Boolean = false) extends FileIndex {

  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private val fs = new Path(dir).getFileSystem(hadoopConf)
  private val qualifiedDir = fs.makeQualified(new Path(dir))

  private case class Snapshot(
      entries: Seq[TxTable.FileEntry],
      statuses: Map[String, FileStatusWithMetadata],
      fullSchema: StructType,
      partCols: Seq[String],
      bucket: Option[(Int, String)],
      // lowercased SOURCE column → (generated partition column, kind),
      // for the derivable MONOTONE shapes — see TxTable.derivedPartSource
      genDerived: Map[String, (String, String)])

  private def load(): Snapshot = {
    // excludeDv: files carrying a deletion vector are listed by the DV
    // union branch instead (position anti-join) — a stock scan of them
    // would resurrect deleted rows. Schema and layout still come from the
    // FULL live set, so the two branches always agree.
    val allEntries = TxTable.liveEntriesForSql(spark, dir, asOf)
    val entries =
      if (excludeDv) allEntries.filter(_.dv.isEmpty) else allEntries
    // PHYSICAL schema (dropped columns excluded, renames NOT applied):
    // the scan must name the columns the parquet files carry; the front
    // door re-labels its output to the logical names above the scan
    val schema = TxTable.scanSchema(spark, dir, asOf)
    // partition columns from the live fragments themselves (the files are
    // the source of truth; the commit partCol field is informational) —
    // derived from the FULL set so an all-DV'd table still types its
    // partition columns correctly. An EMPTY live set falls back to the
    // declared layout (TRUNCATE / DDL-first CREATE TABLE record it), so
    // DESCRIBE keeps showing the partitioning and the next INSERT lands
    // partitioned instead of silently flattening the table.
    val partCols: Seq[String] = allEntries.flatMap(_.part).headOption
      .map(_.split('/').toSeq.map(_.takeWhile(_ != '=')))
      .getOrElse(if (allEntries.isEmpty)
        TxTable.declaredPartitionCols(spark, dir, asOf) else Nil)
    // a mixed-layout live set can't be modelled as one relation — fail
    // loudly rather than hand the planner files with missing partition
    // values (the API read handles mixed layouts; SQL doesn't). The check
    // is per-fragment COLUMN SEQUENCE, not just partitioned-vs-not:
    // appends with different partitionBy sets would otherwise pass here
    // and crash listFiles with a bare key lookup later.
    if (partCols.nonEmpty)
      allEntries.foreach { e =>
        val cols = e.part.map(_.split('/').toSeq.map(_.takeWhile(_ != '=')))
        require(cols.contains(partCols),
          s"TxTable $dir mixes partition layouts across live batches " +
            s"(${cols.getOrElse(Seq("<unpartitioned>")).mkString(",")} vs " +
            s"${partCols.mkString(",")}) — the SQL front door needs a " +
            "uniform layout; compact or replace into one scheme first " +
            "(TxTable.read still works)")
      }
    val statuses = entries.map { e =>
      val st = fs.getFileStatus(new Path(qualifiedDir, e.path))
      e.path -> FileStatusWithMetadata(st)
    }.toMap
    val genDerived = TxTable.generatedSpecs(spark, dir).flatMap {
      case (g, e) if partCols.exists(_.equalsIgnoreCase(g)) =>
        TxTable.derivedPartSource(e).flatMap { case (src, kind) =>
          // Derivation is only sound for TIMESTAMP sources: derivedOf
          // interprets extracted predicate bounds as TIMESTAMP micros. A
          // DATE-typed source is legal DDL (yr = year(order_date)), but
          // its bounds are DAY numbers — reading ~19700 days as 19700
          // microseconds derives year 1970 and would prune every live
          // fragment, silently returning zero rows. TIMESTAMP_NTZ is
          // similarly shifted by the session-tz cast. Skipping here means
          // those layouts simply never derive-prune (superset semantics
          // keep them correct).
          val srcType = schema.fields
            .find(_.name.equalsIgnoreCase(src)).map(_.dataType)
          if (srcType.contains(TimestampType))
            Some(src.toLowerCase(java.util.Locale.ROOT) -> (g, kind))
          else None
        }
      case _ => None
    }
    Snapshot(entries, statuses, schema, partCols,
      TxTable.bucketSpec(spark, dir), genDerived)
  }

  @volatile private var snap: Snapshot = load()

  /** Lazily-loaded per-file Bloom sidecars
    * ([[graft.ops.Layout.refreshBloomIndexTx]]'s `_bloom_<col>` layout):
    * column → (qualified file path → filter bytes). The point-lookup
    * complement of the min/max envelopes — a high-cardinality column
    * that is NOT the clustering key has file-spanning envelopes and
    * range skipping prunes nothing; the Bloom probe prunes exactly that
    * shape. Loaded only when an equality/IN constraint names an indexed
    * column (one small driver-side collect per index, KBs per file);
    * files missing from an index (built since the last refresh) are
    * always kept — index lag can never lose a row. */
  private lazy val blooms: Map[String, Map[String, Array[Byte]]] = {
    val dirs =
      if (!fs.exists(qualifiedDir)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(qualifiedDir)
    dirs.toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_bloom_"))
      .map { s =>
        val c = s.getPath.getName.stripPrefix("_bloom_")
        val rows = spark.read.parquet(s.getPath.toString).collect()
        c -> rows.map(r =>
          r.getAs[String]("file") -> r.getAs[Array[Byte]]("bloom")).toMap
      }.toMap
  }

  /** Literal rendered as the sidecar's key form (`CAST(col AS STRING)`),
    * for the types whose string form is unambiguous. */
  private def litBloomKey(l: Literal): Option[String] =
    if (l.value == null) None
    else l.dataType match {
      case StringType => Some(l.value.toString)
      case ByteType | ShortType | IntegerType | LongType =>
        Some(l.value.toString)
      case _ => None
    }

  /** (column, candidate values) point constraints from the pushable
    * conjuncts — a file survives when ANY value might be present. */
  private def extractBloomProbes(filters: Seq[Expression])
      : Seq[(String, Seq[String])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        litBloomKey(l).map(v => (a.name, Seq(v)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        litBloomKey(l).map(v => (a.name, Seq(v)))
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        litBloomKey(l).map(v => (a.name, Seq(v)))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.map(l => litBloomKey(l.asInstanceOf[Literal]))
        if (vs.exists(_.isEmpty)) None else Some((a.name, vs.flatten))
      case ins: InSet if ins.child.isInstanceOf[AttributeReference] &&
          ins.hset.nonEmpty =>
        val a = ins.child.asInstanceOf[AttributeReference]
        val vs = ins.hset.toSeq.map(v => litBloomKey(Literal(v, a.dataType)))
        if (vs.exists(_.isEmpty)) None else Some((a.name, vs.flatten))
      case _ => None
    }.filter(p => blooms.contains(p._1))
  }

  /** True when the Bloom sidecars allow `e` under every point probe. */
  private def bloomKeeps(probes: Seq[(String, Seq[String])],
                         e: TxTable.FileEntry): Boolean =
    probes.forall { case (c, vs) =>
      blooms(c).get(fs.makeQualified(new Path(qualifiedDir, e.path)).toString) match {
        case None       => true // not indexed (yet): must be scanned
        case Some(bits) => vs.exists(v =>
          graft.functions.SketchAggs.bloomMightContain(bits, v))
      }
    }

  private def timeZone: String =
    spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)

  /** Hive-escaped fragment value → typed catalyst value for `dt`. */
  private def partValue(raw: String, dt: DataType): Any = {
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else {
      val unescaped = unescapePathName(raw)
      Cast(Literal(UTF8String.fromString(unescaped), StringType), dt,
        Some(timeZone)).eval(InternalRow.empty)
    }
  }

  /** Spark writes partition dir names with %XX escapes for chars illegal
    * in paths; reverse that (the `PartitioningUtils.unescapePathName`
    * algorithm, re-implemented — two hex digits after each '%'). */
  private def unescapePathName(s: String): String = {
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          try {
            val code = Integer.parseInt(s.substring(i + 1, i + 3), 16)
            sb.append(code.toChar); i += 3
          } catch {
            case _: NumberFormatException => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }

  override def partitionSchema: StructType =
    StructType(snap.partCols.map(c => snap.fullSchema.find(_.name == c)
      .getOrElse(StructField(c, StringType))))

  /** Table schema minus partition columns, in table order. */
  def dataSchema: StructType = {
    val pc = snap.partCols.toSet
    StructType(snap.fullSchema.filterNot(f => pc.contains(f.name)))
  }

  override def rootPaths: Seq[Path] = Seq(qualifiedDir)

  override def inputFiles: Array[String] =
    snap.entries.map(e => new Path(qualifiedDir, e.path).toString).toArray

  override def sizeInBytes: Long =
    snap.statuses.values.map(_.getLen).sum

  override def refresh(): Unit = { snap = load() }

  /** Typed partition-value row for one fragment, in partitionSchema order. */
  private def partRow(frag: Option[String]): InternalRow = frag match {
    case None => InternalRow.empty
    case Some(f) =>
      val kv = f.split('/').map { seg =>
        val eq = seg.indexOf('=')
        seg.substring(0, eq) -> seg.substring(eq + 1)
      }.toMap
      val ps = partitionSchema
      InternalRow.fromSeq(ps.map(sf => partValue(kv(sf.name), sf.dataType)))
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val s = snap
    val groups: Seq[(Option[String], Seq[TxTable.FileEntry])] =
      s.entries.groupBy(_.part).toSeq.sortBy(_._1)
    // 1. partition pruning — exact evaluation (Spark does NOT re-apply
    // partition filters per row, so this must be precise, not a superset)
    val afterPart =
      if (partitionFilters.isEmpty || s.partCols.isEmpty) groups
      else {
        val ps = partitionSchema
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = ps.indexWhere(_.name == a.name)
            require(i >= 0,
              s"partition filter references unknown column ${a.name}")
            BoundReference(i, ps(i).dataType, nullable = true)
        }
        val pred = Predicate.createInterpreted(bound)
        pred.initialize(0)
        groups.filter { case (frag, _) => pred.eval(partRow(frag)) }
      }
    // 1b. generated-column partition derivation (the Delta trick): a raw
    // range/point predicate on `event_ts` prunes `day = date(event_ts)`
    // fragments without the query ever naming `day`. Superset semantics
    // (the raw predicate stays in the plan): the date cast is monotonic
    // in the session timezone, so ts ∈ [lo, hi] ⇒ date(ts) ∈
    // [date(lo), date(hi)] — fragments outside that day window can hold
    // no matching row.
    val preRanges = extractRanges(dataFilters)
    val afterDerived =
      if (s.genDerived.isEmpty) afterPart
      else {
        val ps = partitionSchema
        val tz = spark.sessionState.conf.sessionLocalTimeZone
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal => CLit}
        // the derived partition value of a timestamp bound, as a LONG in
        // the partition column's own order (date → days, year → years,
        // date_trunc → truncated micros) — all shapes monotone, so
        // ts ∈ [lo, hi] ⇒ derived ∈ [f(lo), f(hi)]
        def derivedOf(kind: String, bd: BigDecimal, low: Boolean): Long =
          if (low && bd <= NegInf) Long.MinValue
          else if (!low && bd >= PosInf) Long.MaxValue
          else try {
            val ts = CLit(bd.toLong, TimestampType)
            kind match {
              case "date" =>
                Cast(ts, DateType, Some(tz)).eval(null)
                  .asInstanceOf[Int].toLong
              case "year" =>
                org.apache.spark.sql.catalyst.expressions.Year(
                  Cast(ts, DateType, Some(tz))).eval(null)
                  .asInstanceOf[Int].toLong
              case k if k.startsWith("trunc:") =>
                org.apache.spark.sql.catalyst.expressions.TruncTimestamp(
                  CLit(org.apache.spark.unsafe.types.UTF8String
                    .fromString(k.stripPrefix("trunc:")), StringType),
                  ts, Some(tz)).eval(null).asInstanceOf[Long]
              case _ => if (low) Long.MinValue else Long.MaxValue
            }
          } catch {
            case _: Throwable => if (low) Long.MinValue else Long.MaxValue
          }
        // the fragment's own partition value in the same long order; None
        // when the type doesn't match the kind (never prune on a mismatch)
        def fragValue(kind: String, dt: DataType,
                      row: org.apache.spark.sql.catalyst.InternalRow,
                      i: Int): Option[Long] = (kind, dt) match {
          case ("date", DateType)            => Some(row.getInt(i).toLong)
          case ("year", IntegerType)         => Some(row.getInt(i).toLong)
          case ("year", LongType)            => Some(row.getLong(i))
          case (k, TimestampType) if k.startsWith("trunc:") =>
            Some(row.getLong(i))
          case _ => None
        }
        val windows = preRanges.flatMap { case (c, lo, hi) =>
          s.genDerived.get(c.toLowerCase(java.util.Locale.ROOT)).map {
            case (g, kind) =>
              (g, kind, derivedOf(kind, lo, low = true),
                derivedOf(kind, hi, low = false))
          }
        }
        if (windows.isEmpty) afterPart
        else afterPart.filter { case (frag, _) =>
          val row = partRow(frag)
          windows.forall { case (g, kind, dlo, dhi) =>
            val i = ps.indexWhere(_.name.equalsIgnoreCase(g))
            i < 0 || row.isNullAt(i) ||
              fragValue(kind, ps(i).dataType, row, i)
                .forall(d => d >= dlo && d <= dhi)
          }
        }
      }
    // 2. log-level stats skipping + Bloom-sidecar point pruning —
    // superset semantics (data filters stay in the plan), so unsupported
    // shapes simply skip nothing
    val ranges = preRanges
    val sRanges = extractStringRanges(dataFilters)
    val probes = extractBloomProbes(dataFilters)
    // 3. bucket pruning — equality/IN on the declared bucket column keeps
    // only files whose recorded bucket id matches pmod(murmur3(value), N)
    // (superset semantics: files without a recorded bucket always keep)
    val buckets = targetBuckets(dataFilters)
    afterDerived.map { case (frag, es) =>
      val kept =
        if (ranges.isEmpty && sRanges.isEmpty && probes.isEmpty &&
          buckets.isEmpty) es
        else es.filter(e =>
          ranges.forall { case (c, lo, hi) =>
            e.stats.get(c).forall(_.mayContain(lo, hi))
          } && sRanges.forall { case (c, lo, hi) =>
            e.stats.get(c).forall(_.mayContainUtf8(lo, hi))
          } && bloomKeeps(probes, e) &&
          buckets.forall(bs =>
            e.stats.get(TxTable.BucketStatKey)
              .forall(st => bs.contains(st.min.toInt))))
      PartitionDirectory(partRow(frag), kept.map(e => s.statuses(e.path)))
    }.filter(_.files.nonEmpty)
  }

  /** The `BucketSpec` the SQL relation may advertise — the storage-
    * partitioned-join enabler: with it, `FileSourceScanExec` reports
    * `HashPartitioning(col, N)` (grouping files by the bucket id in
    * their Spark-standard `_NNNNN` name suffix), so a join or
    * aggregation keyed on the bucket column skips its shuffle entirely.
    * Only advertised when EVERY listed file carries a parseable suffix
    * that AGREES with the log's recorded bucket id — a table with
    * pre-bucketing files (or adopted/cloned entries) falls back to the
    * plain scan, still index-level bucket-PRUNED, never wrong. */
  lazy val scanBucketSpec: Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] =
    snap.bucket.filter { _ =>
      snap.entries.nonEmpty && snap.entries.forall { e =>
        val name = e.path.substring(e.path.lastIndexOf('/') + 1)
        val suffix = org.apache.spark.sql.execution.datasources
          .BucketingUtils.getBucketId(name)
        val recorded = e.stats.get(TxTable.BucketStatKey).map(_.min.toInt)
        suffix.isDefined && suffix == recorded
      }
    }.map { case (n, c) =>
      org.apache.spark.sql.catalyst.catalog.BucketSpec(n, Seq(c), Nil)
    }

  /** Bucket ids addressed by the filters' equality/IN predicates on the
    * declared bucket column — None when the table is unbucketed or no
    * such predicate exists. */
  private def targetBuckets(filters: Seq[Expression]): Option[Set[Int]] =
    snap.bucket.flatMap { case (n, bcol) =>
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case other     => Seq(other)
      }
      val sets = filters.flatMap(conjuncts).flatMap {
        case EqualTo(a: AttributeReference, l: Literal)
            if a.name.equalsIgnoreCase(bcol) && l.value != null =>
          Some(Set(TxTable.bucketOf(l.value, l.dataType, n)))
        case EqualTo(l: Literal, a: AttributeReference)
            if a.name.equalsIgnoreCase(bcol) && l.value != null =>
          Some(Set(TxTable.bucketOf(l.value, l.dataType, n)))
        case In(a: AttributeReference, list)
            if a.name.equalsIgnoreCase(bcol) && list.nonEmpty &&
              list.forall(e => e.isInstanceOf[Literal] &&
                e.asInstanceOf[Literal].value != null) =>
          Some(list.map { e =>
            val l = e.asInstanceOf[Literal]
            TxTable.bucketOf(l.value, l.dataType, n)
          }.toSet)
        case ins: InSet if ins.child.isInstanceOf[AttributeReference] &&
            ins.child.asInstanceOf[AttributeReference].name
              .equalsIgnoreCase(bcol) && ins.hset.nonEmpty &&
            !ins.hset.contains(null) =>
          val dt = ins.child.dataType
          Some(ins.hset.map(v => TxTable.bucketOf(v, dt, n)).toSet)
        case _ => None
      }
      // multiple conjuncts intersect (all must hold)
      sets.reduceOption(_ intersect _)
    }

  private val NegInf = BigDecimal("-1e308")
  private val PosInf = BigDecimal("1e308")

  private def litBd(l: Literal): Option[BigDecimal] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType =>
        Some(BigDecimal(l.value.toString))
      case FloatType  => Some(BigDecimal(l.value.asInstanceOf[Float].toDouble))
      case DoubleType => Some(BigDecimal(l.value.asInstanceOf[Double]))
      case _: DecimalType =>
        Some(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal)
      case _ => None
    }

  /** (column, lo, hi) constraints implied by the pushable conjuncts of
    * `filters`. Strict bounds are widened to inclusive — still a superset,
    * which is all skipping needs. */
  private def extractRanges(filters: Seq[Expression]): Seq[(String, BigDecimal, BigDecimal)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        litBd(l).map(v => (a.name, v, v))
      case EqualTo(l: Literal, a: AttributeReference) =>
        litBd(l).map(v => (a.name, v, v))
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        litBd(l).map(v => (a.name, v, v))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        litBd(l).map(v => (a.name, v, PosInf))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        litBd(l).map(v => (a.name, v, PosInf))
      case LessThan(a: AttributeReference, l: Literal) =>
        litBd(l).map(v => (a.name, NegInf, v))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        litBd(l).map(v => (a.name, NegInf, v))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        litBd(l).map(v => (a.name, NegInf, v))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        litBd(l).map(v => (a.name, NegInf, v))
      case LessThan(l: Literal, a: AttributeReference) =>
        litBd(l).map(v => (a.name, v, PosInf))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        litBd(l).map(v => (a.name, v, PosInf))
      // IN-list point lookups prune by the list's envelope — a superset
      // (values between min and max that are not IN still pass here; the
      // row filter removes them), which is all skipping needs
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.map(l => litBd(l.asInstanceOf[Literal]))
        if (vs.exists(_.isEmpty)) None
        else Some((a.name, vs.flatten.min, vs.flatten.max))
      // the optimizer turns long IN lists into InSet (internal values,
      // not Literal children) — same envelope rule
      case ins: InSet if ins.child.isInstanceOf[AttributeReference] &&
          ins.hset.nonEmpty =>
        val a = ins.child.asInstanceOf[AttributeReference]
        val vs = ins.hset.toSeq.map(v =>
          litBd(Literal(v, a.dataType)))
        if (vs.exists(_.isEmpty)) None
        else Some((a.name, vs.flatten.min, vs.flatten.max))
      case _ => None
    }
  }

  /** String literal → UTF-8 bytes, default (UTF8_BINARY) collation only:
    * the envelopes compare in unsigned byte order, which IS that
    * collation's order; any other collation stays unprunable. */
  private def litUtf8(l: Literal): Option[Array[Byte]] =
    if (l.value == null) None
    else l.dataType match {
      case StringType => Some(l.value.asInstanceOf[UTF8String].getBytes)
      case _          => None
    }

  /** (column, lo, hi) STRING constraints (None = unbounded) from the
    * pushable conjuncts — equality, ranges, and `col LIKE 'prefix%'`
    * (StartsWith maps to [prefix, prefix+1), exactly what a truncated
    * envelope answers best — the UUID-prefix lookup shape). */
  private def extractStringRanges(filters: Seq[Expression])
      : Seq[(String, Option[Array[Byte]], Option[Array[Byte]])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        litUtf8(l).map(b => (a.name, Some(b), Some(b)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        litUtf8(l).map(b => (a.name, Some(b), Some(b)))
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        litUtf8(l).map(b => (a.name, Some(b), Some(b)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        litUtf8(l).map(b => (a.name, Some(b), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        litUtf8(l).map(b => (a.name, Some(b), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        litUtf8(l).map(b => (a.name, None, Some(b)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        litUtf8(l).map(b => (a.name, None, Some(b)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        litUtf8(l).map(b => (a.name, None, Some(b)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        litUtf8(l).map(b => (a.name, None, Some(b)))
      case LessThan(l: Literal, a: AttributeReference) =>
        litUtf8(l).map(b => (a.name, Some(b), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        litUtf8(l).map(b => (a.name, Some(b), None))
      case StartsWith(a: AttributeReference, l: Literal) =>
        // upper = the prefix INCREMENTED (truncatedUpper over a longer
        // array forces the increment path): ["abc", "abd") covers every
        // string starting with "abc"; an un-incrementable all-0xFF prefix
        // leaves the upper side unbounded
        litUtf8(l).filter(_.nonEmpty).map(b =>
          (a.name, Some(b),
            TxTable.truncatedUpper(b :+ 0x00.toByte, b.length)))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.map(l => litUtf8(l.asInstanceOf[Literal]))
        if (vs.exists(_.isEmpty)) None
        else Some((a.name,
          Some(vs.flatten.min(TxTable.utf8Ordering)),
          Some(vs.flatten.max(TxTable.utf8Ordering))))
      case ins: InSet if ins.child.isInstanceOf[AttributeReference] &&
          ins.hset.nonEmpty =>
        val a = ins.child.asInstanceOf[AttributeReference]
        val vs = ins.hset.toSeq.map(v =>
          litUtf8(Literal(v, a.dataType)))
        if (vs.exists(_.isEmpty)) None
        else Some((a.name,
          Some(vs.flatten.min(TxTable.utf8Ordering)),
          Some(vs.flatten.max(TxTable.utf8Ordering))))
      case _ => None
    }
  }

  /** Distinct live partition-value rows (typed, partitionSchema order) —
    * the catalog descriptor's `SHOW PARTITIONS` feed. */
  private[sql] def distinctPartitionRows: Seq[InternalRow] =
    snap.entries.flatMap(_.part).distinct.sorted.map(f => partRow(Some(f)))

  /** (files the current listing would keep under these filters, live
    * total) — the observability hook PlanQualitySpec uses to prove
    * skipping works through the SQL scan. */
  def skippingStats(dataFilters: Seq[Expression]): (Int, Int) = {
    val ranges = extractRanges(dataFilters)
    val sRanges = extractStringRanges(dataFilters)
    val probes = extractBloomProbes(dataFilters)
    val kept = snap.entries.count(e =>
      ranges.forall { case (c, lo, hi) =>
        e.stats.get(c).forall(_.mayContain(lo, hi))
      } && sRanges.forall { case (c, lo, hi) =>
        e.stats.get(c).forall(_.mayContainUtf8(lo, hi))
      } && bloomKeeps(probes, e))
    (kept, snap.entries.size)
  }
}
