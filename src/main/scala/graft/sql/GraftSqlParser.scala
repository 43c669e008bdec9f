package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser sugar for the statements a lakehouse user types first —
  * `DESCRIBE HISTORY <table>` and `DESCRIBE DETAIL <table>` (Delta's
  * spellings), each accepted as
  *
  *  - `DESCRIBE HISTORY graft.db.t` (a [[GraftCatalog]]-qualified name,
  *    resolved through the catalog's configured root), or
  *  - `DESCRIBE HISTORY '/path/to/table'` (a quoted TxTable path);
  *
  * both rewrite AT PARSE TIME to the equivalent TVF call
  * (`graft_history(...)` / `graft_files(...)`), so the statement forms
  * add zero new execution surface — they ARE the TVFs. The maintenance
  * statements rewrite onto the procedure surface the same way:
  *
  *  - `VACUUM graft.db.t [RETAIN n VERSIONS] [DRY RUN]`
  *    → `CALL graft.system.vacuum('db.t', ...)` (retention here is
  *    version-based, so the spelling says VERSIONS where Delta says
  *    HOURS — an honest rename, not a different semantics);
  *  - `OPTIMIZE graft.db.t` → `CALL graft.system.compact_small_files`;
  *  - `OPTIMIZE graft.db.t ZORDER BY (c1, c2)` → `CALL graft.system.
  *    zorder` (the incremental form stays a CALL parameter);
  *  - `RESTORE [TABLE] graft.db.t TO VERSION AS OF n` →
  *    `CALL graft.system.restore` (metadata-only rollback).
  *
  * Maintenance statements rewrite only for graft-qualified names
  * (procedures resolve through the catalog); a target that is not a
  * configured graft catalog — a single-part Delta-style `VACUUM t`, a
  * co-installed extension's table — falls through to the delegate parser
  * untouched, as does everything else. */
final class GraftSqlParser(session: SparkSession,
                           delegate: ParserInterface) extends ParserInterface {

  private val DescribeHistory =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+(.+?)\s*;?\s*$""".r
  private val DescribeDetail =
    """(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+(.+?)\s*;?\s*$""".r

  private def quote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The TxTable directory a DESCRIBE HISTORY target names. */
  private def dirOf(raw: String): String = {
    val t = raw.trim
    if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
        (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
      t.substring(1, t.length - 1)
    else {
      val parts = delegate.parseMultipartIdentifier(t)
      require(parts.length >= 2,
        s"DESCRIBE HISTORY needs a catalog-qualified name " +
          s"(<catalog>.<ns...>.<table>) or a quoted path, got '$t'")
      val root = session.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
        .getOrElse(throw new IllegalArgumentException(
          s"DESCRIBE HISTORY: '${parts.head}' is not a configured graft " +
            "catalog (spark.sql.catalog.<name>.root is unset) — qualify " +
            "the table with its graft catalog or pass a quoted path"))
      (root +: parts.tail).mkString("/")
    }
  }

  private val AddConstraintStmt =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*$""".r
  private val DropConstraintStmt =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+CONSTRAINT\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$""".r
  private val CreateLikeStmt =
    """(?is)^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w.`]+)\s+LIKE\s+([\w.`]+)\s*;?\s*$""".r

  private val AnalyzeStmt =
    """(?is)^\s*ANALYZE\s+TABLE\s+([\w.`]+)\s+COMPUTE\s+STATISTICS\s*(NOSCAN|FOR\s+ALL\s+COLUMNS|FOR\s+COLUMNS\s+(.+?))?\s*;?\s*$""".r

  private val VacuumStmt =
    """(?is)^\s*VACUUM\s+([\w.`]+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val OptimizeStmt =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+?)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r
  private val RestoreStmt =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+?)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r

  private val ConvertStmt =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+([\w.`]+?)\s*;?\s*$""".r

  private val CloneStmt =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.`]+?)\s+SHALLOW\s+CLONE\s+([\w.`]+?)\s*;?\s*$""".r
  private val RestoreTsStmt =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+?)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r

  /** (catalog, catalog-relative name) of a maintenance-statement target,
    * None when the target is NOT a graft-qualified name (single-part, or
    * its leading part is not a configured graft catalog) — those fall
    * through to the delegate parser untouched, so a co-installed
    * extension's own `VACUUM t` / `OPTIMIZE t` keeps working. */
  private def catRel(raw: String): Option[(String, String)] = {
    val parts =
      try delegate.parseMultipartIdentifier(raw.trim)
      catch { case _: Exception => return None }
    if (parts.length >= 2 && session.conf.getOption(
        s"spark.sql.catalog.${parts.head}.root").isDefined)
      Some((parts.head, parts.tail.mkString(".")))
    else None
  }

  // Persistent views over a graft catalog — Spark 4.1 has the ViewCatalog
  // SPI but no V2 view statement execution (its session-catalog rule
  // rejects every other catalog), so the statement forms intercept here
  // and drive GraftCatalog's ViewCatalog implementation directly; reads
  // expand in GraftSqlRules. Non-graft targets (single-part names, TEMP
  // views, other catalogs) fall through to the delegate untouched.
  private val CreateViewStmt =
    """(?is)^\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?VIEW\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w.`]+)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val DropViewStmt =
    """(?is)^\s*DROP\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?([\w.`]+)\s*;?\s*$""".r
  private val ShowViewsStmt =
    """(?is)^\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+([\w.`]+)\s*;?\s*$""".r
  private val AlterViewSetPropsStmt =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*$""".r
  private val AlterViewUnsetPropsStmt =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+UNSET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*$""".r
  private val RenameViewStmt =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+RENAME\s+TO\s+([\w.`]+)\s*;?\s*$""".r

  /** Parse a TBLPROPERTIES list by round-tripping it through the delegate
    * (an ALTER TABLE shell) — quoting/escaping stay exactly Spark's. */
  private def parseProps(list: String): Map[String, String] =
    delegate.parsePlan(s"ALTER TABLE __graft_props SET TBLPROPERTIES ($list)") match {
      case s: org.apache.spark.sql.catalyst.plans.logical.SetTableProperties =>
        s.properties
      case other => throw new IllegalArgumentException(
        s"unparseable TBLPROPERTIES list: $list ($other)")
    }

  private def parseUnsetKeys(list: String): Seq[String] =
    delegate.parsePlan(s"ALTER TABLE __graft_props UNSET TBLPROPERTIES ($list)") match {
      case s: org.apache.spark.sql.catalyst.plans.logical.UnsetTableProperties =>
        s.propertyKeys
      case other => throw new IllegalArgumentException(
        s"unparseable TBLPROPERTIES list: $list ($other)")
    }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateViewStmt(replace, ine, target, query)
        if catRel(target).isDefined =>
      val (cat, rel) = catRel(target).get
      GraftCreateViewCommand(cat, rel, query.trim,
        replace = replace != null, ifNotExists = ine != null)
    case DropViewStmt(ifExists, target) if catRel(target).isDefined =>
      val (cat, rel) = catRel(target).get
      GraftDropViewCommand(cat, rel, ifExists = ifExists != null)
    case ShowViewsStmt(target) if catRel(target).isDefined =>
      val (cat, rel) = catRel(target).get
      GraftShowViewsCommand(cat, rel.split('.').toSeq)
    case AlterViewSetPropsStmt(target, list) if catRel(target).isDefined =>
      val (cat, rel) = catRel(target).get
      GraftAlterViewPropsCommand(cat, rel, parseProps(list), Nil)
    case AlterViewUnsetPropsStmt(target, list) if catRel(target).isDefined =>
      val (cat, rel) = catRel(target).get
      GraftAlterViewPropsCommand(cat, rel, Map.empty, parseUnsetKeys(list))
    case RenameViewStmt(target, to) if catRel(target).isDefined =>
      val (cat, rel) = catRel(target).get
      val toRel = catRel(to) match {
        case Some((toCat, r)) =>
          require(toCat == cat,
            s"ALTER VIEW RENAME cannot move a view across catalogs " +
              s"($cat -> $toCat)")
          r
        case None => to.replace("`", "")
      }
      GraftRenameViewCommand(cat, rel, toRel)
    case DescribeHistory(target) =>
      delegate.parsePlan(
        s"SELECT * FROM graft_history(${quote(dirOf(target))})")
    case DescribeDetail(target) =>
      delegate.parsePlan(
        s"SELECT * FROM graft_detail(${quote(dirOf(target))})")
    case VacuumStmt(target, retain, dry) =>
      catRel(target) match {
        case None => delegate.parsePlan(sqlText)
        case Some((cat, rel)) =>
          val args = Seq(quote(rel)) ++
            Option(retain).map(r => s"retain_versions => $r") ++
            Option(dry).map(_ => "dry_run => true")
          delegate.parsePlan(
            s"CALL $cat.system.vacuum(${args.mkString(", ")})")
      }
    case OptimizeStmt(target, zcols) =>
      catRel(target) match {
        case None => delegate.parsePlan(sqlText)
        case Some((cat, rel)) => Option(zcols) match {
          case None =>
            delegate.parsePlan(
              s"CALL $cat.system.compact_small_files(${quote(rel)})")
          case Some(cs) =>
            val cols = cs.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty).mkString(",")
            delegate.parsePlan(
              s"CALL $cat.system.zorder(${quote(rel)}, ${quote(cols)})")
        }
      }
    case RestoreStmt(target, version) =>
      catRel(target) match {
        case None => delegate.parsePlan(sqlText)
        case Some((cat, rel)) =>
          delegate.parsePlan(
            s"CALL $cat.system.restore(${quote(rel)}, ${version}L)")
      }
    // CONVERT TO GRAFT graft.db.t — adopt the parquet/hive directory at
    // the name's catalog location in place (one metadata commit)
    case ConvertStmt(target) =>
      catRel(target) match {
        case None => delegate.parsePlan(sqlText)
        case Some((cat, rel)) =>
          delegate.parsePlan(s"CALL $cat.system.convert(${quote(rel)})")
      }
    // CREATE TABLE graft.db.t2 SHALLOW CLONE graft.db.t — zero-copy ref
    case CloneStmt(target, source) if catRel(target).isDefined &&
        catRel(source).isDefined =>
      val (tc, tr) = catRel(target).get
      val (sc, sr) = catRel(source).get
      require(tc == sc,
        s"SHALLOW CLONE cannot cross catalogs ($sc -> $tc)")
      delegate.parsePlan(
        s"CALL $tc.system.clone(${quote(sr)}, ${quote(tr)})")
    // RESTORE ... TO TIMESTAMP AS OF 'ts': the instant resolves to the
    // newest commit at or before it (the batch reader's timestampAsOf
    // contract) at parse time — restores always target a PAST version,
    // so resolution racing a concurrent commit is immaterial
    case RestoreTsStmt(target, ts) =>
      catRel(target) match {
        case None => delegate.parsePlan(sqlText)
        case Some((cat, rel)) =>
          val root = session.conf.get(s"spark.sql.catalog.$cat.root")
          val dir = (root +: rel.split('.').toSeq).mkString("/")
          val t = ts.trim
          val micros: Long =
            if (t.matches("-?\\d+")) t.toLong * 1000L // epoch millis
            else java.sql.Timestamp.valueOf(t).getTime * 1000L
          val v = graft.merge.TxTable
            .versionAtTimestampMicros(session, dir, micros)
            .getOrElse(throw new IllegalArgumentException(
              s"RESTORE TO TIMESTAMP AS OF '$ts' predates every commit " +
                s"of $target"))
          delegate.parsePlan(
            s"CALL $cat.system.restore(${quote(rel)}, ${v}L)")
      }
    // ANALYZE TABLE ... COMPUTE STATISTICS [NOSCAN | FOR [ALL] COLUMNS]:
    // row/size stats are metadata-only (footers − DV cardinalities), so
    // NOSCAN and the plain form are identical; FOR COLUMNS adds the one
    // aggregate scan. Persisted in the log; the scan rule hands them to
    // plan estimation.
    case AnalyzeStmt(target, mode, colList) =>
      catRel(target) match {
        case None => delegate.parsePlan(sqlText)
        case Some((cat, rel)) =>
          val m = Option(mode).map(_.trim.toUpperCase.replaceAll("\\s+", " "))
            .getOrElse("")
          val colsArg =
            if (m.startsWith("FOR COLUMNS"))
              s", cols => ${quote(colList.split(',')
                .map(_.trim.stripPrefix("`").stripSuffix("`"))
                .filter(_.nonEmpty).mkString(","))}"
            else if (m == "FOR ALL COLUMNS") ", all_columns => true"
            else ""
          delegate.parsePlan(
            s"CALL $cat.system.analyze(${quote(rel)}$colsArg)")
      }
    // ADD/DROP CONSTRAINT (the Delta spelling) = sugar over the
    // `constraint.<name>` TBLPROPERTIES namespace — zero new execution
    // paths; the catalog's alterTable validates existing rows on ADD
    case AddConstraintStmt(target, name, check) =>
      if (catRel(target).isEmpty) delegate.parsePlan(sqlText)
      else delegate.parsePlan(s"ALTER TABLE $target SET TBLPROPERTIES(" +
        s"${quote("constraint." + name)} = ${quote(check.trim)})")
    case DropConstraintStmt(target, name) =>
      if (catRel(target).isEmpty) delegate.parsePlan(sqlText)
      else delegate.parsePlan(s"ALTER TABLE $target UNSET TBLPROPERTIES(" +
        s"${quote("constraint." + name)})")
    // CREATE TABLE ... LIKE: DDL-first create with the source's declared
    // schema + partition layout, rendered at parse time from the source
    // table's catalog state (data is NOT copied — the Spark contract)
    case CreateLikeStmt(ifNotExists, target, source) =>
      (catRel(target), catRel(source)) match {
        case (Some(_), Some((srcCat, srcRel))) =>
          val root = session.conf.get(s"spark.sql.catalog.$srcCat.root")
          val srcDir = (root +: srcRel.split('.').toSeq).mkString("/")
          val schema = GraftSql.tableSchema(session, srcDir)
          val parts = GraftSql.partitionColumns(session, srcDir)
          val cols = schema.fields
            .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
          val partBy =
            if (parts.isEmpty) ""
            else parts.map(c => s"`$c`").mkString(" PARTITIONED BY (", ", ", ")")
          val ine = Option(ifNotExists).map(_ => "IF NOT EXISTS ").getOrElse("")
          delegate.parsePlan(
            s"CREATE TABLE $ine$target ($cols)$partBy")
        case _ => delegate.parsePlan(sqlText)
      }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
