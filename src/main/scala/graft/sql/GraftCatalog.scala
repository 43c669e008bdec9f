package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.merge.TxTable

/** Catalog plugin mapping `graft.<ns...>.<table>` names onto TxTable
  * directories under a root path — the piece that makes the lakehouse
  * addressable from plain SQL text, the way the reference's consumers
  * address its PostgreSQL star schema (`setup_target.py:11-242`: Power BI
  * reads TABLES, not APIs). Wire-up:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sql.GraftCatalog
  *   spark.sql.catalog.graft.root = /data/lake
  *   spark.sql.extensions         = graft.GraftExtensions   // read/write rules
  * }}}
  *
  * then `SELECT * FROM graft.db.events VERSION AS OF 3`, `INSERT INTO`,
  * `DELETE FROM`, CTAS, `SHOW TABLES IN graft.db` all work. A table is any
  * directory under the root holding a `_graft_log`; namespaces are plain
  * directories. [[GraftSqlTable]] instances returned here are inert
  * descriptors — [[GraftSqlRules]] swaps them for the real file-scan
  * relation during analysis (the V1-fallback design Delta shipped with for
  * years; scans stay fully vectorized, nothing is read through a row
  * connector). */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {

  private var catalogName: String = _
  private var rootDir: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(rootDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootDir = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catalogName

  // advertise identity-column DDL support so the parser's
  // `GENERATED ALWAYS AS IDENTITY` clause passes validation and reaches
  // createTable as field metadata (TxTable.create turns it into the
  // graft.identity.* allocator property)
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      // column DEFAULT clauses (CREATE TABLE / ADD COLUMN / ALTER COLUMN
      // SET DEFAULT): Spark analyzes + constant-folds the expression and
      // delivers it on the Column/TableChange; TxTable persists it as
      // the versioned graft.default.* properties
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // GENERATED ALWAYS AS (<expr>) columns: computed on every insert,
      // and (for the date shapes) partition-pruning-derivable — see
      // TxTable.generatedSpecs / GraftFileIndex
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  private[sql] def tableDir(ident: Identifier): String = {
    // branch addressing: `t@exp1` (quoted: graft.db.`t@exp1`) resolves to
    // the table's _graft_branches/exp1 dir — every SQL surface (SELECT,
    // INSERT, DELETE, MERGE, CALL) then operates on the branch in
    // isolation from main
    val n = ident.name()
    val at = n.indexOf('@')
    if (at > 0) {
      val baseDir = (ident.namespace() :+ n.substring(0, at))
        .foldLeft(new Path(rootDir))(new Path(_, _)).toString
      s"$baseDir/_graft_branches/${n.substring(at + 1)}"
    } else
      (ident.namespace() :+ n)
        .foldLeft(new Path(rootDir))(new Path(_, _)).toString
  }

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_graft_log"))

  // ----------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsPath = namespace.foldLeft(new Path(rootDir))(new Path(_, _))
    if (!fs.exists(nsPath)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(nsPath).toSeq
      .filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name()).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!TxTable.exists(spark, dir))
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    new GraftSqlTable(dir, None, fullName(ident))
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!TxTable.exists(spark, dir))
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    // numeric = commit version; anything else = a TAG ref
    // (`VERSION AS OF 'release_1'`) resolved from _graft_log/refs
    val v = version.trim
    val resolved =
      if (v.matches("-?\\d+")) v.toLong
      else TxTable.resolveTag(spark, dir, v).getOrElse(
        throw new IllegalArgumentException(
          s"VERSION AS OF '$v': no such tag on ${fullName(ident)} " +
            s"(tags: ${TxTable.listTags(spark, dir).map(_._1).mkString(", ")})"))
    new GraftSqlTable(dir, Some(resolved), fullName(ident))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    // `timestamp` arrives in MICROseconds (the TableCatalog contract)
    val dir = tableDir(ident)
    if (!TxTable.exists(spark, dir))
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    val v = TxTable.versionAtTimestampMicros(spark, dir, timestamp)
      .getOrElse(throw new IllegalArgumentException(
        s"TIMESTAMP AS OF predates every commit of ${fullName(ident)}"))
    new GraftSqlTable(dir, Some(v), fullName(ident))
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace().toSeq :+ ident.name()).mkString(".")

  override def invalidateTable(ident: Identifier): Unit = ()

  /** DDL-first `CREATE TABLE` (+ `PARTITIONED BY`, `TBLPROPERTIES`) — one
    * atomic schema-only first commit ([[TxTable.create]]): the table
    * exists with declared fields and layout and zero data files; reads
    * return an empty typed frame, DESCRIBE and INSERT work immediately,
    * and `constraint.*` properties arm CHECKs from the first write. CTAS
    * still never reaches here ([[GraftSqlRules]] rewrites it to an atomic
    * first-commit insert). Engine-reserved property keys Spark threads
    * through (provider/location/owner/...) are dropped, not persisted. */
  /** V2-column overload: identity specs live on the Column objects and do
    * NOT survive Spark's default conversion to StructType
    * (CatalogV2Util.v2ColumnToStructField drops them) — lift each into the
    * field-metadata encoding `IdentityColumn.getIdentityInfo` reads, so
    * [[TxTable.create]] can persist the allocator property. */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    import org.apache.spark.sql.catalyst.util.{IdentityColumn, ResolveDefaultColumns}
    import org.apache.spark.sql.types.{MetadataBuilder, StructField}
    val schema = StructType(columns.map { c =>
      val meta = Option(c.metadataInJSON())
        .map(org.apache.spark.sql.types.Metadata.fromJson)
        .getOrElse(org.apache.spark.sql.types.Metadata.empty)
      val f = StructField(c.name, c.dataType, c.nullable, meta)
      val withIdent = Option(c.identityColumnSpec()).map { s =>
        f.copy(metadata = new MetadataBuilder().withMetadata(meta)
          .putLong(IdentityColumn.IDENTITY_INFO_START, s.getStart)
          .putLong(IdentityColumn.IDENTITY_INFO_STEP, s.getStep)
          .putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            s.isAllowExplicitInsert)
          .build())
      }.getOrElse(f)
      // GENERATED ALWAYS AS (<expr>): the expression SQL rides to
      // TxTable.create as the standard metadata key
      val withGen = Option(c.generationExpression()).filter(_.nonEmpty)
        .map { g =>
          withIdent.copy(metadata =
            new MetadataBuilder().withMetadata(withIdent.metadata)
              .putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
                .GENERATION_EXPRESSION_METADATA_KEY, g)
              .build())
        }.getOrElse(withIdent)
      // DEFAULT clause: Spark already analyzed it — getSql() is the
      // CURRENT default text (re-resolved per INSERT, so NOW() stamps
      // each statement), getValue() the constant-folded EXISTENCE literal
      Option(c.defaultValue()).map { d =>
        val curSql = Option(d.getSql).getOrElse(
          throw new UnsupportedOperationException(
            s"column ${c.name}: DEFAULT without SQL text is not supported"))
        val exSql = GraftCatalog.literalSql(d.getValue)
        withGen.copy(metadata =
          new MetadataBuilder().withMetadata(withGen.metadata)
            .putString(
              ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, curSql)
            .putString(
              ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY, exSql)
            .build())
      }.getOrElse(withGen)
    })
    createTable(ident, schema, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // '@' addressing resolves to _graft_branches/<name> for EVERY catalog
    // op; a CREATE through it would fabricate a branch-shaped table with
    // no graft.branch.base — invisible to listBranches, unpublishable,
    // and unprotected by the branch vacuum floor. Branches are created by
    // CALL graft.system.create_branch, never by CREATE TABLE.
    require(!ident.name().contains("@"),
      s"cannot CREATE TABLE ${fullName(ident)}: '@' names a branch ref " +
        "(use CALL graft.system.create_branch to open one)")
    val dir = tableDir(ident)
    if (TxTable.exists(spark, dir))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    // the mirror of createView's table guard: one name, one object
    require(!viewExists(ident),
      s"cannot CREATE TABLE ${fullName(ident)}: a VIEW of that name " +
        "exists (DROP VIEW it first)")
    // PARTITIONED BY accepts identity columns (hive fragments) and ONE
    // bucket(N, col) transform (hash-bucketed file layout, recorded as
    // the graft.bucket property — see [[TxTable.bucketSpec]])
    val (bucketTs, identTs) = partitions.partition(_.name == "bucket")
    val partCols = identTs.map { t =>
      require(t.name == "identity",
        s"graft tables support identity and bucket partitioning only, got $t")
      t.references()(0).fieldNames().mkString(".")
    }.toSeq
    require(bucketTs.length <= 1,
      s"at most one bucket(...) transform is supported, got ${bucketTs.length}")
    val bucketProp = bucketTs.headOption.map { t =>
      val n = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value().toString.toInt
      }.getOrElse(throw new IllegalArgumentException(
        s"bucket transform carries no bucket count: $t"))
      val c = t.references()(0).fieldNames().mkString(".")
      "graft.bucket" -> s"$n:$c"
    }
    val reserved = Set("provider", "location", "owner", "external",
      "comment", "option.path", "path", "is_managed_location")
    // engine-MANAGED keys are reserved too: SHOW CREATE TABLE prints every
    // table property incl. graft.dir / graft.schema.* / graft.stats.* /
    // graft.zorder.state — dropping them here (exactly like provider/
    // location) keeps that emitted DDL re-runnable instead of refused
    def engineManaged(k: String): Boolean = {
      val lk = k.toLowerCase
      lk == "graft.dir" || lk == "graft.versionasof" ||
        lk == "graft.zorder.state" || lk.startsWith("graft.schema.") ||
        lk.startsWith("graft.stats.")
    }
    val props = properties.asScala.toMap
      .filterNot { case (k, _) =>
        reserved.contains(k.toLowerCase) || engineManaged(k) } ++ bucketProp
    TxTable.create(spark, dir, schema, partCols, props)
    new GraftSqlTable(dir, None, fullName(ident))
  }

  /** Property changes land as one atomic empty-commit property update —
    * including the `constraint.<name>` namespace, so
    * `ALTER TABLE graft.db.t SET TBLPROPERTIES('constraint.pos'='x >= 0')`
    * arms a CHECK constraint enforced on every subsequent write.
    * `ADD COLUMNS` routes into [[TxTable.addColumns]]'s additive evolution:
    * metadata-only (zero bytes rewritten at any table size), reads
    * materialize the new columns as typed NULLs until data carries them,
    * and time travel below the ALTER keeps the old schema.
    * `RENAME COLUMN` / `DROP COLUMN` route into the column-mapping DDL
    * ([[TxTable.renameColumn]]/[[TxTable.dropColumns]]) — also
    * metadata-only: files keep their physical names, one versioned
    * property re-labels the logical view, and partition/constraint-
    * referenced columns and tainted-name reuse refuse loudly.
    * `ALTER COLUMN ... TYPE` routes into [[TxTable.alterColumnType]]'s
    * metadata-only type WIDENING (exact-value moves only: the integral
    * chain, float→double, decimal precision growth); anything else
    * refuses loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!TxTable.exists(spark, dir))
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    val adds = changes.collect { case a: TableChange.AddColumn =>
      require(a.fieldNames().length == 1,
        s"ADD COLUMNS of nested field ${a.fieldNames().mkString(".")} " +
          "is not supported")
      require(a.position() == null,
        "ADD COLUMNS ... FIRST/AFTER is not supported — new columns " +
          "append at the end of the schema")
      require(a.isNullable,
        s"added column ${a.fieldNames()(0)} must be nullable — existing " +
          "rows have no value for it")
      val f = org.apache.spark.sql.types.StructField(
        a.fieldNames()(0), a.dataType())
      // ADD COLUMN ... DEFAULT: current default = the declared SQL,
      // existence default = the folded constant — frozen here, filled
      // into every pre-declaration row at read time (no rewrite)
      Option(a.defaultValue()).map { d =>
        import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
        val curSql = Option(d.getSql).getOrElse(
          throw new UnsupportedOperationException(
            s"column ${f.name}: DEFAULT without SQL text is not supported"))
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .putString(
            ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, curSql)
          .putString(
            ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY,
            GraftCatalog.literalSql(d.getValue))
          .build())
      }.getOrElse(f)
    }
    // ALTER COLUMN ... SET DEFAULT / DROP DEFAULT: current default only;
    // the existence default stays frozen at its declaration value
    val defaultUpdates = changes.collect {
      case u: TableChange.UpdateColumnDefaultValue =>
        require(u.fieldNames().length == 1,
          s"ALTER COLUMN of nested field ${u.fieldNames().mkString(".")} " +
            "is not supported")
        val sql = Option(u.newCurrentDefault()).flatMap(d => Option(d.getSql))
          .orElse(Option(u.newDefaultValue()).filter(_.nonEmpty))
        u.fieldNames()(0) -> sql
    }
    val props: Map[String, String] = changes.collect {
      case sp: TableChange.SetProperty => sp.property() -> sp.value()
      case rp: TableChange.RemoveProperty => rp.property() -> "" // remove
    }.toMap
    // RENAME/DROP COLUMN: metadata-only column mapping (see
    // TxTable.renameColumn/dropColumns for the guards — partition and
    // constraint-referenced columns, tainted-name reuse all refuse loudly)
    val renames = changes.collect { case r: TableChange.RenameColumn =>
      require(r.fieldNames().length == 1,
        s"RENAME COLUMN of nested field ${r.fieldNames().mkString(".")} " +
          "is not supported")
      r.fieldNames()(0) -> r.newName()
    }
    val drops = changes.collect { case d: TableChange.DeleteColumn =>
      require(d.fieldNames().length == 1,
        s"DROP COLUMN of nested field ${d.fieldNames().mkString(".")} " +
          "is not supported")
      d.fieldNames()(0)
    }
    // ALTER COLUMN ... TYPE: metadata-only type WIDENING (int->long,
    // float->double, decimal precision growth) — TxTable.alterColumnType
    // refuses anything outside the exact-value lattice loudly
    val retypes = changes.collect { case u: TableChange.UpdateColumnType =>
      require(u.fieldNames().length == 1,
        s"ALTER COLUMN of nested field ${u.fieldNames().mkString(".")} " +
          "is not supported")
      u.fieldNames()(0) -> u.newDataType()
    }
    val unsupported = changes.filterNot(c =>
      c.isInstanceOf[TableChange.AddColumn] ||
        c.isInstanceOf[TableChange.RenameColumn] ||
        c.isInstanceOf[TableChange.DeleteColumn] ||
        c.isInstanceOf[TableChange.UpdateColumnType] ||
        c.isInstanceOf[TableChange.UpdateColumnDefaultValue] ||
        c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty])
    if (unsupported.nonEmpty) throw new UnsupportedOperationException(
      s"ALTER TABLE change ${unsupported.head} is not supported; " +
        "ADD COLUMNS, RENAME COLUMN, DROP COLUMN, ALTER COLUMN TYPE " +
        "(widening), and TBLPROPERTIES changes are")
    if (adds.nonEmpty) TxTable.addColumns(spark, dir, adds)
    defaultUpdates.foreach { case (c, sql) =>
      TxTable.setColumnDefault(spark, dir, c, sql) }
    retypes.foreach { case (c, t) =>
      TxTable.alterColumnType(spark, dir, c, t) }
    renames.foreach { case (from, to) =>
      TxTable.renameColumn(spark, dir, from, to) }
    if (drops.nonEmpty) TxTable.dropColumns(spark, dir, drops)
    // arming a CHECK validates the EXISTING rows first (one aggregate
    // pass — the Delta ADD CONSTRAINT contract), so the invariant is
    // trustworthy from the moment it exists; removals and plain
    // properties commit directly
    val (consAdds, rest) = props.partition { case (k, v) =>
      k.startsWith("constraint.") && v.nonEmpty }
    consAdds.foreach { case (k, v) =>
      TxTable.setConstraint(spark, dir, k.stripPrefix("constraint."), v) }
    if (rest.nonEmpty) TxTable.setProperties(spark, dir, rest)
    new GraftSqlTable(dir, None, fullName(ident))
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(tableDir(ident))
    isTableDir(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = new Path(tableDir(oldIdent))
    if (!isTableDir(from)) throw new NoSuchTableException(
      (catalogName +: oldIdent.namespace().toSeq :+ oldIdent.name()))
    require(fs.rename(from, new Path(tableDir(newIdent))),
      s"rename ${fullName(oldIdent)} -> ${fullName(newIdent)} failed")
  }

  // ------------------------------------------------------- procedures

  // `CALL graft.system.vacuum('db.t', dry_run => true)` etc. — the
  // maintenance loop from SQL text; see [[GraftProcedures]]
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  // ------------------------------------------------------------- views

  // Persistent SQL views (`CREATE VIEW graft.db.v AS SELECT ...`) — the
  // reference's derived access paths (`setup_target.py:156-157` maps its
  // partial index to a `current_node_inputs` view) as catalog-persistent
  // objects. Each view is one small file under the namespace's
  // `_graft_views/` dir (never confusable with a table — tables are dirs
  // holding a `_graft_log`): the defining SQL, the resolution context
  // (catalog + namespace the text re-resolves under), the frozen schema,
  // and column aliases/comments/properties, every value hex-encoded so
  // SQL text with any character round-trips. Create is atomic via
  // create-exclusive; replace via tmp + rename.

  import org.apache.spark.sql.connector.catalog.{View, ViewChange, ViewInfo}
  import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}

  private def viewsDir(namespace: Array[String]): Path =
    new Path(namespace.foldLeft(new Path(rootDir))(new Path(_, _)),
      "_graft_views")

  private def viewFile(ident: Identifier): Path =
    new Path(viewsDir(ident.namespace()), ident.name() + ".view")

  private def hex(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map("%02x".format(_)).mkString
  private def unhex(h: String): String = {
    val bytes = h.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
  // nullable list cell ("n" = SQL NULL, e.g. an uncommented column)
  private def cell(v: String): String = if (v == null) "n" else "h" + hex(v)
  private def uncell(c: String): String =
    if (c == "n") null else unhex(c.stripPrefix("h"))

  private def renderView(v: GraftView): String = {
    val sb = new StringBuilder
    sb.append("sql\t").append(hex(v.query)).append('\n')
    sb.append("catalog\t").append(hex(v.currentCatalog)).append('\n')
    sb.append("ns\t").append(v.currentNamespace.map(hex).mkString("\t")).append('\n')
    sb.append("schema\t").append(hex(v.schema.json)).append('\n')
    sb.append("qcols\t").append(v.queryColumnNames.map(cell).mkString("\t")).append('\n')
    sb.append("aliases\t").append(v.columnAliases.map(cell).mkString("\t")).append('\n')
    sb.append("comments\t").append(v.columnComments.map(cell).mkString("\t")).append('\n')
    v.properties.asScala.toSeq.sortBy(_._1).foreach { case (k, value) =>
      sb.append("prop\t").append(hex(k)).append('\t').append(hex(value)).append('\n')
    }
    sb.toString
  }

  private def parseView(name: String, text: String): GraftView = {
    var sql = ""; var cat = ""; var ns = Array.empty[String]
    var schema: StructType = new StructType()
    var qcols, aliases, comments = Array.empty[String]
    val props = scala.collection.mutable.LinkedHashMap.empty[String, String]
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      val parts = line.split('\t')
      parts(0) match {
        case "sql"     => sql = unhex(parts(1))
        case "catalog" => cat = unhex(parts(1))
        case "ns"      => ns = parts.drop(1).filter(_.nonEmpty).map(unhex)
        case "schema"  => schema = org.apache.spark.sql.types.DataType
          .fromJson(unhex(parts(1))).asInstanceOf[StructType]
        case "qcols"    => qcols = parts.drop(1).filter(_.nonEmpty).map(uncell)
        case "aliases"  => aliases = parts.drop(1).filter(_.nonEmpty).map(uncell)
        case "comments" => comments = parts.drop(1).filter(_.nonEmpty).map(uncell)
        case "prop"    => props += unhex(parts(1)) -> unhex(parts(2))
        case other => throw new IllegalStateException(
          s"corrupt view file for $name: unknown line '$other'")
      }
    }
    GraftView(name, sql, cat, ns, schema, qcols, aliases, comments,
      props.toMap.asJava)
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    val nsPath = ns.foldLeft(new Path(rootDir))(new Path(_, _))
    if (!fs.exists(nsPath))
      throw new NoSuchNamespaceException(catalogName +: ns.toSeq)
    val d = viewsDir(ns)
    if (!fs.exists(d)) Array.empty
    else fs.listStatus(d).toSeq
      .filter(_.getPath.getName.endsWith(".view"))
      .map(s => Identifier.of(ns, s.getPath.getName.stripSuffix(".view")))
      .sortBy(_.name()).toArray
  }

  override def viewExists(ident: Identifier): Boolean =
    fs.exists(viewFile(ident))

  override def loadView(ident: Identifier): View = {
    val f = viewFile(ident)
    if (!fs.exists(f)) throw new NoSuchViewException(ident)
    val in = fs.open(f)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    parseView(fullName(ident), text)
  }

  private def writeView(ident: Identifier, view: GraftView,
                        overwrite: Boolean): Unit = {
    fs.mkdirs(viewsDir(ident.namespace()))
    val target = viewFile(ident)
    if (!overwrite) {
      // create-exclusive IS the atomic claim: a racing CREATE VIEW loses
      val out = try fs.create(target, false) catch {
        case _: java.io.IOException if fs.exists(target) =>
          throw new ViewAlreadyExistsException(ident)
      }
      try out.write(renderView(view)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else {
      val tmp = new Path(viewsDir(ident.namespace()),
        s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(renderView(view)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(target, false)
      require(fs.rename(tmp, target), s"could not publish view $target")
    }
  }

  override def createView(info: ViewInfo): View = {
    val ident = info.ident
    val nsPath = ident.namespace().foldLeft(new Path(rootDir))(new Path(_, _))
    if (!fs.exists(nsPath))
      throw new NoSuchNamespaceException(catalogName +: ident.namespace().toSeq)
    if (viewExists(ident)) throw new ViewAlreadyExistsException(ident)
    require(!TxTable.exists(spark, tableDir(ident)),
      s"cannot CREATE VIEW ${fullName(ident)}: a TABLE of that name exists")
    val v = GraftView(fullName(ident), info.sql, info.currentCatalog,
      info.currentNamespace, info.schema, info.queryColumnNames,
      info.columnAliases, info.columnComments, info.properties)
    writeView(ident, v, overwrite = false)
    v
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident
    if (!orCreate && !viewExists(ident)) throw new NoSuchViewException(ident)
    require(!TxTable.exists(spark, tableDir(ident)),
      s"cannot REPLACE VIEW ${fullName(ident)}: a TABLE of that name exists")
    val v = GraftView(fullName(ident), info.sql, info.currentCatalog,
      info.currentNamespace, info.schema, info.queryColumnNames,
      info.columnAliases, info.columnComments, info.properties)
    writeView(ident, v, overwrite = true)
    v
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val cur = loadView(ident).asInstanceOf[GraftView]
    val props = changes.foldLeft(cur.properties.asScala.toMap) { (m, c) =>
      c match {
        case s: ViewChange.SetProperty => m + (s.property() -> s.value())
        case r: ViewChange.RemoveProperty => m - r.property()
        case other => throw new UnsupportedOperationException(
          s"unsupported view change $other")
      }
    }
    val v = cur.copy(viewProps = props.asJava)
    writeView(ident, v, overwrite = true)
    v
  }

  override def dropView(ident: Identifier): Boolean =
    fs.delete(viewFile(ident), false)

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent)) throw new NoSuchViewException(oldIdent)
    if (viewExists(newIdent)) throw new ViewAlreadyExistsException(newIdent)
    fs.mkdirs(viewsDir(newIdent.namespace()))
    require(fs.rename(viewFile(oldIdent), viewFile(newIdent)),
      s"could not rename view ${fullName(oldIdent)} to ${fullName(newIdent)}")
  }

  // ------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(rootDir)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && !isTableDir(s.getPath) &&
        !s.getPath.getName.startsWith("_graft_"))
      .map(s => Array(s.getPath.getName)).sortBy(_.head).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val nsPath = namespace.foldLeft(new Path(rootDir))(new Path(_, _))
      if (!fs.exists(nsPath)) throw new NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
      fs.listStatus(nsPath).toSeq
        .filter(s => s.isDirectory && !isTableDir(s.getPath) &&
          !s.getPath.getName.startsWith("_graft_"))
        .map(s => namespace :+ s.getPath.getName).toArray
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    val nsPath = namespace.foldLeft(new Path(rootDir))(new Path(_, _))
    if (!fs.exists(nsPath)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    val nsPath = namespace.foldLeft(new Path(rootDir))(new Path(_, _))
    fs.mkdirs(nsPath)
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val nsPath = namespace.foldLeft(new Path(rootDir))(new Path(_, _))
    if (!fs.exists(nsPath)) false
    else {
      if (!cascade)
        require(fs.listStatus(nsPath).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(nsPath, true)
    }
  }
}

/** Catalog-resolved descriptor of one TxTable snapshot (optionally
  * time-travelled). Deliberately inert: it exposes name/schema/
  * partitioning/properties so analysis and DESCRIBE work, and claims
  * read/write capabilities so capability checks pass, but the actual scan
  * and write plans are substituted by [[GraftSqlRules]] during resolution
  * — Spark never reads a row through this object. */
final class GraftSqlTable(val dir: String, val asOf: Option[Long],
                          ident: String) extends Table
    with org.apache.spark.sql.connector.catalog.TruncatableTable
    with org.apache.spark.sql.connector.catalog.SupportsPartitionManagement {

  // ------------------------------- SHOW PARTITIONS (read-only surface)
  // Partitions in this format are created and dropped by the DATA — a
  // write to a new fragment creates it, replacePartitionsBy retires it —
  // so the management half of the interface refuses loudly; the listing
  // half serves `SHOW PARTITIONS` from the live fragments.

  import org.apache.spark.sql.catalyst.InternalRow

  override def listPartitionIdentifiers(names: Array[String],
                                        ident0: InternalRow): Array[InternalRow] = {
    val ps = partitionSchema()
    val idx = names.map { n =>
      val i = ps.fieldIndex(n)
      require(i >= 0, s"unknown partition column $n"); i
    }
    new GraftFileIndex(SparkSession.active, dir, asOf)
      .distinctPartitionRows
      .filter { row =>
        idx.indices.forall { j =>
          val i = idx(j)
          val dt = ps(i).dataType
          val a = row.get(i, dt); val b = ident0.get(j, dt)
          (a == null && b == null) || (a != null && a == b)
        }
      }.toArray
  }

  override def createPartition(ident0: InternalRow,
                               properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft partitions are created by writes (a new fragment appears " +
        "when data lands in it) — INSERT into the partition instead")

  override def dropPartition(ident0: InternalRow): Boolean =
    throw new UnsupportedOperationException(
      "graft partitions are dropped by data operations — use DELETE " +
        "FROM ... WHERE <partition predicate> or replacePartitionsBy")

  override def replacePartitionMetadata(ident0: InternalRow,
                                        properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft partitions carry no metadata of their own")

  override def loadPartitionMetadata(ident0: InternalRow): util.Map[String, String] =
    java.util.Collections.emptyMap[String, String]()

  /** `TRUNCATE TABLE` — one atomic commit that empties the live set and
    * records the schema as declared fields ([[TxTable.truncate]]): the
    * table keeps its shape, time travel below the commit keeps the rows. */
  override def truncateTable(): Boolean = {
    require(asOf.isEmpty,
      "TRUNCATE against a time-travelled snapshot is meaningless — " +
        "target the table head")
    TxTable.truncate(SparkSession.active, dir)
    true
  }

  private lazy val schema0: StructType =
    GraftSql.tableSchema(SparkSession.active, dir, asOf)

  private[sql] lazy val partCols: Seq[String] =
    GraftSql.partitionColumns(SparkSession.active, dir)

  override def name(): String = ident

  override def schema(): StructType = schema0

  override def partitioning(): Array[Transform] =
    partCols.map(Expressions.identity).toArray

  override def partitionSchema(): StructType =
    StructType(partCols.map(c => schema0.find(_.name == c).getOrElse(
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType))))

  override def properties(): util.Map[String, String] = {
    val base = TxTable.tableProperties(SparkSession.active, dir)
    (base ++ Map("graft.dir" -> dir) ++
      asOf.map(v => "graft.versionAsOf" -> v.toString)).asJava
  }

  /** AUTOMATIC_SCHEMA_EVOLUTION is OPT-IN per table (the
    * `graft.merge.schemaEvolution` property): with it, Spark's own
    * `MERGE INTO ... WITH SCHEMA EVOLUTION` resolution computes the
    * source-vs-target column/type delta and routes it through this
    * catalog's alterTable — i.e. the metadata-only ADD COLUMNS and
    * type-widening lattice — before the merge resolves. A CDC feed that
    * grew a column needs no manual ALTER first; tables that did NOT opt
    * in keep failing loudly on unknown columns. */
  // cached per descriptor: capabilities() is probed repeatedly during
  // planning, and the property read is a log replay (the descriptor is
  // per-query, like schema0, so staleness is bounded by one statement)
  override lazy val capabilities: util.Set[TableCapability] = {
    val base = util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
    val evolve = TxTable.tableProperties(SparkSession.active, dir)
      .get("graft.merge.schemaEvolution").exists(_.trim.toBoolean)
    if (evolve) base.add(TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
    base
  }
}

object GraftCatalog {
  /** SQL text of a connector literal (the constant-folded existence
    * default Spark hands the catalog) — rendered through the catalyst
    * Literal so casts/quoting round-trip through the parser. */
  private[sql] def literalSql(
      l: org.apache.spark.sql.connector.expressions.Literal[_]): String = {
    require(l != null, "DEFAULT clause carried no folded literal")
    org.apache.spark.sql.catalyst.expressions.Literal(l.value(), l.dataType()).sql
  }
}

/** One persistent view's stored state (see GraftCatalog's views section).
  * `viewProps` is last to keep the copy() used by ALTER VIEW obvious. */
final case class GraftView(viewName: String, query: String,
                           override val currentCatalog: String,
                           override val currentNamespace: Array[String],
                           viewSchema: org.apache.spark.sql.types.StructType,
                           override val queryColumnNames: Array[String],
                           override val columnAliases: Array[String],
                           override val columnComments: Array[String],
                           viewProps: java.util.Map[String, String])
    extends org.apache.spark.sql.connector.catalog.View {
  override def name(): String = viewName
  override def schema(): org.apache.spark.sql.types.StructType = viewSchema
  override def properties(): java.util.Map[String, String] = viewProps
}
