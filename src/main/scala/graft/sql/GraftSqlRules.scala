package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, TableAlreadyExistsException, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{InsertIntoDataSourceCommand, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr

import graft.merge.TxTable

/** Analyzer rule wiring the catalog's inert [[GraftSqlTable]] descriptors
  * to real plans — the V1-fallback design (the shape Delta shipped with
  * for years): analysis resolves names through [[GraftCatalog]], then this
  * rule substitutes
  *
  *  - reads: `DataSourceV2Relation(GraftSqlTable)` → a `LogicalRelation`
  *    over [[GraftFileIndex]] (stock vectorized parquet scan; log-level
  *    skipping + partition pruning live in the index). Output attribute
  *    ids are preserved via an aliasing Project, so references already
  *    resolved upstream keep binding;
  *  - `INSERT INTO` / `INSERT OVERWRITE`: the aligned `AppendData` /
  *    `OverwriteByExpression` → Spark's own `InsertIntoDataSourceCommand`
  *    over [[GraftInsertableRelation]] (append / atomic replace commits —
  *    column alignment and casts were already done by the analyzer's
  *    output resolution, exactly as for any V2 table);
  *  - CTAS / RTAS: one atomic first-commit insert;
  *  - `DELETE FROM` / `UPDATE`: [[TxTable.deleteWhere]] /
  *    [[TxTable.updateWhere]] — copy-on-write row-level rewrites, commit-
  *    log atomic, O(matching files).
  *
  * The recursion is manual (not `resolveOperators`) because a DML node's
  * relation child must NOT be swapped before the statement converts —
  * once the child is a `LogicalRelation` the statement can no longer find
  * its TxTable. A not-yet-ready DML node is left whole for a later
  * fixpoint iteration. */
final case class GraftSqlRules(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  /** The GraftSqlTable under `p`, looking through subquery aliases. */
  private def tableOf(p: LogicalPlan): Option[GraftSqlTable] = p match {
    case SubqueryAlias(_, child) => tableOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftSqlTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case a: AppendData if tableOf(a.table).isDefined =>
      if (a.query.resolved && a.outputResolved)
        insertCommand(tableOf(a.table).get, rewrite(a.query), overwrite = false)
      else a // wait for output alignment; convert in a later iteration

    case o: OverwriteByExpression if tableOf(o.table).isDefined =>
      if (o.query.resolved && o.outputResolved) {
        require(o.deleteExpr == Literal.TrueLiteral,
          "graft INSERT OVERWRITE replaces the whole table; partition-" +
            "scoped overwrite is the API's replacePartitionsBy")
        insertCommand(tableOf(o.table).get, rewrite(o.query), overwrite = true)
      } else o

    case d: DeleteFromTable if tableOf(d.table).isDefined =>
      if (d.condition.resolved) {
        val t = tableOf(d.table).get
        requireNoAsOf(t, "DELETE")
        GraftDeleteCommand(t.dir, condSql(d.condition, "DELETE"))
      } else d

    case u: UpdateTable if tableOf(u.table).isDefined =>
      if (u.assignments.forall(_.resolved) && u.condition.forall(_.resolved)) {
        val t = tableOf(u.table).get
        requireNoAsOf(t, "UPDATE")
        val sets = u.assignments.map { as =>
          val name = as.key match {
            case a: AttributeReference => a.name
            case other => throw new UnsupportedOperationException(
              s"UPDATE of nested field ${other.sql} is not supported")
          }
          name -> condSql(as.value, "UPDATE")
        }
        GraftUpdateCommand(t.dir,
          u.condition.map(condSql(_, "UPDATE")).getOrElse("true"), sets)
      } else u

    case c: CreateTableAsSelect => c.name match {
      case ResolvedIdentifier(cat: GraftCatalog, ident) if c.query.resolved =>
        val dir = cat.tableDir(ident)
        if (TxTable.exists(session, dir)) {
          if (c.ignoreIfExists) LocalRelation(Nil)
          else throw new TableAlreadyExistsException(
            (cat.name() +: ident.namespace().toSeq :+ ident.name()))
        } else
          InsertIntoDataSourceCommand(
            LogicalRelation(GraftInsertableRelation(dir, c.query.schema,
              identityPartCols(c.partitioning))),
            rewrite(c.query), overwrite = true)
      case _ => c.mapChildren(rewrite)
    }

    case r: ReplaceTableAsSelect => r.name match {
      case ResolvedIdentifier(cat: GraftCatalog, ident) if r.query.resolved =>
        val dir = cat.tableDir(ident)
        require(r.orCreate || TxTable.exists(session, dir),
          s"REPLACE TABLE: no table at $dir (use CREATE OR REPLACE)")
        InsertIntoDataSourceCommand(
          LogicalRelation(GraftInsertableRelation(dir, r.query.schema,
            identityPartCols(r.partitioning))),
          rewrite(r.query), overwrite = true)
      case _ => r.mapChildren(rewrite)
    }

    case r: DataSourceV2Relation if tableOf(r).isDefined =>
      swapToV1(r, tableOf(r).get)

    case other =>
      other.mapChildren(rewrite).transformExpressionsDown {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
  }

  private def identityPartCols(partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform]): Seq[String] =
    partitioning.map { t =>
      require(t.name == "identity",
        s"graft tables support identity partitioning only, got $t")
      t.references()(0).fieldNames().mkString(".")
    }

  private def requireNoAsOf(t: GraftSqlTable, op: String): Unit =
    require(t.asOf.isEmpty, s"$op against a time-travelled snapshot is " +
      "meaningless — target the table head")

  /** Read swap. The Project re-publishes the relation's columns under the
    * ORIGINAL output ids so upstream resolved references keep binding. */
  private def swapToV1(r: DataSourceV2Relation, t: GraftSqlTable): LogicalPlan = {
    val lr = LogicalRelation(GraftSql.relation(session, t.dir, t.asOf))
    val caseSensitive =
      session.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def sameName(a: String, b: String) =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    val aliases: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression] =
      r.output.map { o =>
        val src = lr.output.find(a => sameName(a.name, o.name)).getOrElse(
          throw new IllegalStateException(
            s"column '${o.name}' vanished from ${t.dir} between catalog " +
              "resolution and planning — concurrent schema change?"))
        Alias(src, o.name)(exprId = o.exprId)
      }
    Project(aliases, lr)
  }

  private def insertCommand(t: GraftSqlTable, query: LogicalPlan,
                            overwrite: Boolean): LogicalPlan =
    InsertIntoDataSourceCommand(
      LogicalRelation(GraftInsertableRelation(t.dir, t.schema(), t.partCols)),
      query, overwrite)

  /** Re-render a resolved condition/assignment expression as SQL text the
    * rewrite engine re-resolves against the bare table (qualifiers point
    * at the SQL alias, which doesn't exist there — strip to bare names).
    * Subqueries don't round-trip through text; refuse loudly. */
  private def condSql(cond: Expression, op: String): String = {
    require(!cond.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft $op with subqueries in the condition is not supported — " +
        "materialize the subquery or use the TxTable API")
    cond.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql
  }
}

/** `DELETE FROM` as a copy-on-write log commit — see
  * [[TxTable.deleteWhere]]. */
final case class GraftDeleteCommand(dir: String, condSql: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    TxTable.deleteWhere(sparkSession, dir, expr(condSql))
    Nil
  }
}

/** `UPDATE` as a copy-on-write log commit — see [[TxTable.updateWhere]]. */
final case class GraftUpdateCommand(dir: String, condSql: String,
                                    sets: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    TxTable.updateWhere(sparkSession, dir, expr(condSql),
      sets.map { case (c, e) => c -> expr(e) }.toMap)
    Nil
  }
}
