package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.Registry
import graft.plans.{AsOfJoinStrategy, RangeJoinRewrite}

/** The engine as a Spark extension — installable without touching user
  * code via `--conf spark.sql.extensions=graft.GraftExtensions`:
  *
  *  - the [[graft.plans.RangeJoinRewrite]] optimizer rule (naive temporal
  *    range joins become binned equi-joins instead of nested loops);
  *  - the [[graft.plans.AsOfJoinStrategy]] planner strategy (the custom
  *    merge-based as-of join physical operator);
  *  - the SQL function surface (`safe_bool`, `dot_product`, ... — the same
  *    set `Registry.registerAll` adds per-session);
  *  - the [[graft.sql.GraftSqlRules]] resolution rule that makes TxTables
  *    resolved through [[graft.sql.GraftCatalog]] readable/writable from
  *    plain SQL (SELECT incl. VERSION/TIMESTAMP AS OF, INSERT, CTAS,
  *    DELETE, UPDATE).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule { session =>
      RangeJoinRewrite(() =>
        session.conf.get("spark.graft.rangeJoin.binSeconds", "3600").toLong)
    }
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectResolutionRule(session => graft.sql.GraftSqlRules(session))
    // `DESCRIBE HISTORY graft.db.t` / `DESCRIBE HISTORY '/path'` — parse-
    // time sugar over the graft_history TVF
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(session, delegate))
    graft.sql.GraftTableFunctions.all.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.GraftTableFunctions", name), builder))
    }
    Registry.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Registry", name), builder))
    }
  }
}
