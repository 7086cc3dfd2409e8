package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` makes every graft native
  * expression SQL-callable in each new session (see
  * [[graft.functions.GraftFunctions]] for the inventory). This is the
  * standard injection seam for Spark-native libraries — the same hook a
  * custom Rule[LogicalPlan] or SparkStrategy would use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      extensions.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.Top1WindowRewrite)
    // SQL DML over graft-tx tables: DELETE FROM / UPDATE / MERGE INTO
    // statements against a `USING graft-tx` view convert to the
    // transactional verbs at analysis time (see graft.io.TxSqlDml)
    extensions.injectResolutionRule(_ => graft.io.TxSqlDml.Resolution)
    // catalog management over graft-tx tables: ALTER TABLE ADD COLUMNS
    // and SHOW PARTITIONS re-route to the table's own verbs at analysis
    // (graft.io.TxCatalog); DESCRIBE HISTORY is added at the parser —
    // Spark has no grammar for it (graft.io.GraftSqlParser delegates
    // every other statement byte-identically)
    extensions.injectResolutionRule(_ => graft.io.TxCatalog.Resolution)
    // ANSI CHECK-constraint statements over graft-tx tables: the
    // builtin analyzer refuses them for V1 tables inside the MAIN
    // resolution batch, before injected resolution rules run, so the
    // interception rides the hint batch (runs first) and resolves the
    // target through the session catalog itself (graft.io.TxConstraints)
    extensions.injectHintResolutionRule(_ => graft.io.TxConstraints.Interception)
    extensions.injectParser((_, delegate) => new graft.io.GraftSqlParser(delegate))
  }
}
