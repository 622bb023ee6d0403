package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's custom Catalyst expressions
  * (SURVEY §2.13): `nfkc_normalize` and `rolling_hash` become callable
  * from `spark.sql(...)` exactly like built-ins — codegen'd, usable in
  * pushed-down projections, visible to `DESCRIBE FUNCTION`.
  *
  * Two hook points, same registrations:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`
  *  - per-session: `GraftFunctions.register(spark)`
  */
object GraftFunctions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (new FunctionIdentifier("nfkc_normalize"),
        new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc_normalize"),
        (args: Seq[Expression]) => NfkcNormalize(args.head)),
      (new FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
        (args: Seq[Expression]) => RollingHash(args.head)))

  def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RegexPrefilterRule)
  }

  /** Runtime registration into an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
