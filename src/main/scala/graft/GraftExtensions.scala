package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CurieContractExpr, CurieExpandExpr}

/** SQL surface for the engine's native expressions.
  *
  * Registers `curie_expand` / `curie_contract` so `spark.sql` queries over
  * the triple relation can use them (SURVEY §4: "constant folding /
  * join reorder ... free when we expose SQL over the triple relation").
  * Install via `.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.GraftExtensions` conf, or call
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.curieExpandDesc)
    e.injectFunction(GraftExtensions.curieContractDesc)
    // auto-rewrite point-in-interval theta joins to the bucketed equi
    // form (RangeJoin) — see graft.plans.RangeJoinRewrite
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {

  private def one(name: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[CurieExpandExpr].getName, name),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"$name takes exactly one argument")
        f(args.head)
      })

  val curieExpandDesc = one("curie_expand", CurieExpandExpr(_))
  val curieContractDesc = one("curie_contract", CurieContractExpr(_))

  /** Imperative registration on an already-built session (tests, REPL).
    * Functions go through the registry; the optimizer rule rides
    * `experimental.extraOptimizations` (the post-hoc injection point —
    * a built session's rule batches are frozen). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(curieExpandDesc, curieContractDesc).foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
  }
}
