package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.CurieMap

/** Codegen'd CURIE ↔ IRI expressions.
  *
  * Longest-prefix-match contraction is not expressible with builtin
  * column functions (a `when` chain over 250+ namespaces defeats codegen
  * and still can't order by match length), so this is the engine's native
  * `Expression` tier (SURVEY §2.11): `nullSafeEval` for interpreted mode
  * plus `doGenCode` that stays inside whole-stage codegen by calling a
  * static helper with the [[CurieMap]] attached as a reference object.
  */
object CurieFns {

  /** Longest-prefix contraction; non-matching IRIs pass through. */
  def contractOrSelf(cm: CurieMap, s: UTF8String): UTF8String = {
    val str = s.toString
    cm.contract(str) match {
      case Some(c) => UTF8String.fromString(c)
      case None => s
    }
  }

  def expand(cm: CurieMap, s: UTF8String): UTF8String =
    UTF8String.fromString(cm.expand(s.toString))
}

abstract class CurieExpression extends UnaryExpression {
  def cm: CurieMap
  override def dataType: DataType = StringType

  protected def helperCall(cmRef: String, input: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("curieMap", cm, classOf[CurieMap].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${helperCall(cmRef, c)};")
  }
}

/** `curie_contract(iri)` — longest-prefix CURIE contraction. */
case class CurieContractExpr(child: Expression,
                             cm: CurieMap = CurieMap.default)
    extends CurieExpression {
  override protected def nullSafeEval(v: Any): Any =
    CurieFns.contractOrSelf(cm, v.asInstanceOf[UTF8String])
  override protected def helperCall(cmRef: String, input: String): String =
    s"graft.functions.CurieFns.contractOrSelf($cmRef, $input)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "curie_contract"
}

/** `curie_expand(curie)` — CURIE/bnode/IRI routing to a full IRI
  * (same routing as RDFGraph._getnode). */
case class CurieExpandExpr(child: Expression,
                           cm: CurieMap = CurieMap.default)
    extends CurieExpression {
  override protected def nullSafeEval(v: Any): Any =
    CurieFns.expand(cm, v.asInstanceOf[UTF8String])
  override protected def helperCall(cmRef: String, input: String): String =
    s"graft.functions.CurieFns.expand($cmRef, $input)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "curie_expand"
}

object CurieExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def curie_contract(c: Column): Column =
    ColumnBridge.column(CurieContractExpr(ColumnBridge.expression(c)))
  def curie_expand(c: Column): Column =
    ColumnBridge.column(CurieExpandExpr(ColumnBridge.expression(c)))
}
