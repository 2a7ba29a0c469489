package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd constant-dictionary lookup: `map_lookup(dict, key)`.
  *
  * The builtin route for a broadcast vocabulary — `element_at(typedLit(m),
  * key)` — constant-folds the literal into an `ArrayBasedMapData`, whose
  * `GetMapValue` does a LINEAR key scan per evaluation; with the engine's
  * 800-entry global translation table inlined into a dozen emit patterns
  * (CollapseProject duplicates the lookup into every consumer field) one
  * ingest row paid thousands of UTF8String comparisons. Measured on the
  * AnimalQTLdb pipeline at sf0.1: 390 CPU-seconds, almost all of it in
  * that scan (see `TranslationTable.resolveCol`).
  *
  * This expression keeps the dictionary as a plan reference object and
  * probes a hash map: O(1) per evaluation, interpreted and codegen'd
  * (`doGenCode` emits one virtual call — stays inside whole-stage
  * codegen). Misses return null (same contract as `element_at`).
  * Structural equality on the entries keeps common-subexpression
  * elimination effective across duplicated consumers.
  */
case class MapLookupExpr(child: Expression,
                         entries: Map[String, String],
                         tag: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val jmap: java.util.HashMap[UTF8String, UTF8String] = {
    val m = new java.util.HashMap[UTF8String, UTF8String](entries.size * 2)
    entries.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), UTF8String.fromString(v))
    }
    m
  }

  /** Java-friendly probe used by both eval modes; null on miss. */
  def lookupJ(key: AnyRef): UTF8String = jmap.get(key)

  override protected def nullSafeEval(v: Any): Any = lookupJ(v.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mapLookup", this, classOf[MapLookupExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.lookupJ($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = s"map_lookup_$tag"
  // keep the 800-entry dictionary out of plan strings
  override def toString: String = s"map_lookup_$tag($child)"
  override def sql: String = s"map_lookup_$tag(${child.sql})"
}

object MapExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** O(1) constant-dictionary lookup column; null on missing key. */
  def map_lookup(entries: Map[String, String], key: Column, tag: String): Column =
    ColumnBridge.column(MapLookupExpr(ColumnBridge.expression(key), entries, tag))
}
