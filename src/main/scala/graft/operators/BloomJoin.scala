package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Runtime-filter join: prune the fact side with a Bloom filter of the
  * dimension keys BEFORE the shuffle join.
  *
  * At cluster scale the dominant cost of fact ⋈ dim (dim too large to
  * broadcast, fact rows mostly non-matching — the shape of every
  * "annotate the corpus with curated ids" join in the reference, e.g.
  * dipper/sources/OMIA.py joining animal phenotypes against curated
  * gene ids) is shuffling fact rows that will never match. A Bloom
  * filter of the dim keys is a few MB regardless of fact size; shipping
  * it to every executor and filtering at the scan turns the shuffle
  * volume from |fact| into |matching fact| at the price of one extra
  * pass over dim. False positives are eliminated by the real join that
  * follows, so results are exact — only the pruned volume is
  * probabilistic. This is the same plan Spark's AQE injects for
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, exposed here as a
  * deterministic operator the engine can apply to non-equi and
  * multi-stage pipelines where the optimizer's own heuristics refuse.
  *
  * The probe is a native Catalyst expression (`doGenCode`) so the
  * filter stays inside whole-stage codegen; the filter itself rides an
  * executor-local [[Broadcast]] handle, deserialized once per executor
  * rather than once per task.
  */
object BloomJoin {

  /** Build a Bloom filter over `dim.select(key)` with a distributed
    * tree-merge (no driver-side row traffic; the driver only merges
    * O(log partitions) pre-merged filters of fixed bit size). */
  def keyBloom(dim: DataFrame, key: String, expectedItems: Long,
               fpp: Double = 0.01): BloomFilter = {
    val kc = dim.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(key).cast(LongType)
      case StringType => col(key)
      case other => throw new IllegalArgumentException(
        s"bloom key must be integral or string, got $other")
    }
    val rows = dim.select(kc).na.drop
    val isLong = rows.schema.head.dataType == LongType
    rows.rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      (bf, row) => {
        if (isLong) bf.putLong(row.getLong(0)) else bf.putString(row.getString(0))
        bf
      },
      (a, b) => { a.mergeInPlace(b); a })
  }

  /** `might_contain(bloom, key)` as a codegen'd Column predicate. */
  def mightContain(bloom: Broadcast[BloomFilter], key: Column): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(key), bloom))

  /** Fact pruned to keys that might appear in `dim(dimKey)`. Exactness
    * contract: superset of the matching fact rows — always follow with
    * the real join. */
  def pruneFact(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
                expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = keyBloom(dim, dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    fact.filter(mightContain(bc, col(factKey)))
  }

  /** Exact inner equi-join with bloom pre-pruning of the fact side.
    * The join condition is frame-qualified: `col(factKey) === col(dimKey)`
    * is ambiguous when the two key names coincide or either frame also
    * carries the other's column. */
  def join(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
           expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = pruneFact(fact, factKey, dim, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}

/** Probe a broadcast Bloom filter; integral keys probe as long, string
  * keys probe their UTF-8 bytes (same encoding `putString` inserts). */
case class BloomMightContainExpr(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  // resolved lazily: at construction time the child may still be an
  // unresolved attribute with no dataType
  private lazy val isLong = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType => false
    case other => throw new IllegalArgumentException(
      s"might_contain key must be integral or string, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"might_contain key must be integral or string, got $other")
    }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(key: Any): Any =
    if (isLong) bloom.value.mightContainLong(key.asInstanceOf[Number].longValue())
    else bloom.value.mightContainBinary(
      key.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one filter handle per executor: the broadcast is a reference object
    // in the generated class; .value() resolves against the local block
    // manager, not the task closure
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val bfType = classOf[BloomFilter].getName
    nullSafeCodeGen(ctx, ev, k => {
      val probe =
        if (isLong) s"(($bfType) $bcRef.value()).mightContainLong((long) $k)"
        else s"(($bfType) $bcRef.value()).mightContainBinary($k.getBytes())"
      s"${ev.value} = $probe;"
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "might_contain"
}
