package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — the "attach the most recent dimension
  * row at or before each event" operator a training-data pipeline needs
  * for point-in-time-correct feature joins.
  *
  * The reference has no as-of operator (SURVEY §2.5 notes: no as-of
  * joins); this is one of the brief's named scale extensions.
  *
  * Implementation is deliberately NOT a join: both sides are tagged and
  * unioned, then one per-key window sorted by (ts, side) carries the last
  * seen right-side payload forward onto each left row
  * (`last(..., ignoreNulls)` over an unbounded-preceding frame). That is
  *   - one shuffle on the key (no build side, no broadcast requirement),
  *   - linear in |L|+|R| (a windowed scan, never |L|×|R| candidates),
  *   - skew-tolerant the same way any sort-based window is,
  * which survives a 100 TB left side where a per-key range join or a
  * "latest snapshot ≤ t" correlated subquery would not. The payload rides
  * as ONE struct column so a null field inside a right row cannot be
  * back-filled from an older row (column-wise fill would diverge from
  * row-wise as-of semantics).
  *
  * Tie semantics match DuckDB ASOF JOIN (`l.ts >= r.ts`): a right row at
  * exactly the left timestamp matches. Rows on the right side must be
  * unique per (key, ts) for the result to be deterministic — pre-aggregate
  * otherwise (the window tie-break between equal right rows is arbitrary).
  */
object AsofJoin {

  /** For each left row, attach all non-key columns of the most recent
    * right row with `right(rightTs) <= left(leftTs)` on the same key
    * (`direction = "backward"`, the default), or the earliest right row
    * with `right(rightTs) >= left(leftTs)` (`direction = "forward"`).
    * Left rows with no matching right row keep null payloads (left join).
    *
    * `right`'s non-key columns (including `rightTs`) must be disjoint
    * from `left`'s column names — rename before calling.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           direction: String = "backward"): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTs), s"right side must carry $rightTs")
    require(left.columns.intersect(payload).isEmpty,
      s"left/right non-key columns must be disjoint, clash: ${left.columns.intersect(payload).mkString(",")}")
    val leftCols = left.columns.toSeq

    val lTagged = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payload.map(col): _*).schema.fields)))
    val rTagged = right
      .withColumn("__asof_ts", col(rightTs))
      .withColumn("__asof_side", lit(0))
      .withColumn("__asof_payload", struct(payload.map(col): _*))
      .drop(payload: _*)

    val ordered = direction match {
      case "backward" => Seq(col("__asof_ts").asc, col("__asof_side").asc)
      case "forward"  => Seq(col("__asof_ts").desc, col("__asof_side").asc)
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward, got $other")
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__asof_payload", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__asof_payload.$c").as(c)): _*)
  }
}
