package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join.
  *
  * The reference needs this once: UDP maps variant positions into gene
  * [start,end] ranges (reference: dipper/sources/UDP.py:330-447,628-648) —
  * done there with a driver-side dict scan. A naive Spark translation is a
  * theta join (`BroadcastNestedLoopJoin`) which is O(n·m) and falls over at
  * scale when neither side is broadcastable.
  *
  * This operator turns it into a shuffle-friendly *equi* join: each interval
  * is exploded onto the fixed-width buckets it overlaps, each point is
  * assigned its bucket, and the join runs on the bucket id with the exact
  * range predicate as a residual filter. Shuffle volume scales with
  * (intervals × interval_width/bucketWidth + points) instead of the cross
  * product, partitions by bucket (AQE handles skewed buckets), and both
  * sides stay in whole-stage codegen.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points(pointCol)` ∈
    * [`intervals(loCol)`, `intervals(hiCol)`] (inclusive both ends).
    * All three columns must be integral. `bucketWidth` should be on the
    * order of the typical interval width.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0)
    val b = lit(bucketWidth)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / b).cast("long"),
                       floor(col(hiCol) / b).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / b).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
