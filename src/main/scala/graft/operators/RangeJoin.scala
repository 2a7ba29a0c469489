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
    val iv = bucketed(intervals, loCol, hiCol, b)
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / b).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Points contained in at least one interval — the left-semi twin of
    * [[pointInInterval]]. Output keeps `points`' columns only, each
    * qualifying row exactly once (no post-hoc dedup needed even when a
    * point hits several intervals), so "type every matched entity"
    * emission runs with ZERO shuffle when the interval side broadcasts.
    */
  def pointsInAnyInterval(points: DataFrame, intervals: DataFrame,
                          pointCol: String, loCol: String, hiCol: String,
                          bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0)
    val b = lit(bucketWidth)
    // rename to private names so the semi-join condition can't collide
    // with same-named point columns (BloomJoin ambiguity lesson)
    val iv = bucketed(
      intervals.select(col(loCol).as("__lo"), col(hiCol).as("__hi")),
      "__lo", "__hi", b)
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / b).cast("long"))
    pt.join(iv,
        pt("__bucket") === iv("__bucket") &&
          col(pointCol) >= col("__lo") && col(pointCol) <= col("__hi"),
        "left_semi")
      .drop("__bucket")
  }

  /** Intervals containing at least one point — the other semi direction.
    * The interval side must be exploded onto buckets before the semi
    * join, so duplicate survivors (one per overlapped bucket) are
    * collapsed by a dedup over the interval's own columns; sized for the
    * dimension-like side of the join (the dedup shuffle is
    * |intervals|-bounded, never |points|-bounded).
    */
  def intervalsWithAnyPoint(intervals: DataFrame, points: DataFrame,
                            pointCol: String, loCol: String, hiCol: String,
                            bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0)
    val b = lit(bucketWidth)
    val iv = bucketed(intervals, loCol, hiCol, b)
    val pt = points.select(col(pointCol).as("__p"),
      floor(col(pointCol) / b).cast("long").as("__pbucket"))
    iv.join(pt,
        iv("__bucket") === pt("__pbucket") &&
          col("__p") >= col(loCol) && col("__p") <= col(hiCol),
        "left_semi")
      .drop("__bucket")
      .distinct()
  }

  /** Explode intervals onto the fixed-width buckets they overlap. An
    * inverted interval (hi < lo — sentinel rows, bad data) would make
    * `sequence` default to step -1 and blow up into |bucket(lo)-bucket(hi)|
    * rows that the residual predicate discards; no point satisfies
    * lo <= p <= hi there, so the null-rejecting pre-filter is
    * output-identical and bounded (mirrors plans/RangeJoinRewrite).
    */
  private def bucketed(intervals: DataFrame, loCol: String, hiCol: String,
                       b: Column): DataFrame =
    intervals.where(col(loCol) <= col(hiCol)).withColumn("__bucket",
      explode(sequence(floor(col(loCol) / b).cast("long"),
                       floor(col(hiCol) / b).cast("long"))))
}
