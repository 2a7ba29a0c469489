package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Test-corpus table access (driver-generated parquet, see TESTDATA.md). */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")

  /** Orders widened through the scan guard — for queries that stack a
    * heavy synthesized projection (an ingest-shaped parse) directly on
    * the scan: the small parquet packs into one split, and without the
    * widen the parse serializes on one core (ScanStats.widen; the
    * barrier keeps downstream filters from sinking back below the
    * exchange). */
  def ordersWide(s: SparkSession, d: String): DataFrame =
    graft.operators.ScanStats.widen(orders(s, d))
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** `events.ts` normalization: the corpus has shipped the column as
    * parquet TIMESTAMP(NANOS) (read as long, truncated to micros —
    * DuckDB's ns→us behavior for positive epochs) and as TIMESTAMP(MICROS)
    * without UTC adjustment (Spark's TIMESTAMP_NTZ, which event-time
    * watermarks reject). Both land here as session-zoned TIMESTAMP; all
    * sessions pin spark.sql.session.timeZone=UTC so the NTZ cast is the
    * identity on the wall-clock value. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
