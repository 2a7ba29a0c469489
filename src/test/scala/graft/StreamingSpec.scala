package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.core.Triple
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked hourly window agg over a replayed stream ≡ batch q24") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // materialize events (micros timestamps) as the stream source
    Tables.events(spark, sf).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = EventStream.readEvents(spark, s"$dir/in", schema)
    val q = EventStream.hourlyCounts(stream).writeStream
      .outputMode("complete").format("memory").queryName("hourly_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.sql("SELECT * FROM hourly_out")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("q24_window_hourly")(spark, sf)
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("mapGroupsWithState running per-user totals ≡ batch aggregation") {
    import graft.streaming.EventStream.{UserEvent, UserTotals}
    val dir = Files.createTempDirectory("graft-state").toString
    Tables.events(spark, sf).select("user_id", "value").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in").as[UserEvent]
    val q = EventStream.runningUserTotals(stream).writeStream
      .outputMode("update").format("memory").queryName("user_totals").start()
    q.processAllAvailable(); q.stop()

    // single replay batch → final state row per user
    val streamed = spark.sql(
      "SELECT user_id, events, round(total, 2) AS total FROM user_totals")
      .as[(Long, Long, Double)].collect().toSet
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("events"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("value"), 2).as("total"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("StreamedGraph-equivalent: triple batches → deduplicated NT files") {
    val dir = Files.createTempDirectory("graft-stream-nt").toString
    Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.str("HP:2", "rdfs:label", "two")).toDF()
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventStream.streamTriplesToNt(stream, s"$dir/out", s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val lines = spark.read.text(s"$dir/out").as[String].collect().toSeq
    assert(lines.size == 2) // per-batch dedup collapsed the duplicate
    assert(lines.forall(_.endsWith(" .")))
  }
}
