package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Plan audits for the persisted-index query paths: the round-11 claim
  * is that the PQ/IVFADC code tables' bucket layout feeds the
  * query-time joins/aggregations without re-shuffling corpus-sized
  * relations. These tests pin the executed plans to that shape.
  */
class IndexPlanSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("s12 indexed PQ query: code-side aggregation reuses the bucket layout") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-plan").toString
    Similarity.writePqIndex(emb, "vec_id", "embedding",
      "graft_pq_plan", s"$dir/idx", dim = 64, m = 4, ks = 16, buckets = 4)
    val q = Similarity.pqTopKIndexed(spark, "graft_pq_plan",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64, k = 3,
      m = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    // the codes side must NOT hash-exchange on its way into the
    // (qid, nid) aggregation: bucketing by nid already clusters it, so
    // the only exchanges allowed are the query-side broadcasts and the
    // k-row window's final single-partition step
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchangeLines.exists(_.contains("nid")),
      s"codes re-shuffled at query time:\n${exchangeLines.mkString("\n")}")
    spark.sql("DROP TABLE IF EXISTS graft_pq_plan")
    spark.sql("DROP TABLE IF EXISTS graft_pq_plan_codebook")
  }

  test("s14 indexed IVFADC query: probed-cell scan, no corpus-wide exchange before scoring") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-adc-plan").toString
    Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
      "graft_adc_plan", s"$dir/idx", dim = 64, nlist = 8, m = 4, ks = 16,
      buckets = 4)
    val q = Similarity.ivfadcTopKIndexed(spark, "graft_adc_plan",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", dim = 64, k = 3,
      nprobe = 4, m = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(1200))
    // probes and ADC tables broadcast; the codes relation streams from
    // its buckets into the joins — no assignment or encode stage
    assert(!plan.contains("d2"), s"encode ran at query time:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    spark.sql("DROP TABLE IF EXISTS graft_adc_plan")
    spark.sql("DROP TABLE IF EXISTS graft_adc_plan_codebook")
    spark.sql("DROP TABLE IF EXISTS graft_adc_plan_centroids")
  }
}
