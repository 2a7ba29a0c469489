package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusRelease, Dedup}

/** Golden end-to-end corpus-release recipe: exact keep-best dedup →
  * near-dup clusters → soft weights → leak-free split → deterministic
  * JSONL shards, over a corpus constructed so every stage's answer is
  * known in closed form.
  *
  * Corpus: 10 vocabulary-disjoint near-dup pairs (12 shared words, one
  * differing tail word → shingle Jaccard 9/11 ≈ 0.818 > 0.8), each of
  * the 20 contents delivered twice (crawl + curated). So: 40 docs →
  * 20 exact-dedup survivors (the curated copies) → 10 clusters of 2 →
  * weight 0.5 everywhere → 10 atomic split decisions.
  */
class RecipeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = {
    val rows = for {
      p <- 0 until 10
      b <- Seq(0, 1) // near-dup variant within the pair
      (src, idOff) <- Seq(("crawl", 0L), ("curated", 100L))
    } yield {
      val words = (0 until 11).map(i => s"v${p}_$i") :+
        (if (b == 0) s"v${p}_11" else s"v${p}_x")
      (4L * p + b + idOff, words.mkString(" "), src)
    }
    rows.toDF("doc_id", "text", "source")
  }

  /** Scala replica of the TextOps.deterministicShuffle md5 arithmetic —
    * the independent oracle for the pinned shard manifest. */
  private def expectedManifest(ids: Seq[Long], seed: String, shardRows: Long,
                               buckets: Int): Map[Long, (Long, Long, Long)] = {
    val h = ids.map { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((seed + id).getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> java.lang.Long.parseLong(hex.take(15), 16)
    }.toMap
    val pos = ids.groupBy(id => h(id) % buckets).flatMap { case (bucket, members) =>
      members.sortBy(id => (h(id), id)).zipWithIndex.map { case (id, rank) =>
        id -> (rank.toLong * buckets + bucket)
      }
    }
    pos.values.groupBy(_ / shardRows).map { case (shard, ps) =>
      shard -> ((ps.size.toLong, ps.min, ps.max))
    }
  }

  test("corpus release: dedup → weights → split → shards, manifest pinned") {
    val docs = corpus()
    val prio = when($"source" === "curated", 1).otherwise(2)
    val planned = CorpusRelease.plan(docs, "doc_id", "text", prio,
        seed = "rel", n = 3, threshold = 0.8, pctTrain = 60, pctVal = 20)
      .select($"doc_id", $"source", $"n_copies", $"cluster",
        $"cluster_size", $"weight", $"split")
      .as[(Long, String, Long, Long, Long, Double, String)].collect()

    // exact dedup: the 20 curated copies survive, each covering 2 copies
    assert(planned.length == 20)
    assert(planned.forall(_._2 == "curated"))
    assert(planned.forall(_._3 == 2L))
    assert(planned.map(_._1).toSet == (0 until 10).flatMap(p =>
      Seq(4L * p + 100, 4L * p + 101)).toSet)
    // near-dup clusters: each pair collapses to rep = 4p+100, weight 1/2,
    // so total training mass = number of distinct contents = 10
    assert(planned.forall(r => r._4 == ((r._1 - 100) / 4) * 4 + 100))
    assert(planned.forall(r => r._5 == 2L && r._6 == 0.5))
    assert(math.abs(planned.map(_._6).sum - 10.0) < 1e-9)
    // leak-free: both members of every cluster share the split
    planned.groupBy(_._4).values.foreach { members =>
      assert(members.map(_._7).toSet.size == 1, members.mkString(", "))
    }

    // release: train split lands as shards; manifest matches the
    // independent Scala replica of the md5 shard arithmetic
    val out = java.nio.file.Files.createTempDirectory("graft-release").toString
    val manifest = CorpusRelease.release(spark, docs, "doc_id", "text", prio,
        seed = "rel", outDir = out, shardRows = 4,
        threshold = 0.8, pctTrain = 60, pctVal = 20, buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val trainIds = planned.filter(_._7 == "train").map(_._1).toSeq
    assert(trainIds.nonEmpty)
    assert(manifest == expectedManifest(trainIds, "rel", 4L, 4))

    // byte-determinism (the t22 contract): a second write with a
    // different upstream partitioning produces identical shard FILES,
    // not just identical membership — in-file order is training order
    val out2 = java.nio.file.Files.createTempDirectory("graft-release2").toString
    CorpusRelease.release(spark, docs.repartition(7), "doc_id", "text", prio,
      seed = "rel", outDir = out2, shardRows = 4,
      threshold = 0.8, pctTrain = 60, pctVal = 20, buckets = 4)
    def shardBytes(dir: String): Map[String, Seq[String]] =
      new java.io.File(dir).listFiles.filter(_.getName.startsWith("shard="))
        .map { d =>
          val parts = d.listFiles.filter(_.getName.endsWith(".json"))
          assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
          d.getName -> scala.io.Source.fromFile(parts.head).getLines().toSeq
        }.toMap
    assert(shardBytes(out) == shardBytes(out2))
  }
}
