package graft.emit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Triple, Vocab}

/** HCLS 3-level dataset metadata + VoID statistics
  * (dipper/models/Dataset.py:19-528; VoID spec rows Dataset.py:123-127).
  *
  * The summary/version/distribution triples are a tiny driver-side Seq —
  * they describe one dataset, not data — while the VoID statistics are a
  * distributed aggregation over the triple relation itself
  * (`count`/`countDistinct`; `approx_count_distinct` is the documented
  * 100 TB mode, exact mode is used for correctness tests).
  */
object DatasetMeta {

  /** Summary → version → distribution description (HCLS levels). */
  def describe(datasetId: String, title: String, version: String,
               downloadUrl: String, retrievedOn: String): Seq[Triple] = {
    val versionId = s"$datasetId/$version"
    val distId = s"$versionId.nt"
    Seq(
      Triple.res(datasetId, Vocab.a, Vocab.voidDataset),
      Triple.str(datasetId, Vocab.label, title),
      Triple.res(versionId, Vocab.a, Vocab.voidDataset),
      Triple.res(versionId, "dcterms:isVersionOf", datasetId),
      Triple.typed(versionId, Vocab.version, version, null),
      Triple.res(distId, Vocab.a, Vocab.dcatDistribution),
      Triple.res(distId, "dcterms:isPartOf", versionId),
      Triple.res(distId, "dcat:downloadURL", downloadUrl),
      Triple.typed(distId, Vocab.retrievedOn, retrievedOn, "xsd:date"))
  }

  /** VoID statistics over a triple DataFrame (columns s,p,o,lit,dt). */
  def voidStats(triples: DataFrame, exact: Boolean = true): DataFrame = {
    def cd(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    triples.agg(
      count(lit(1)).as("triples"),
      cd("s").as("distinct_subjects"),
      cd("o").as("distinct_objects"),
      cd("p").as("properties"))
  }

  /** VoID stats rendered as metadata triples attached to a distribution. */
  def voidStatTriples(distId: String, triples: Long, distinctSubjects: Long,
                      distinctObjects: Long, properties: Long): Seq[Triple] =
    Seq(
      Triple.int(distId, Vocab.voidTriples, triples),
      Triple.int(distId, Vocab.voidDistinctSubjects, distinctSubjects),
      Triple.int(distId, Vocab.voidDistinctObjects, distinctObjects),
      Triple.int(distId, Vocab.voidProperties, properties))
}
