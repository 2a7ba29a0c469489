package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.{CurieMap, NT}

/** Triple-relation sinks (SURVEY §2.2).
  *
  * N-Triples is the canonical sink (order-free set of lines — matches the
  * reference's StreamedGraph contract "a downstream process will sort then
  * uniquify", StreamedGraph.py:15-16): a map-only projection through
  * [[NT.lineCol]] with an explicit `dropDuplicates` standing in for the
  * rdflib store's set semantics. Turtle is a best-effort subject-grouped
  * serialization for eyeballing (the reference's golden-test fidelity
  * concern is sidestepped by comparing canonical NT sets — SURVEY §7).
  */
object TripleSinks {

  /** Project a (s,p,o,lit,dt) triple DataFrame to canonical NT lines. */
  def toNtLines(triples: DataFrame, cm: CurieMap = CurieMap.default): DataFrame = {
    val oTerm = when(col("lit"), col("o")).otherwise(cm.expandCol(col("o")))
    triples.select(NT.lineCol(cm.expandCol(col("s")), cm.expandCol(col("p")),
      oTerm, col("lit"), cm.expandCol(col("dt"))).as("value"))
  }

  /** Write deduplicated NT. `numFiles` controls output fan-in (None =
    * keep the natural partitioning — the right call at scale). */
  def writeNt(triples: DataFrame, path: String,
              cm: CurieMap = CurieMap.default,
              numFiles: Option[Int] = None): Unit = {
    val lines = toNtLines(
      triples.dropDuplicates("s", "p", "o", "lit", "dt"), cm)
    val out = numFiles.map(lines.coalesce).getOrElse(lines)
    out.write.mode(SaveMode.Overwrite).text(path)
  }

  /** NT partitioned by subject namespace prefix (the "partition by
    * source/taxon" posture, SURVEY §7): downstream consumers prune whole
    * directories (`prefix=HP/...`) instead of scanning the full graph,
    * and per-prefix files parallelize the downstream sort-unify step. */
  def writeNtPartitioned(triples: DataFrame, path: String,
                         cm: CurieMap = CurieMap.default): Unit = {
    val deduped = triples.dropDuplicates("s", "p", "o", "lit", "dt")
    val oTerm = when(col("lit"), col("o")).otherwise(cm.expandCol(col("o")))
    val lines = deduped.select(
      NT.lineCol(cm.expandCol(col("s")), cm.expandCol(col("p")),
        oTerm, col("lit"), cm.expandCol(col("dt"))).as("value"),
      when(col("s").startsWith("_:"), lit("bnode"))
        .otherwise(regexp_extract(col("s"), "^([A-Za-z0-9]+):", 1)).as("prefix"))
    lines.write.mode(SaveMode.Overwrite).partitionBy("prefix").text(path)
  }

  /** Best-effort Turtle: repartition by subject so each subject's triples
    * land in one partition, sort within partitions, assemble blocks with
    * `mapPartitions` (no driver collect — scales with data). Prefix
    * header uses the full CURIE map (used-prefix pruning would need a
    * second pass; acceptable for a debug/eyeball sink). */
  def writeTurtle(triples: DataFrame, path: String,
                  cm: CurieMap = CurieMap.default): Unit = {
    import triples.sparkSession.implicits._
    val spark = triples.sparkSession
    val header = cm.prefixes.toSeq.sorted
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("\n")
    val body: Dataset[String] = triples
      .select("s", "p", "o", "lit", "dt")
      .dropDuplicates()
      .repartition(col("s"))
      .sortWithinPartitions("s", "p", "o")
      .mapPartitions { rows =>
        val sb = new StringBuilder
        var cur: String = null
        var first = true
        rows.foreach { r =>
          val s = r.getString(0); val p = r.getString(1); val o = r.getString(2)
          val isLit = r.getBoolean(3); val dt = if (r.isNullAt(4)) null else r.getString(4)
          val oTerm =
            if (isLit && dt != null) "\"" + NT.escape(o) + "\"^^" + dt
            else if (isLit) "\"" + NT.escape(o) + "\""
            else o
          if (s != cur) {
            if (!first) sb.append(" .\n")
            sb.append(s).append(" ").append(p).append(" ").append(oTerm)
            cur = s; first = false
          } else {
            sb.append(" ;\n    ").append(p).append(" ").append(oTerm)
          }
        }
        if (!first) sb.append(" .\n")
        if (sb.isEmpty) Iterator.empty else Iterator(sb.toString)
      }
    val withHeader = spark.createDataset(Seq(header)).union(body)
    withHeader.write.mode(SaveMode.Overwrite).text(path)
  }

  /** Test-subset sink: the same pipeline filtered to configured ids
    * (testgraph semantics, Source.py:107-109). */
  def writeTestSubset(triples: DataFrame, testIds: Seq[String],
                      path: String, cm: CurieMap = CurieMap.default): Unit =
    writeNt(triples.filter(col("s").isin(testIds: _*)), path, cm)
}
