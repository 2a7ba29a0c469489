package graft.testing

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.NT
import graft.engine.Runner

/** Golden-corpus regeneration (the reference's expected-file refresh
  * flow for `tests/resources/<source>/{input,expected}` dirs): for each
  * corpus under `src/test/resources/golden/<source>/`, run the
  * registered source's read+transform over `input/`, expand CURIEs
  * through the production prefix map, and write the sorted canonical NT
  * to `expected/expected.nt`.
  *
  * Run after an INTENTIONAL behavior change, then review the diff like
  * any other code change:
  * {{{ sbt 'runMain graft.testing.GoldenGen' && git diff }}}
  * GoldenSpec fails on any unreviewed divergence.
  */
object GoldenGen {

  val corpusRoot = "src/test/resources/golden"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = new java.io.File(corpusRoot)
      require(root.isDirectory, s"run from the repo root: $corpusRoot missing")
      root.listFiles().filter(_.isDirectory).sortBy(_.getName).foreach { dir =>
        val source = Runner.registry(dir.getName)
        val triples = source.transform(spark,
          source.read(spark, s"${dir.getPath}/input"))
        val cm = Runner.curieMap
        val lines = triples
          .select(cm.expandCol(col("s")).as("s"), cm.expandCol(col("p")).as("p"),
            when(col("lit"), col("o")).otherwise(cm.expandCol(col("o"))).as("o"),
            col("lit"),
            when(col("dt").isNull, lit(null).cast("string"))
              .otherwise(cm.expandCol(col("dt"))).as("dt"))
          .distinct()
          .collect()
          .map(r => NT.term(r.getString(0), isLit = false, null) + " " +
            s"<${r.getString(1)}>" + " " +
            NT.term(r.getString(2), r.getBoolean(3), r.getString(4)) + " .")
          .sorted
        val out = Paths.get(dir.getPath, "expected", "expected.nt")
        Files.createDirectories(out.getParent)
        Files.write(out, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
        println(s"${dir.getName}: ${lines.length} triples -> $out")
      }
    } finally spark.stop()
  }
}
