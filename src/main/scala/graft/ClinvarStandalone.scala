package graft

import org.apache.spark.sql.SparkSession

/** Stand-alone ClinVar-shape entry point (SURVEY §3.4): the reference
  * ships ClinVar as its own executable that bypasses dipper-etl and the
  * Graph classes, streaming functional `make_spo` NT lines straight to
  * a file (ClinVar.py:88-232, 826+). This is the Spark twin: the
  * NT-first column emitter (`sinks.NtDirect`) renders canonical lines
  * inside whole-stage codegen and the text sink writes them — no triple
  * relation, scan → concat → file (plus a widen exchange when the test
  * corpus arrives in fewer splits than cores).
  *
  * Usage: runMain graft.ClinvarStandalone <sfDir> <outDir>
  */
object ClinvarStandalone {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = SparkEntry.queries("p08_clinvar_standalone")(spark, sfDir)
    lines.write.mode("overwrite").text(outDir)
    println(s"wrote ${spark.read.text(outDir).count()} NT lines -> $outDir")
    spark.stop()
  }
}
