package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Scalar-schema lint: the driver's checker sorts result rows with
    * pandas sort_values, which throws on array/map/struct columns —
    * refuse such an output at dump time so the failure is a loud,
    * local, named error instead of a harness-shape `err` row (how
    * s10 shipped red in rounds 8–9). */
  def assertScalarSchema(name: String,
                         schema: org.apache.spark.sql.types.StructType): Unit = {
    val nonScalar = schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType  => true
      case _: org.apache.spark.sql.types.MapType    => true
      case _: org.apache.spark.sql.types.StructType => true
      case _ => false
    })
    require(nonScalar.isEmpty,
      s"driver-gate query '$name' returns non-scalar column(s) " +
      nonScalar.map(f => s"${f.name}: ${f.dataType.simpleString}")
        .mkString(", ") +
      " — posexplode/flatten to scalar rows (driver checker cannot sort these)")
  }

  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable checkpoint dir for iterative operators (Dedup.clusters):
    // local tmp here; a cluster deployment points this at shared storage
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    new java.io.File(outDir).mkdirs()
    // optional trailing args: run only the named queries (local iteration)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertScalarSchema(name, df.schema)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
