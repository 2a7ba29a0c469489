package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._

import graft.core.Triple
import graft.sources.{DelimitedSource, SourceFile, XmlDumpSource}
import graft.sinks.TripleSinks

class IoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-io").toString

  test("delimited source: declared schema + header validation (check_fileheader)") {
    val dir = tmpDir()
    val p = s"$dir/f.tsv"
    Files.writeString(Paths.get(p),
      "id\tname\tscore\nA:1\talpha\t10\nA:2\tbeta\t20\n")
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("score", IntegerType)))
    val df = DelimitedSource.read(spark, SourceFile(p, schema))
    assert(df.schema("score").dataType == IntegerType)
    assert(df.count() == 2)

    // missing declared column → hard failure
    val bad = StructType(schema.fields :+ StructField("missing", StringType))
    intercept[DelimitedSource.HeaderMismatch] {
      DelimitedSource.read(spark, SourceFile(p, bad))
    }
    // extra actual column → warning only
    val warns = DelimitedSource.checkFileHeader(Seq("id"), Seq("id", "extra"))
    assert(warns.exists(_.contains("extra")))
    // reorder → warning only
    assert(DelimitedSource.checkFileHeader(Seq("a", "b"), Seq("b", "a")).nonEmpty)
  }

  test("gzip member scan: Spark reads .gz natively") {
    val dir = tmpDir()
    val p = s"$dir/f.tsv.gz"
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(p))
    out.write("id\tv\nX:1\t5\n".getBytes("UTF-8")); out.close()
    val schema = StructType(Seq(StructField("id", StringType), StructField("v", IntegerType)))
    assert(DelimitedSource.read(spark, SourceFile(p, schema)).count() == 1)
  }

  test("XML dump scan (process_xml_table shape)") {
    val dir = tmpDir()
    val p = s"$dir/dump.xml"
    Files.writeString(Paths.get(p),
      """<?xml version="1.0"?>
        |<database>
        | <table_data name="genes">
        |  <row><field name="id">G1</field><field name="sym">abc</field></row>
        |  <row><field name="id">G2</field><field name="sym">def</field></row>
        | </table_data>
        | <table_data name="other">
        |  <row><field name="id">X</field></row>
        | </table_data>
        |</database>""".stripMargin)
    val df = XmlDumpSource.read(spark, Seq(p), "genes", Seq("id", "sym", "absent"))
    val rows = df.as[(String, String, String)].collect().toSet
    assert(rows == Set(("G1", "abc", null), ("G2", "def", null)))
  }

  test("NT sink: dedup + canonical lines round-trip") {
    val dir = tmpDir() + "/nt"
    val triples = Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.res("HP:1", "rdf:type", "owl:Class"), // dup
      Triple.str("HP:1", "rdfs:label", "say \"hi\"\n")).toDF()
    TripleSinks.writeNt(triples, dir, numFiles = Some(1))
    val lines = spark.read.text(dir).as[String].collect().toSet
    assert(lines.size == 2)
    assert(lines.contains(
      "<http://purl.obolibrary.org/obo/HP_1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> ."))
    assert(lines.exists(_.contains("\"say \\\"hi\\\"\\n\"")))
  }

  test("partitioned NT sink: prefix directories, prunable") {
    val dir = tmpDir() + "/ntp"
    val triples = Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.res("MP:2", "rdf:type", "owl:Class"),
      Triple.res("_:b9", "rdf:type", "owl:Class")).toDF()
    TripleSinks.writeNtPartitioned(triples, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("prefix=HP", "prefix=MP", "prefix=bnode"))
    // directory pruning: reading one partition sees only its triples
    assert(spark.read.text(s"$dir/prefix=HP").count() == 1)
  }

  test("Turtle sink: prefix header + subject grouping") {
    val dir = tmpDir() + "/ttl"
    val triples = Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.str("HP:1", "rdfs:label", "x"),
      Triple.res("HP:2", "rdf:type", "owl:Class")).toDF()
    TripleSinks.writeTurtle(triples, dir)
    val text = spark.read.text(dir).as[String].collect().mkString("\n")
    assert(text.contains("@prefix rdf:"))
    assert(text.contains("HP:1 rdf:type owl:Class ;") ||
           text.contains("HP:1 rdfs:label \"x\" ;"))
  }

  test("JSON payload scan + control-char scrub pre-pass") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/payload.json"),
      "{\"id\": \"OMIM:1\", \"name\": \"x\"}\n{\"id\": \"OMIM:2\", \"name\": \"y\"}\n")
    val df = graft.sources.JsonSource.read(spark, s"$dir/payload.json")
    assert(df.count() == 2 && df.columns.toSet == Set("id", "name"))

    Files.write(Paths.get(s"$dir/dirty.txt"),
      "abc\r\ndef\n".getBytes("UTF-8"))
    val clean = graft.sources.JsonSource.scrubbedText(spark, s"$dir/dirty.txt")
      .as[String].collect().toSet
    assert(clean == Set("abc", "def"))
  }

  test("dot export renders edges and literal boxes (rdf2dot equivalent)") {
    val dot = graft.sinks.DotExport.toDot(Seq(
      Triple.res("a", "p", "b"), Triple.str("a", "label", "L")).toDF())
    assert(dot.startsWith("digraph"))
    assert(dot.contains("\"a\" -> \"b\""))
    assert(dot.contains("shape=box"))
    intercept[IllegalArgumentException] {
      graft.sinks.DotExport.toDot(
        Tables.lineitem(spark, sf).selectExpr("'s' s", "'p' p", "'o' o", "false lit"),
        maxTriples = 10)
    }
  }

  test("test-subset sink filters to configured ids (testgraph semantics)") {
    val dir = tmpDir() + "/sub"
    val triples = Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.res("HP:2", "rdf:type", "owl:Class")).toDF()
    TripleSinks.writeTestSubset(triples, Seq("HP:1"), dir)
    assert(spark.read.text(dir).count() == 1)
  }
}
