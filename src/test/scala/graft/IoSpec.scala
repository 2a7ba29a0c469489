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
    // used-prefix pruning (RDFGraph.py:199-205): unreferenced namespaces
    // must not be declared
    assert(!text.contains("@prefix faldo:"))
    assert(text.contains("@prefix HP:"))
  }

  test("N-Quads sink: NT line + graph label term") {
    val dir = tmpDir() + "/nq"
    val triples = Seq(Triple.res("HP:1", "rdf:type", "owl:Class")).toDF()
    TripleSinks.writeNq(triples, org.apache.spark.sql.functions.lit("EX:g1"), dir)
    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.length == 1)
    assert(lines.head ==
      "<http://purl.obolibrary.org/obo/HP_1> " +
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> " +
      "<http://www.w3.org/2002/07/owl#Class> " +
      "<https://example.org/id/g1> .")
  }

  test("RDF/XML sink: subject-grouped descriptions, used namespaces, escaping") {
    val dir = tmpDir() + "/rdfxml"
    val triples = Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.typed("HP:1", "rdfs:label", "a<b&c", "xsd:string"),
      Triple.res("_:b1", "rdf:type", "owl:Class")).toDF()
    TripleSinks.writeRdfXml(triples, dir)
    // concatenate part files in name order (what a downstream `cat
    // part-*` consumer sees) — spark.read.text does not preserve order
    import scala.jdk.CollectionConverters._
    val text = java.nio.file.Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString)
      .map(p => Files.readString(p).stripSuffix("\n")).mkString("\n")
    assert(text.startsWith("<?xml"))
    assert(text.contains("""xmlns:HP="http://purl.obolibrary.org/obo/HP_""""))
    assert(!text.contains("xmlns:faldo"))
    assert(text.contains("""<rdf:Description rdf:about="http://purl.obolibrary.org/obo/HP_1">"""))
    assert(text.contains("""<rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>"""))
    assert(text.contains(
      """<rdfs:label rdf:datatype="http://www.w3.org/2001/XMLSchema#string">a&lt;b&amp;c</rdfs:label>"""))
    // bnode subjects are skolemized like the NT sink
    assert(text.contains(".well-known/genid/b1"))
    assert(text.trim.endsWith("</rdf:RDF>"))
    // well-formedness: parses with the JDK XML parser
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(text.getBytes("UTF-8")))
  }

  test("tar member extraction (ustar reader vs GNU tar archives)") {
    import scala.sys.process._
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/genes.tsv"), "G1\tabc\nG2\tdef\n")
    Files.writeString(Paths.get(s"$dir/other.txt"), "ignored\n")
    // plain and gzipped archives, created by the system tar (independent
    // implementation of the same public format)
    assert(Process(Seq("tar", "cf", s"$dir/a.tar", "genes.tsv", "other.txt"),
      new java.io.File(dir)).! == 0)
    assert(Process(Seq("tar", "czf", s"$dir/a.tar.gz", "genes.tsv", "other.txt"),
      new java.io.File(dir)).! == 0)
    assert(graft.sources.TarSource.list(s"$dir/a.tar") ==
      Seq("genes.tsv", "other.txt"))
    for (arc <- Seq("a.tar", "a.tar.gz")) {
      val out = graft.sources.TarSource.extractMember(
        s"$dir/$arc", "genes.tsv", s"$dir/x_$arc")
      assert(Files.readString(out) == "G1\tabc\nG2\tdef\n")
    }
    // second member reachable after skipping the first
    val out2 = graft.sources.TarSource.extractMember(
      s"$dir/a.tar.gz", "other.txt", s"$dir/y")
    assert(Files.readString(out2) == "ignored\n")
    intercept[java.io.FileNotFoundException] {
      graft.sources.TarSource.extractMember(s"$dir/a.tar", "nope", s"$dir/z")
    }
  }

  test("archive cache: hit on unchanged archive, re-extract on refresh") {
    import graft.sources.ArchiveCache
    val dir = tmpDir()
    val zip = s"$dir/data.zip"
    def writeZip(content: String): Unit = {
      val z = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zip))
      z.putNextEntry(new java.util.zip.ZipEntry("member.tsv"))
      z.write(content.getBytes("UTF-8")); z.closeEntry(); z.close()
    }
    var extracts = 0
    def cached(): java.nio.file.Path =
      ArchiveCache.cachedExtract(zip, s"graft_test_${dir.hashCode}",
        "member.tsv") { scratch =>
        extracts += 1
        graft.sources.ZipSource.extractMember(zip, scratch)
      }
    writeZip("v1\n")
    assert(Files.readString(cached()) == "v1\n")
    assert(Files.readString(cached()) == "v1\n" && extracts == 1) // cache hit
    // refreshed archive at the SAME path (new size/mtime) must re-extract,
    // not serve the stale member forever
    writeZip("v2 longer\n")
    Files.setLastModifiedTime(Paths.get(zip),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(Paths.get(zip)).toMillis + 5000))
    assert(Files.readString(cached()) == "v2 longer\n" && extracts == 2)
    // a torn extraction never lands: on extractor failure the cached
    // path stays absent and the next call retries
    Files.setLastModifiedTime(Paths.get(zip),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(Paths.get(zip)).toMillis + 10000))
    intercept[RuntimeException] {
      ArchiveCache.cachedExtract(zip, s"graft_test_${dir.hashCode}",
        "member.tsv") { scratch =>
        Files.writeString(Paths.get(scratch, "member.tsv"), "partial")
        throw new RuntimeException("mid-copy crash")
      }
    }
    assert(Files.readString(cached()) == "v2 longer\n" && extracts == 3)
  }

  test("biomart query construction + response scan") {
    import graft.sources.Biomart
    val q = Biomart.buildQuery("hsapiens_gene_ensembl",
      Seq("ensembl_gene_id", "hgnc_id"))
    // same document shape as the reference builder (Ensembl.py:273-286)
    assert(q.startsWith("""<?xml version="1.0" encoding="UTF-8"?><!DOCTYPE Query>"""))
    assert(q.contains("""formatter="TSV" header="1" uniqueRows="1" count="0""""))
    assert(q.contains("""<Dataset name="hsapiens_gene_ensembl" interface="default">"""))
    assert(q.contains("""<Attribute name="ensembl_gene_id"/><Attribute name="hgnc_id"/>"""))
    javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        q.replace("<!DOCTYPE Query>", "").getBytes("UTF-8")))
    val url = Biomart.requestUrl("http://ensembl.org", q)
    assert(url.startsWith("http://ensembl.org/biomart/martservice?query=%3C%3Fxml"))
    assert(!url.drop("http://".length).contains("<"))

    // response scan: header row is re-mapped to attribute names
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/resp.tsv"),
      "Gene stable ID\tHGNC ID\nENSG1\tHGNC:5\nENSG2\tHGNC:6\n")
    val df = Biomart.scanResponse(spark, s"$dir/resp.tsv",
      Seq("ensembl_gene_id", "hgnc_id"))
    assert(df.columns.toSeq == Seq("ensembl_gene_id", "hgnc_id"))
    assert(df.count() == 2)
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
