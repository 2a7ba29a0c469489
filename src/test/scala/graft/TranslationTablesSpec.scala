package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{FlatYaml, TranslationTable}

/** Lint contract for the shipped translation tables, mirroring the
  * reference's supporting-artifact checks (Makefile:90-106 +
  * tests/test_trtable.py): no duplicate keys in any table, the global
  * table is a bimap (invertible — exactly one label per CURIE), and the
  * two-layer composition is closed (every local-table value is a global
  * key, so `resolve = global(local(word))` never silently passes a
  * vocabulary token through unresolved). Pure JVM — no Spark session.
  */
class TranslationTablesSpec extends AnyFunSuite {

  private val resDir = new File("src/main/resources/graft")
  private val globalFile = new File(resDir, "global_terms.yaml")
  private val localFiles: Seq[File] =
    new File(resDir, "tt").listFiles().filter(_.getName.endsWith(".yaml")).toSeq

  /** Raw entry list (key, value) per line — FlatYaml's map form would
    * silently collapse duplicate keys, which is exactly the lint target. */
  private def rawEntries(f: File): Seq[(String, String)] = {
    val Entry =
      """^\s*(?:"([^"]*)"|'([^']*)')\s*:\s*(?:"([^"]*)"|'([^']*)')\s*(?:#.*)?$""".r
    scala.io.Source.fromFile(f, "UTF-8").getLines().flatMap { line =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#") || t == "---") None
      else t match {
        case Entry(k1, k2, v1, v2) =>
          Some((Seq(k1, k2).find(_ != null).get, Seq(v1, v2).find(_ != null).get))
        case _ => fail(s"${f.getName}: unparseable line: $t")
      }
    }.toSeq
  }

  test("no duplicate keys in any shipped table (test_trtable.py:13-46)") {
    (globalFile +: localFiles).foreach { f =>
      val keys = rawEntries(f).map(_._1)
      val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
      assert(dups.isEmpty, s"${f.getName}: duplicate keys: ${dups.mkString(", ")}")
    }
  }

  test("global table is a bimap — one label per CURIE (test_trtable.py:48-66)") {
    val vals = rawEntries(globalFile).map(_._2)
    val dups = vals.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"global_terms.yaml: duplicate values: ${dups.mkString(", ")}")
  }

  test("every local value resolves through the global table (Source.py:718-796 compose)") {
    val globalKeys = rawEntries(globalFile).map(_._1).toSet
    localFiles.foreach { f =>
      val missing = rawEntries(f).map(_._2).filterNot(globalKeys.contains).distinct
      assert(missing.isEmpty,
        s"${f.getName}: values with no global entry: ${missing.mkString(", ")}")
    }
  }

  test("production scale: global ≥700 entries, ≥4 per-source locals") {
    assert(rawEntries(globalFile).size >= 700)
    assert(localFiles.size >= 4)
    localFiles.foreach(f => assert(rawEntries(f).nonEmpty, s"${f.getName} is empty"))
  }

  test("two-layer resolve composes local → global → CURIE") {
    val mgi = TranslationTable.forSource("mgi")
    assert(mgi.resolve("Homozygous") == "GENO:0000136")
    assert(mgi.resolve("Hemizygous X-linked") == "GENO:0000605")
    assert(mgi.resolve("Indeterminate") == "GENO:0000137")
    val ctd = TranslationTable.forSource("ctd")
    assert(ctd.resolve("therapeutic") == "RO:0002606")
    assert(ctd.resolve("marker/mechanism") == "RO:0002607")
    val omia = TranslationTable.forSource("omia")
    assert(omia.resolve("dog") == "NCBITaxon:9615")
    // global-layer direct hit still works through a local table
    assert(TranslationTable.forSource("zfin").resolve("gene") == "SO:0000704")
    // miss policies: mandatory raises, default substitutes
    intercept[NoSuchElementException](mgi.resolve("no-such-token"))
    assert(mgi.resolve("no-such-token", mandatory = false,
      default = Some("EX:unknown")) == "EX:unknown")
    // FlatYaml loads stay consistent with the raw-line lint view
    assert(FlatYaml.fromResource("/graft/global_terms.yaml").size ==
      rawEntries(globalFile).size)
  }
}
