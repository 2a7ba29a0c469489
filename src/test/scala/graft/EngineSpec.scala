package graft

import java.nio.file.Files

import graft.engine.{PropertyAxioms, Runner}

class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("runner: sources → NT + metadata + axioms + test subset (etl lifecycle)") {
    val out = Files.createTempDirectory("graft-run").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("nation_classes", "order_assocs"), out), sf)
    assert(results.map(_.name) == Seq("nation_classes", "order_assocs"))
    assert(results.forall(_.triples > 0))

    val nt = spark.read.text(s"$out/nation_classes.nt").as[String].collect()
    // class triples present and IRIs expanded
    assert(nt.exists(_.contains("<http://www.w3.org/2002/07/owl#Class>")))
    // dataset metadata graph unioned in (HCLS pattern)
    assert(nt.exists(_.contains("void#Dataset")))
    // property axioms post-pass typed the used predicates
    assert(nt.exists(l => l.contains("rdf-schema#label") &&
      l.contains("AnnotationProperty")))
    // test-subset graph written and restricted
    val sub = spark.read.text(s"$out/nation_classes_test.nt").as[String].collect()
    assert(sub.nonEmpty && sub.forall(l =>
      l.startsWith("<https://example.org/id/nation0>") ||
      l.startsWith("<https://example.org/id/region0>")))
  }

  test("limit pushdown caps every input scan (--limit N)") {
    val out = Files.createTempDirectory("graft-run-lim").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("order_assocs"), out, limit = Some(5)), sf)
    // 5 orders × 7 triples + metadata(9) + axioms — well under unlimited
    assert(results.head.triples < 70)
  }

  test("unknown source name fails like dipper-etl source validation") {
    intercept[IllegalArgumentException] {
      Runner.run(spark, Runner.RunConfig(Seq("nope"), "/tmp/x"), sf)
    }
  }

  test("axiom classification covers annotation/datatype/object splits") {
    val t = SparkEntry.queries("r02_assoc_reified")(spark, sf)
    val ax = PropertyAxioms.axiomTriples(t)
      .select("s", "o").as[(String, String)].collect().toMap
    assert(ax("EXP:score") == "owl:DatatypeProperty")
    assert(ax("dc:source") == "owl:AnnotationProperty")
    assert(ax("OBAN:association_has_subject") == "owl:ObjectProperty")
  }
}
