package graft

import org.apache.spark.sql.functions._

import graft.core.Digest
import graft.emit.{Association, ColumnEmit}
import graft.testing.GraphEquality

/** Column-native emitters must produce exactly the triple sets of the
  * general `Row => Seq[Triple]` library. */
class EmitColumnSpec extends SparkSpec {
  import spark.implicits._

  test("ColumnEmit.assocReified ≡ Association.triples (md5 ids) on real orders") {
    val base = Tables.orders(spark, sf).limit(200).select(
      concat(lit("EX:c"), col("o_custkey").cast("string")).as("sub"),
      concat(lit("EX:o"), col("o_orderkey").cast("string")).as("obj"),
      col("o_totalprice").as("score"))
    val colForm = ColumnEmit.assocReified(base, "EX:src",
      col("sub"), lit("EXP:placed"), col("obj"),
      source = Some("EX:src"), score = Some(col("score")))
    val rowForm = base.as[(String, String, Double)].flatMap { case (sub, obj, tp) =>
      Association("EX:src", sub, "EXP:placed", obj,
        sources = Seq("EX:src"), score = Some(tp),
        explicitId = Some("_:" + Digest.assocIdScalaMd5("EX:src", sub, "EXP:placed", obj))
      ).triples
    }.toDF()
    val d = GraphEquality.diff(colForm, rowForm)
    assert(d.isEqual, d.report)
  }

  test("ColumnEmit.g2pAssoc ≡ Assoc.g2p (md5 ids) incl. per-row-optional qualifiers") {
    val base = Tables.orders(spark, sf).limit(300).select(
      concat(lit("EX:gt"), col("o_custkey").cast("string")).as("gt"),
      concat(lit("EX:ph"), col("o_orderkey").cast("string")).as("ph"),
      concat(lit("EX:st_"), col("o_orderstatus")).as("st"),
      when(col("o_orderstatus") === "F", lit("EX:st_final")).as("en"),
      when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"),
        concat(lit("EX:env"), substring(col("o_orderpriority"), 1, 1))).as("env"))
    val colForm = graft.emit.ColumnEmit.g2pAssoc(base, "EX:g2p",
      col("gt"), col("ph"), col("st"), col("en"), col("env"))
    val rowForm = base.as[(String, String, String, Option[String], Option[String])]
      .flatMap { case (gt, ph, st, en, env) =>
        graft.emit.Assoc.g2p("EX:g2p", gt, ph, startStage = Some(st),
          endStage = en, environment = env, digest = Digest.md5IdScala)
      }.toDF()
    val d = GraphEquality.diff(colForm, rowForm)
    assert(d.isEqual, d.report)
  }

  test("ColumnEmit.d2pAssoc ≡ Assoc.d2p (md5 ids) incl. optional onset") {
    val base = Tables.orders(spark, sf).limit(300).select(
      concat(lit("EX:dz"), col("o_custkey").cast("string")).as("dz"),
      concat(lit("EX:hp"), col("o_orderkey").cast("string")).as("hp"),
      when(col("o_orderstatus") === "O", lit("EX:onset_early")).as("onset"),
      concat(substring(col("o_orderpriority"), 1, 1), lit("/5")).as("freq"))
    val colForm = graft.emit.ColumnEmit.d2pAssoc(base, "EX:d2p",
      col("dz"), col("hp"), col("onset"), col("freq"))
    val rowForm = base.as[(String, String, Option[String], String)]
      .flatMap { case (dz, hp, onset, freq) =>
        graft.emit.Assoc.d2p("EX:d2p", dz, hp, onset = onset,
          frequency = Some(freq), digest = Digest.md5IdScala)
      }.toDF()
    val d = GraphEquality.diff(colForm, rowForm)
    assert(d.isEqual, d.report)
  }

  test("NtDirect.spo: every make_spo inference branch (ClinVar.py:88-158)") {
    import graft.sinks.NtDirect
    val cm = graft.engine.Runner.curieMap
    def render(s: String, p: String, o: String): String =
      Seq((s, p, o)).toDF("s", "p", "o")
        .select(NtDirect.spo(cm)(col("s"), col("p"), col("o")))
        .as[String].head()
    // 'a' sugar + CURIE object
    assert(render("ClinVarVariant:7", "a", "SO:0001583") ==
      "<http://identifiers.org/clinvar.record/7> " +
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> " +
      "<http://purl.obolibrary.org/obo/SO_0001583> .")
    // all-digits → xsd:integer; decimal → xsd:double
    assert(render("EX:v", "EX:stars", "4").endsWith(
      "\"4\"^^<http://www.w3.org/2001/XMLSchema#integer> ."))
    assert(render("EX:v", "EX:freq", "0.0042").endsWith(
      "\"0.0042\"^^<http://www.w3.org/2001/XMLSchema#double> ."))
    // string literal with the reference's escaping: enclosing quotes
    // stripped, backslash doubled, inner quotes flattened to apostrophes
    assert(render("EX:v", "rdfs:label", "\"say \"hi\" c:\\tmp\"") ==
      "<https://example.org/id/v> " +
      "<http://www.w3.org/2000/01/rdf-schema#label> " +
      "\"say 'hi' c:\\\\tmp\" .")
    // bnodes pass through unexpanded in subject and object position
    assert(render("_:b123", "EX:assertion_of", "_:b456") ==
      "_:b123 <https://example.org/id/assertion_of> _:b456 .")
    // a colon-bearing string whose tail is not CURIE-shaped stays literal
    assert(render("EX:v", "EX:note", "time: 5 pm").startsWith(
      "<https://example.org/id/v> <https://example.org/id/note> \"time:"))
  }

  test("ColumnEmit.classPattern ≡ Model.classTriples on nations") {
    val n = Tables.nation(spark, sf)
    val colForm = ColumnEmit.classPattern(
      n.select(concat(lit("EX:nation"), col("n_nationkey").cast("string")).as("id"),
        col("n_name").as("nm"),
        concat(lit("EX:region"), col("n_regionkey").cast("string")).as("sup")),
      col("id"), col("nm"), Some(col("sup")))
    val rowForm = SparkEntry.queries("r01_class_triples")(spark, sf)
    val d = GraphEquality.diff(colForm, rowForm)
    assert(d.isEqual, d.report)
  }
}
