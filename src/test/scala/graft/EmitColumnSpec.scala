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
