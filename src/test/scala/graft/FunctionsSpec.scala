package graft

import org.apache.spark.sql.functions._

import graft.functions.{CurieExpressions, Roman}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("curie expressions: expand/contract as Columns, codegen path") {
    val df = Seq("HP:123", "http://purl.obolibrary.org/obo/HP_999",
      "http://elsewhere/x", "_:b7").toDF("c")
    val got = df.select(
      CurieExpressions.curie_expand($"c").as("iri")).as[String].collect().toSeq
    assert(got(0) == "http://purl.obolibrary.org/obo/HP_123")
    assert(got(1) == "http://purl.obolibrary.org/obo/HP_999")
    assert(got(3).contains("/.well-known/genid/b7"))
    val back = df.select(CurieExpressions.curie_contract(
      CurieExpressions.curie_expand($"c")).as("c2")).as[String].collect().toSeq
    assert(back(0) == "HP:123")
    assert(back(2) == "http://elsewhere/x") // passthrough
  }

  test("SQL registration via GraftExtensions") {
    GraftExtensions.register(spark)
    Seq("HP:5").toDF("c").createOrReplaceTempView("curies")
    val got = spark.sql(
      "SELECT curie_contract(curie_expand(c)) AS c FROM curies")
      .as[String].head()
    assert(got == "HP:5")
  }

  test("column expansion matches Scala expansion on all routing branches") {
    import graft.core.CurieMap
    val cases = Seq("HP:123", "HP:1:2", "_:b1", "_b2", "_", "_:",
      "http://x/y", "ftp://f/z", "jdbc:pg://h/db", "unknown:q", "noColon")
    val got = cases.toDF("c")
      .select(CurieMap.default.expandCol($"c").as("e")).as[String].collect().toSeq
    assert(got == cases.map(CurieMap.default.expand))
  }

  test("roman numerals round-trip and reject malformed") {
    assert(Roman.toRoman(1987) == "MCMLXXXVII")
    assert(Roman.fromRoman("MCMLXXXVII").contains(1987))
    assert(Roman.fromRoman("xiv").contains(14))
    assert(Roman.fromRoman("IIII").isEmpty) // non-canonical
    assert(Roman.fromRoman("ABC").isEmpty)
    for (n <- 1 to 1000) assert(Roman.fromRoman(Roman.toRoman(n)).contains(n))
  }

  test("OMIM label cleanup (OMIM.py _cleanup_label / _get_alt_labels twins)") {
    import graft.functions.OmimLabel
    // abbreviation strip + roman conversion + small-word casing
    assert(OmimLabel.cleanupLabel("ACROCEPHALOSYNDACTYLY, TYPE V; ACS5") ==
      "Acrocephalosyndactyly, Type 5")
    // non-roman suffix kept (IIIB → 3B); first word exempt from roman
    assert(OmimLabel.cleanupLabel("MUCOPOLYSACCHARIDOSIS, TYPE IIIB") ==
      "Mucopolysaccharidosis, Type 3B")
    assert(OmimLabel.cleanupLabel("X INACTIVATION, FAMILIAL SKEWED, 1") ==
      "X Inactivation, Familial Skewed, 1")
    // interior conjunctions/preps/articles lowercase; roman ≥100 kept
    assert(OmimLabel.cleanupLabel("DEAFNESS OF THE EAR") == "Deafness of the Ear")
    // words that merely look roman-prefixed stay words
    assert(OmimLabel.cleanupLabel("SYNDROME MIXED DISEASE") ==
      "Syndrome Mixed Disease")
    // alt titles: ';;' split + ', INCLUDED' strip, each cleaned
    assert(OmimLabel.altLabels(
      "ACS5;;\nACS V;;\nNOACK SYNDROME, INCLUDED") ==
      Seq("Acs5", "Acs 5", "Noack Syndrome"))
  }

  test("map_lookup: hash probe ≡ element_at(typedLit), codegen + interpreted") {
    import org.apache.spark.sql.functions._
    import graft.functions.MapExpressions.map_lookup
    val dict = Map("a" -> "1", "b" -> "2", "weird key" -> "v")
    val df = Seq("a", "b", "weird key", "missing", null)
      .toDF("k")
    val got = df.select(map_lookup(dict, $"k", "spec").as("v"))
      .as[Option[String]].collect().toSeq
    val ref = df.select(element_at(typedLit(dict), $"k").as("v"))
      .as[Option[String]].collect().toSeq
    assert(got == ref)
    assert(got == Seq(Some("1"), Some("2"), Some("v"), None, None))
    // interpreted path (no codegen) agrees
    val interp = df.filter(map_lookup(dict, $"k", "spec") === "2")
      .as[String].collect().toSeq
    assert(interp == Seq("b"))
    // the big-table production path: resolveCol over the global table
    val tt = graft.core.TranslationTable.default
    val sample = tt.global.keys.take(50).toSeq
    val viaCol = sample.toDF("w")
      .select(tt.resolveCol($"w").as("r")).as[String].collect().toSeq
    assert(viaCol == sample.map(w => tt.resolve(w)))
  }

  test("matrix-carrying vector expressions compare structurally (ADVICE r12)") {
    import graft.functions.{VecBestCellExpr, VecPqCodesExpr}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val child = BoundReference(0, ArrayType(DoubleType), nullable = false)
    def mkBest() = VecBestCellExpr(child, Array(1L, 2L),
      Array(Array(1.0, 2.0), Array(3.0, 4.0)), Array(0.5, 0.6))
    // two instances built from DISTINCT array objects: the default
    // case-class equals is reference-based and would miss this —
    // Catalyst canonicalization / CSE / exchange reuse key on equals
    val (a, b) = (mkBest(), mkBest())
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    assert(a != mkBest().copy(cns = Array(0.5, 0.7)))
    def mkPq() = VecPqCodesExpr(child, 2, 1,
      Array(Array(1, 2), Array(3, 4)),
      Array(Array(Array(1.0), Array(2.0)), Array(Array(3.0), Array(4.0))),
      Array(Array(1.0, 4.0), Array(9.0, 16.0)))
    val (p, q) = (mkPq(), mkPq())
    assert(p == q && p.hashCode == q.hashCode)
    assert(p.semanticEquals(q))
    assert(p != mkPq().copy(m = 1))
  }
}
