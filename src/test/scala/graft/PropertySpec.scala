package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.core.{CurieMap, Digest, NT}
import graft.emit.Association
import graft.functions.Roman

/** Property-based checks (SURVEY §5: digest-id determinism, CURIE
  * round-trips, triple-emitter totality) — pure JVM, no Spark session.
  * The Scala twins are the semantics; their Column twins are pinned to
  * them by example-based tests in CoreSpec/FunctionsSpec. */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private val localName: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
      .map(_.mkString)

  test("CURIE expand∘contract is an IRI-level fixpoint for every prefix") {
    // contract may legally pick a DIFFERENT prefix whose namespace nests
    // inside another (longest-prefix rule) — the invariant is that the
    // contracted form expands back to the SAME IRI, for all 258 prefixes
    val cm = CurieMap.full
    val curies = for {
      pfx <- Gen.oneOf(cm.prefixes.keys.toSeq)
      sfx <- localName
    } yield s"$pfx:$sfx"
    check("curie fixpoint", Prop.forAll(curies) { c =>
      val iri = cm.expand(c)
      cm.contract(iri).exists(cm.expand(_) == iri)
    })
  }

  test("NT literal escaping is lossless (decodable) for arbitrary text") {
    def unescape(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case '\\' => sb.append('\\'); case '"' => sb.append('"')
            case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
            case 't' => sb.append('\t'); case c => sb.append('\\').append(c)
          }
          i += 2
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }
    check("nt escape", Prop.forAll { (s: String) =>
      val e = NT.escape(s)
      unescape(e) == s &&
        !raw"(?<!\\)(?:\\\\)*[\n\r\t]".r.findFirstIn(e).isDefined
    })
  }

  test("digest ids are deterministic, fixed-width, hex, 'b'-prefixed") {
    check("digest", Prop.forAll { (s: String) =>
      val a = Digest.md5IdScala(s); val b = Digest.md5IdScala(s)
      val c = Digest.sha1IdScala(s)
      a == b && a.length == 20 && c.length == 20 &&
        a.startsWith("b") && c.startsWith("b") &&
        a.tail.forall("0123456789abcdef".contains(_))
    })
  }

  test("bloom filter: no false negatives for arbitrary long-key sets") {
    import org.apache.spark.util.sketch.BloomFilter
    val keySets = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check("bloom long keys", Prop.forAll(keySets) { ks =>
      val bf = BloomFilter.create(math.max(ks.size.toLong, 1L), 0.01)
      ks.foreach(bf.putLong)
      ks.forall(bf.mightContainLong)
    })
  }

  test("bloom filter: putString ≡ probing UTF-8 bytes (the codegen contract)") {
    // BloomMightContainExpr probes string keys as mightContainBinary over
    // the UTF8String bytes; this pins the encoding equivalence it relies on
    import org.apache.spark.util.sketch.BloomFilter
    val strs = Gen.nonEmptyListOf(Gen.asciiPrintableStr)
    check("bloom string keys", Prop.forAll(strs) { ss =>
      val bf = BloomFilter.create(math.max(ss.size.toLong, 1L), 0.01)
      ss.foreach(bf.putString)
      ss.forall(s => bf.mightContainBinary(s.getBytes("UTF-8")))
    })
  }

  test("roman numerals round-trip over the full domain") {
    check("roman", Prop.forAll(Gen.chooseNum(1, 3999)) { n =>
      Roman.fromRoman(Roman.toRoman(n)).contains(n)
    })
  }

  test("association emitter is total with the exact fan-out arithmetic") {
    val small = Gen.chooseNum(0, 4)
    val gen = for {
      ne <- small; ns <- small; np <- small
      score <- Gen.option(Gen.chooseNum(-1e6, 1e6))
      date <- Gen.option(Gen.const("2026-01-01"))
    } yield (ne, ns, np, score, date)
    check("assoc totality", Prop.forAll(gen) {
      case (ne, ns, np, score, date) =>
        val a = Association("EX:src", "EX:s", "EX:p", "EX:o",
          evidence = (0 until ne).map(i => s"EX:e$i"),
          sources = (0 until ns).map(i => s"EX:r$i"),
          provenance = (0 until np).map(i => s"EX:pr$i"),
          score = score, date = date)
        val ts = a.triples
        ts.size == 5 + ne + ns + np + score.size + date.size &&
          ts.forall(t => t.s != null && t.p != null && t.o != null) &&
          ts.count(_.p == "rdf:type") == 1
    })
  }

  test("vec dot2: mixed float×double ≡ widen-then-multiply, any vectors") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecs = for {
      n <- Gen.chooseNum(0, 128)
      fs <- Gen.listOfN(n, Gen.chooseNum(-1e3f, 1e3f))
      ds <- Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3))
    } yield (fs, ds)
    check("vec dot2 mixed", Prop.forAll(vecs) { case (fs, ds) =>
      val fa = new GenericArrayData(fs.toArray)
      val da = new GenericArrayData(ds.toArray)
      val mixed = graft.functions.VecFns.dot2(fa, da, true, false)
      // reference: widen the float side first, then the same-type path
      val widened = new GenericArrayData(fs.map(_.toDouble).toArray)
      val ref = graft.functions.VecFns.dot2(widened, da, false, false)
      java.lang.Double.compare(mixed, ref) == 0
    })
  }

  test("minhash md5 permutation family never overflows a signed long") {
    // every operand of (a·h + b) mod p with h < p must stay below 2^62 —
    // the bound that lets DuckDB run the identical arithmetic
    val gen = for {
      i <- Gen.chooseNum(0, 255)
      h <- Gen.chooseNum(0L, graft.operators.Dedup.minhashP - 1)
    } yield (i, h)
    check("minhash coeff bounds", Prop.forAll(gen) { case (i, h) =>
      val (a, b) = graft.operators.Dedup.minhashCoeffs(i)
      val p = graft.operators.Dedup.minhashP
      a >= 1 && a < p && b >= 0 && b < p &&
        a * h + b > 0 && a * h + b < (1L << 62)
    })
  }

  test("MapLookupExpr probe ≡ Map.get for arbitrary dictionaries") {
    import org.apache.spark.unsafe.types.UTF8String
    val dicts = Gen.mapOf(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr))
    val probe = Gen.alphaNumStr
    check("map lookup", Prop.forAll(dicts, probe) { (m, k) =>
      val e = graft.functions.MapLookupExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(k), m, "prop")
      val got = Option(e.lookupJ(UTF8String.fromString(k))).map(_.toString)
      got == m.get(k)
    })
  }
}
