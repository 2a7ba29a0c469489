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

  // --- native vector expressions vs independent references ---------------
  // The contract double order: NaN equals NaN and sorts above everything;
  // ±0.0 compare equal (primitive <,> first) — Spark's SQL total order.
  private def sqlCmp(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x.isNaN) { if (y.isNaN) 0 else 1 }
    else if (y.isNaN) -1 else 0

  private def arr(xs: Seq[Double]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)

  private val smallDouble: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-3.0, 3.0), Gen.oneOf(0.0, -0.0, 1.0, -1.0, 0.5))

  test("vec_best_cell ≡ reference argmax under the SQL double order") {
    val dim = 4
    val gen = for {
      v <- Gen.listOfN(dim, smallDouble)
      n <- Gen.chooseNum(1, 12)
      cents <- Gen.listOfN(n, Gen.listOfN(dim, smallDouble))
    } yield (v, cents)
    check("best cell", Prop.forAll(gen) { case (v, cents) =>
      val cids = cents.indices.map(i => (i * 7 + 3).toLong).toArray
      val cvs = cents.map(_.toArray).toArray
      val cns = cvs.map(c => math.sqrt(c.map(x => x * x).sum))
      val got = graft.functions.VecFns.bestCell(arr(v), false, cids, cvs, cns)
      // reference: score every centroid with the same arithmetic, pick
      // the max by (csim via sqlCmp desc, cid asc) through a full sort —
      // a different selection mechanism than bestCell's running best
      val n0 = math.sqrt(v.map(x => x * x).sum)
      val scored = cents.zipWithIndex.map { case (c, i) =>
        var s = 0.0
        v.indices.foreach(j => s += v(j) * c(j))
        (s / (n0 * cns(i)), cids(i))
      }
      val best = scored.sortWith { (a, b) =>
        val c = sqlCmp(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }.head
      got.getLong(0) == best._2 &&
        (got.getDouble(1) == best._1 ||
          (got.getDouble(1).isNaN && best._1.isNaN))
    })
  }

  test("vec_pq_codes ≡ reference per-subspace argmin, including short vectors") {
    val m = 2; val sub = 3
    val gen = for {
      vlen <- Gen.oneOf(m * sub, m * sub - 2) // full and truncated
      v <- Gen.listOfN(vlen, smallDouble)
      ks <- Gen.chooseNum(1, 6)
      cb <- Gen.listOfN(m, Gen.listOfN(ks, Gen.listOfN(sub, smallDouble)))
    } yield (v, cb)
    check("pq codes", Prop.forAll(gen) { case (v, cb) =>
      val cids = cb.map(s => s.indices.map(i => i + 1).toArray).toArray
      val cvs = cb.map(_.map(_.toArray).toArray).toArray
      val cn2s = cvs.map(_.map(c => c.map(x => x * x).sum))
      val got = graft.functions.VecFns.pqCodes(arr(v), false, m, sub,
        cids, cvs, cn2s)
      (0 until m).forall { s0 =>
        val scored = cb(s0).zipWithIndex.map { case (c, j) =>
          var dot = 0.0
          var i = 0
          while (i < sub && s0 * sub + i < v.length) {
            dot += v(s0 * sub + i) * c(i); i += 1
          }
          (cn2s(s0)(j) - 2.0 * dot, j + 1, cn2s(s0)(j))
        }
        val best = scored.sortWith { (a, b) =>
          val c = sqlCmp(a._1, b._1)
          c < 0 || (c == 0 && a._2 < b._2)
        }.head
        val row = got.getStruct(s0, 2)
        row.getInt(0) == best._2 && row.getDouble(1) == best._3
      }
    })
  }

  test("vec_sub ≡ element-wise difference, truncating to the shorter input") {
    val gen = for {
      a <- Gen.nonEmptyListOf(smallDouble)
      b <- Gen.nonEmptyListOf(smallDouble)
    } yield (a, b)
    check("vec sub", Prop.forAll(gen) { case (a, b) =>
      val got = graft.functions.VecFns.sub(arr(a), arr(b), false, false)
      val n = math.min(a.length, b.length)
      got.numElements() == n &&
        (0 until n).forall(i => got.getDouble(i) == a(i) - b(i))
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
