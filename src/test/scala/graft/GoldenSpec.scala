package graft

import graft.core.{Digest, Triple}
import graft.emit.{Assoc, Association}
import graft.testing.GraphEquality

/** Inline golden-triple tests in the reference's primary style
  * (tests/test_ctd.py:18-64: one hand-written input row, assert the
  * exact expected triple set with two-sided set difference). */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("chem2disease therapeutic row expands to the exact golden graph (test_ctd style)") {
    val triples = Assoc.chem2disease("EX:ctd", "MESH:D009538", "OMIM:309400",
      "therapeutic")
    val aid = "_:" + Digest.assocIdScala("EX:ctd+MESH:D009538+RO:0002606+OMIM:309400")
    GraphEquality.assertEqual(triples.toDF(), Seq(
      Triple.res("MESH:D009538", "RO:0002606", "OMIM:309400"),
      Triple.res(aid, "rdf:type", "OBAN:association"),
      Triple.res(aid, "OBAN:association_has_subject", "MESH:D009538"),
      Triple.res(aid, "OBAN:association_has_predicate", "RO:0002606"),
      Triple.res(aid, "OBAN:association_has_object", "OMIM:309400")))
  }

  test("set-difference reporting shows both directions (TestUtils.py:44-57)") {
    val actual = Seq(Triple.res("a", "p", "x")).toDF()
    val expected = Seq(Triple.res("a", "p", "y")).toDF()
    val d = GraphEquality.diff(actual, expected)
    assert(!d.isEqual)
    assert(d.onlyLeft.map(_.o) == Seq("x") && d.onlyRight.map(_.o) == Seq("y"))
    assert(d.report.contains("only in actual (1)"))
  }

  test("D2P association with onset+frequency matches golden (HPOA shape)") {
    val ts = Assoc.d2p("EX:hpoa", "OMIM:119600", "HP:0000175",
      onset = Some("HP:0003577"), frequency = Some("12/45"),
      evidence = Seq("ECO:0000304"))
    val aid = "_:" + Digest.assocIdScala(
      "EX:hpoa+OMIM:119600+RO:0002200+HP:0000175+HP:0003577+12/45")
    GraphEquality.assertEqual(ts.toDF(), Seq(
      Triple.res("OMIM:119600", "RO:0002200", "HP:0000175"),
      Triple.res(aid, "rdf:type", "OBAN:association"),
      Triple.res(aid, "OBAN:association_has_subject", "OMIM:119600"),
      Triple.res(aid, "OBAN:association_has_predicate", "RO:0002200"),
      Triple.res(aid, "OBAN:association_has_object", "HP:0000175"),
      Triple.res(aid, "RO:0002558", "ECO:0000304"),
      Triple.res(aid, "EXP:onset", "HP:0003577"),
      Triple.str(aid, "EXP:frequency", "12/45")))
  }

  test("conditional fetch: fresh cache skipped, stale refetched, integrity checked") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fetch")
    val origin = dir.resolve("remote.tsv")
    java.nio.file.Files.writeString(origin, "id\tv\n1\t2\n")
    val cache = dir.resolve("raw").toString

    val first = graft.sources.Fetch.fetch(s"file://$origin", cache)
    assert(first.refetched)
    graft.sources.Fetch.verifySize(first, java.nio.file.Files.size(origin))
    val md5a = graft.sources.Fetch.fileMd5(first.path)

    // unchanged origin → cache hit
    assert(!graft.sources.Fetch.fetch(s"file://$origin", cache).refetched)

    // modified origin → stale → refetch, new digest
    Thread.sleep(10)
    java.nio.file.Files.writeString(origin, "id\tv\n1\t2\n3\t4\n")
    val third = graft.sources.Fetch.fetch(s"file://$origin", cache)
    assert(third.refetched)
    assert(graft.sources.Fetch.fileMd5(third.path) != md5a)

    // mirror preferred when present (DipperCache semantics)
    val mirror = dir.resolve("mirror.tsv")
    java.nio.file.Files.writeString(mirror, "mirrored\n")
    val viaMirror = graft.sources.Fetch.fetch(s"file://$origin", cache,
      mirrorUrl = Some(s"file://$mirror"))
    assert(viaMirror.path.getFileName.toString == "mirror.tsv")
  }
}
