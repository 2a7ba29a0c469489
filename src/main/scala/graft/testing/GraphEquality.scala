package graft.testing

import org.apache.spark.sql.DataFrame

import graft.core.Triple

/** Triple-set equality with two-sided difference reporting — the
  * reference's primary golden-test comparator
  * (dipper/utils/TestUtils.test_graph_equality, TestUtils.py:44-57:
  * "compares sets of triples, logging both set differences").
  *
  * Set semantics via `except` both directions; both empty ⇔ equal.
  */
object GraphEquality {

  final case class Diff(onlyLeft: Seq[Triple], onlyRight: Seq[Triple]) {
    def isEqual: Boolean = onlyLeft.isEmpty && onlyRight.isEmpty
    def report: String =
      if (isEqual) "graphs equal"
      else s"only in actual (${onlyLeft.size}):\n" +
        onlyLeft.take(20).mkString("  ", "\n  ", "\n") +
        s"only in expected (${onlyRight.size}):\n" +
        onlyRight.take(20).mkString("  ", "\n  ", "\n")
  }

  def diff(actual: DataFrame, expected: DataFrame): Diff = {
    val spark = actual.sparkSession
    import spark.implicits._
    val cols = Seq("s", "p", "o", "lit", "dt")
    val a = actual.select(cols.head, cols.tail: _*)
    val e = expected.select(cols.head, cols.tail: _*)
    Diff(
      a.except(e).as[Triple].collect().toSeq.sortBy(t => (t.s, t.p, t.o)),
      e.except(a).as[Triple].collect().toSeq.sortBy(t => (t.s, t.p, t.o)))
  }

  def assertEqual(actual: DataFrame, expected: Seq[Triple]): Unit = {
    val spark = actual.sparkSession
    import spark.implicits._
    val d = diff(actual, expected.toDF())
    if (!d.isEqual) throw new AssertionError(d.report)
  }
}
