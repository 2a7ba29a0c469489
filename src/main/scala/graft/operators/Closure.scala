package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure over an edge relation — the ontology primitive the
  * reference leans on implicitly: dipper emits `subClassOf`/`partOf`
  * edges and defers closure to downstream ontology tooling
  * (SciGraph/owlsim in the Monarch stack); at corpus scale the closure
  * itself becomes a distributed job, so the engine provides it.
  *
  * Algorithm: iterative doubling (repeated squaring of the reachability
  * relation): each round unions `reach ⋈ reach` (path halves glued at
  * the midpoint) into `reach`, so reachable path length DOUBLES per
  * round — log₂(longest path) rounds, not depth rounds. Each round
  * shuffles only the pair relation; convergence is the pair count
  * reaching a fixpoint (monotone, so equality is exact).
  *
  * Rounds truncate lineage through the same reliable-checkpoint /
  * persist+rebase machinery as [[Dedup.clusters]] — see there for why
  * an iterative Catalyst plan must be rebased every round.
  *
  * Cycles are tolerated (closure of a cyclic graph is well-defined and
  * the fixpoint still terminates); self-pairs (x,x) are only emitted if
  * the graph contains a cycle through x, matching the strict-reachability
  * convention of SQL recursive CTEs with `UNION` dedup.
  */
object Closure {

  /** All (src, dst) pairs where dst is reachable from src in ≥1 step. */
  def transitive(edges: DataFrame, srcCol: String, dstCol: String,
                 maxRounds: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val useCheckpoint = spark.sparkContext.getCheckpointDir.isDefined
    def mat(df: DataFrame): (DataFrame, DataFrame, Long) =
      if (useCheckpoint) {
        val c = df.checkpoint()
        (c, c, c.count())
      } else {
        val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = c.count()
        (spark.createDataFrame(c.rdd, c.schema), c, n)
      }
    var (reach, reachCache, n) =
      mat(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    var round = 0
    var done = n == 0
    while (!done && round < maxRounds) {
      val doubled = reach.as("a")
        .join(reach.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .union(reach)
        .distinct()
      val (next, nextCache, n2) = mat(doubled)
      reachCache.unpersist(false)
      reach = next
      reachCache = nextCache
      done = n2 == n // monotone growth ⇒ equal count = exact fixpoint
      n = n2
      round += 1
    }
    if (!done)
      System.err.println(
        s"[graft] Closure.transitive: fixpoint NOT reached after $maxRounds " +
          s"rounds (pairs=$n, still growing) — returning a PARTIAL closure; " +
          s"raise maxRounds (covers paths up to 2^maxRounds edges)")
    // Dedup.finalized pattern: hand back an independently persisted copy
    // and release the loop's final round, so a long-lived session does not
    // accumulate one block set per closure call. Caller drops the result's
    // own (counted, exact-size) blocks with result.unpersist() when done.
    // On the checkpoint path mat() returns the SAME Dataset for reach and
    // reachCache; the checkpoint files already detach lineage and nothing
    // was persisted, so the copy-and-release dance would just undo itself.
    if (useCheckpoint) reach
    else {
      val out = reach.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      reachCache.unpersist(false)
      out
    }
  }
}
