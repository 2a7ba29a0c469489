package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Two-layer vocabulary translation: local table composed over a global
  * table, with configurable missing-key policy.
  *
  * Mirrors Source.resolve / localtt / globaltt semantics
  * (dipper/sources/Source.py:718-796): a per-source local table maps raw
  * input tokens to canonical labels, the global table maps labels to
  * ontology CURIEs; `resolve(word) = global(local(word))`, where
  * `mandatory=true` raises on a miss and otherwise the word passes through
  * (with a warning) or falls back to a default.
  *
  * Column-side resolution is `element_at` over map literals (codegen'd,
  * shipped with the plan — effectively broadcast); no UDF.
  */
final case class TranslationTable(local: Map[String, String],
                                  global: Map[String, String]) {

  def resolve(word: String, mandatory: Boolean = true,
              default: Option[String] = None): String = {
    val localized = local.getOrElse(word, word)
    global.get(localized).orElse(local.get(word)) match {
      case Some(t) => t
      case None if mandatory =>
        throw new NoSuchElementException(s"translation missing for '$word'")
      case None => default.getOrElse(word)
    }
  }

  /** Column form: local→global with passthrough (or default) on miss.
    *
    * Lookups are [[graft.functions.MapLookupExpr]] hash probes, NOT
    * `element_at(typedLit(...))`: the literal-map route linear-scans all
    * ~800 global entries per evaluation, and CollapseProject duplicates
    * the scan into every emit field that references the resolved column
    * (measured: 390 CPU-s on one sf0.1 ingest, ~50× the hash route). */
  def resolveCol(c: Column, default: Option[String] = None): Column = {
    import graft.functions.MapExpressions.map_lookup
    val lm = if (local.isEmpty) c else coalesce(map_lookup(local, c, "local"), c)
    val g = map_lookup(global, lm, "global")
    default match {
      case Some(d) => coalesce(g, lit(d))
      case None    => coalesce(g, lm)
    }
  }
}

object TranslationTable {
  def globalOnly(global: Map[String, String]): TranslationTable =
    TranslationTable(Map.empty, global)

  /** The engine's shipped global table (GLOBAL_TERMS.yaml shape,
    * loaded the way Source.py:718-796 loads the reference's). */
  lazy val globalDefault: Map[String, String] =
    FlatYaml.fromResource("/graft/global_terms.yaml")

  /** Global-table-only resolver over the shipped vocabulary. */
  lazy val default: TranslationTable = globalOnly(globalDefault)

  /** Compose a per-source local table (classpath resource under
    * /graft/tt/, mirroring the reference's translationtable/<source>.yaml)
    * over the shipped global table. */
  def forSource(source: String): TranslationTable =
    TranslationTable(FlatYaml.fromResource(s"/graft/tt/$source.yaml"),
      globalDefault)

  /** Load local + global tables from filesystem paths (the dipper-etl
    * layout: one global file, one per-source file). */
  def fromYaml(localPath: Option[String], globalPath: String): TranslationTable =
    TranslationTable(localPath.map(FlatYaml.fromFile).getOrElse(Map.empty),
      FlatYaml.fromFile(globalPath))
}
