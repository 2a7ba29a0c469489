package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Nested-subtree XML scan for the Orphanet JDBOR product shape
  * (dipper/sources/Orphanet.py:91-230 `ET.iterparse` over
  * `JDBOR/DisorderList/Disorder`, with per-disorder
  * `DisorderGeneAssociationList/DisorderGeneAssociation/Gene/
  * ExternalReferenceList` subtrees) — the OTHER XML topology the
  * reference consumes, complementing the flat MySQL-dump rows of
  * [[XmlDumpSource]].
  *
  * The StAX walk keeps an explicit element-path stack and buffers at
  * most ONE disorder's current association — constant memory per file,
  * the same streaming posture as the reference's `elem.clear()` loop.
  * One output row per `DisorderGeneAssociation`, plus a sentinel row
  * (null `assocType`) for a disorder with no associations so its class
  * is still emitted (Orphanet.py:103-110).
  */
object OrphanetXml {

  /** One disorder-gene association (or a no-assoc disorder sentinel). */
  case class OrphaRow(orpha: String, disorderName: String,
                      refSources: Seq[String], refIds: Seq[String],
                      synonyms: Seq[String],
                      assocType: String, status: String)

  def parse(input: java.io.InputStream): Iterator[OrphaRow] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(input)
    new Iterator[OrphaRow] {
      private var path: List[String] = Nil
      private val text = new StringBuilder
      // disorder-level state
      private var orpha: String = null
      private var disorderName: String = null
      private var assocCount = 0
      // association-level state
      private var refSources = Vector.empty[String]
      private var refIds = Vector.empty[String]
      private var synonyms = Vector.empty[String]
      private var assocType: String = null
      private var status: String = null
      private var pending: OrphaRow = null
      private var closed = false

      private def advance(): Unit = {
        while (pending == null && !closed) {
          if (!r.hasNext) { r.close(); closed = true }
          else r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              path = r.getLocalName :: path
              text.clear()
              path match {
                case "Disorder" :: "DisorderList" :: _ =>
                  orpha = null; disorderName = null; assocCount = 0
                case "DisorderGeneAssociation" :: _ =>
                  refSources = Vector.empty; refIds = Vector.empty
                  synonyms = Vector.empty; assocType = null; status = null
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              val t = text.toString.trim
              path match {
                case "OrphaCode" :: "Disorder" :: _ => orpha = t
                case "Name" :: "Disorder" :: _ => disorderName = t
                case "Source" :: "ExternalReference" :: _ =>
                  refSources :+= t
                case "Reference" :: "ExternalReference" :: _ =>
                  refIds :+= t
                case "Synonym" :: "SynonymList" :: "Gene" :: _ =>
                  if (t.nonEmpty) synonyms :+= t
                case "Name" :: "DisorderGeneAssociationType" :: _ =>
                  assocType = t
                case "Name" :: "DisorderGeneAssociationStatus" :: _ =>
                  status = t
                case "DisorderGeneAssociation" :: _ =>
                  assocCount += 1
                  pending = OrphaRow(orpha, disorderName, refSources, refIds,
                    synonyms, assocType, status)
                case "Disorder" :: "DisorderList" :: _ if assocCount == 0 =>
                  pending = OrphaRow(orpha, disorderName, Nil, Nil, Nil,
                    null, null)
                case _ =>
              }
              text.clear()
              path = path.tail
            case _ =>
          }
        }
      }

      def hasNext: Boolean = { advance(); pending != null }
      def next(): OrphaRow = {
        advance()
        val out = pending; pending = null
        if (out == null) throw new NoSuchElementException
        out
      }
    }
  }

  /** Parallelized file-list scan → one DataFrame row per association
    * (same executor-streaming shape as [[XmlDumpSource.read]]). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(paths).flatMap { p =>
      val in = new java.io.FileInputStream(p)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: java.io.IOException => () })
      parse(in)
    }.toDF()
  }
}
