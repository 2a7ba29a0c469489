package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** Zip-archive member access (the reference's `ZipFile` fetch-stage
  * unpacking, BioGrid.py:6,126-131 "assume that the first entry is the
  * item") — completing the archive-format set next to gzip (native in
  * Spark scans) and ustar ([[TarSource]]). Driver-stage like the
  * reference's fetch phase: members land in the fetch cache, the scan
  * then reads the extracted file distributed.
  */
object ZipSource {

  /** Member names in archive order (inventory check before extraction). */
  def list(zipPath: String): Seq[String] = {
    val z = new ZipFile(zipPath)
    try z.entries().asScala.map(_.getName).toList finally z.close()
  }

  /** Extract one member (default: the FIRST entry, the reference's
    * `namelist()[0]` convention) into `destDir`; returns the landed
    * path. */
  def extractMember(zipPath: String, destDir: String,
                    member: Option[String] = None): Path = {
    val z = new ZipFile(zipPath)
    try {
      val name = member.getOrElse(
        z.entries().asScala.nextOption()
          .getOrElse(throw new java.io.FileNotFoundException(
            s"empty zip: $zipPath")).getName)
      val entry = Option(z.getEntry(name)).getOrElse(
        throw new java.io.FileNotFoundException(s"member $name not in $zipPath"))
      Files.createDirectories(Paths.get(destDir))
      val dest = Paths.get(destDir, Paths.get(name).getFileName.toString)
      val in = z.getInputStream(entry)
      try Files.copy(in, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      dest
    } finally z.close()
  }
}
