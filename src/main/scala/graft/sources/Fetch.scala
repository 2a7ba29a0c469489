package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Driver-side raw-file acquisition with freshness checking.
  *
  * Mirrors the reference's conditional fetch (Source.py:280-494):
  * a file is re-fetched only when the origin's size or last-modified
  * differs from the cached copy; a cache mirror is consulted before the
  * origin (Source.py:360-433); the retrieval date is recorded for the
  * dataset-metadata graph (`pav:retrievedOn`), and integrity utilities
  * (length/md5, Source.py:544-610) verify the landed file.
  *
  * Network transports are out of scope in this hermetic environment —
  * origins are paths/`file://` URLs; the freshness/caching/verification
  * logic is transport-independent and is what the round tests.
  * Fetch is a DRIVER stage by design: executors never touch origins
  * (SURVEY §7), Spark scans read only the landed cache.
  */
object Fetch {

  final case class Fetched(path: Path, refetched: Boolean, retrievedOn: String)

  private def strip(url: String): String =
    if (url.startsWith("file://")) url.stripPrefix("file://") else url

  /** Origin is considered fresh if size and mtime match the cached copy
    * (the reference's Last-Modified + size check, Source.py:280-358). */
  def isStale(origin: Path, cached: Path): Boolean =
    !Files.exists(cached) ||
      Files.size(origin) != Files.size(cached) ||
      // millisecond granularity: copy may truncate sub-ms timestamp parts
      Files.getLastModifiedTime(origin).toMillis >
        Files.getLastModifiedTime(cached).toMillis

  /** Conditional fetch with optional cache-mirror preference. */
  def fetch(originUrl: String, destDir: String,
            mirrorUrl: Option[String] = None,
            force: Boolean = false): Fetched = {
    val origin = mirrorUrl.map(strip).map(Paths.get(_))
      .filter(Files.exists(_))
      .getOrElse(Paths.get(strip(originUrl)))
    require(Files.exists(origin), s"origin not found: $origin")
    Files.createDirectories(Paths.get(destDir))
    val dest = Paths.get(destDir, origin.getFileName.toString)
    val stale = force || isStale(origin, dest)
    if (stale) {
      Files.copy(origin, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, Files.getLastModifiedTime(origin))
    }
    Fetched(dest, stale, java.time.LocalDate.now.toString)
  }

  /** Integrity utilities (Source.py:544-557,606-610). */
  def fileLength(p: Path): Long = Files.size(p)

  def fileMd5(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  /** Post-fetch size verification (Source.py:589-604). */
  def verifySize(f: Fetched, expected: Long): Unit = {
    val n = fileLength(f.path)
    require(n == expected, s"fetched size mismatch: got $n, expected $expected")
  }
}
