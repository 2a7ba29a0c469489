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
  * Bytes move through the pluggable [[Transport]] layer: the policy here
  * is transport-independent and fully exercised over [[FileTransport]]
  * in this hermetic build; [[HttpTransport]] slots in unchanged where
  * the network exists. Fetch is a DRIVER stage by design: executors
  * never touch origins (SURVEY §7), Spark scans read only the landed
  * cache.
  */
object Fetch {

  final case class Fetched(path: Path, refetched: Boolean, retrievedOn: String)

  private def fileName(url: String): String = {
    val clean = url.stripSuffix("/").takeWhile(c => c != '?' && c != '#')
    clean.substring(clean.lastIndexOf('/') + 1)
  }

  /** Origin is considered fresh if size and mtime match the cached copy
    * (the reference's Last-Modified + size check, Source.py:280-358);
    * an origin that exposes no metadata never looks stale — only
    * `force` refetches it (Source.py:322-344 fallback). */
  def isStale(originStat: Option[(Long, Long)], cached: Path): Boolean =
    !Files.exists(cached) ||
      originStat.exists { case (size, mtimeMillis) =>
        size != Files.size(cached) ||
          // millisecond granularity: copy may truncate sub-ms parts
          mtimeMillis > Files.getLastModifiedTime(cached).toMillis
      }

  /** Path-based form kept for local-mirror callers. */
  def isStale(origin: Path, cached: Path): Boolean =
    isStale(Some((Files.size(origin),
      Files.getLastModifiedTime(origin).toMillis)), cached)

  /** Conditional fetch with optional cache-mirror preference. */
  def fetch(originUrl: String, destDir: String,
            mirrorUrl: Option[String] = None,
            force: Boolean = false): Fetched = {
    val origin = mirrorUrl.filter(u => Transport.forUrl(u).exists(u))
      .getOrElse(originUrl)
    val tr = Transport.forUrl(origin)
    require(tr.exists(origin), s"origin not found: $origin")
    Files.createDirectories(Paths.get(destDir))
    val dest = Paths.get(destDir, fileName(origin))
    val stale = force || isStale(tr.stat(origin), dest)
    if (stale) tr.download(origin, dest)
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
