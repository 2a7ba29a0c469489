package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Driver-stage extraction cache for archive members (the same fetch-cache
  * posture as [[Fetch]]: archives are inherently serial streams, so they
  * unpack ONCE on the driver and Spark scans the extracted member in
  * parallel; executors never open archives).
  *
  * Two hazards of a naive `if (!exists) extract` cache, both fixed here:
  *  - staleness: a cache keyed only by archive PATH keeps serving the old
  *    member forever after the archive is refreshed in place (the
  *    reference re-fetches on remote timestamp change, Source.py
  *    checkIfRemoteIsNewer) — so the key folds in file size and mtime;
  *  - torn extraction: a crash mid-copy leaves a partial member that
  *    later runs mistake for a complete one — so extraction lands in a
  *    scratch dir and is renamed into place atomically (POSIX rename),
  *    meaning the cached path either doesn't exist or is complete.
  */
object ArchiveCache {

  /** Return the cached extraction of one archive member, extracting via
    * `extract(scratchDir) => landedPath` on miss. `ns` namespaces the
    * cache per source under the JVM temp dir. */
  def cachedExtract(archivePath: String, ns: String, memberFileName: String)
                   (extract: String => Path): Path = {
    val archive = Paths.get(archivePath)
    val key = graft.core.Digest.md5IdScala(
      s"$archivePath|${Files.size(archive)}|" +
        Files.getLastModifiedTime(archive).toMillis)
    val dir = Paths.get(sys.props("java.io.tmpdir"), ns, key)
    val dest = dir.resolve(memberFileName)
    if (!Files.exists(dest)) {
      val scratch = Files.createTempDirectory(
        Files.createDirectories(dir), ".extract")
      try {
        val landed = extract(scratch.toString)
        Files.move(landed, dest, StandardCopyOption.ATOMIC_MOVE)
      } finally {
        // scratch is empty on success (member moved out) and holds only
        // the partial member on failure — safe to drop either way
        Files.list(scratch).forEach(p => Files.deleteIfExists(p))
        Files.deleteIfExists(scratch)
      }
    }
    dest
  }
}
