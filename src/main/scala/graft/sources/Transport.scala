package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** Pluggable byte transport for the fetch stage.
  *
  * The reference's fetch logic (Source.py:280-494) interleaves transport
  * (urllib over HTTP/FTP) with policy (freshness check, cache mirror,
  * retrieval bookkeeping). Here policy lives in [[Fetch]] and transport
  * behind this interface, so the hermetic build exercises the full policy
  * surface over [[FileTransport]] while [[HttpTransport]] carries the
  * same contract for deployments with network access.
  */
trait Transport {

  /** Remote metadata for the freshness check: (size in bytes,
    * last-modified epoch millis), None when the origin doesn't expose
    * them (then only `force` refetches — the reference's fallback when
    * headers are absent, Source.py:322-344). */
  def stat(url: String): Option[(Long, Long)]

  /** Stream the origin to `dest` (atomic: temp file + move). */
  def download(url: String, dest: Path): Unit

  def exists(url: String): Boolean
}

/** `file://` / plain-path transport — the hermetic build's only live
  * transport; also the fastest path for pre-mirrored data lakes. */
object FileTransport extends Transport {
  private[sources] def toPath(url: String): Path =
    java.nio.file.Paths.get(
      if (url.startsWith("file://")) url.stripPrefix("file://") else url)

  def stat(url: String): Option[(Long, Long)] = {
    val p = toPath(url)
    if (Files.exists(p))
      Some((Files.size(p), Files.getLastModifiedTime(p).toMillis))
    else None
  }

  def download(url: String, dest: Path): Unit = {
    val p = toPath(url)
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    Files.copy(p, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    Files.setLastModifiedTime(dest, Files.getLastModifiedTime(p))
  }

  def exists(url: String): Boolean = Files.exists(toPath(url))
}

/** HTTP(S) transport over `java.net.http` — the reference's
  * Last-Modified + Content-Length freshness probe (Source.py:280-358)
  * as a HEAD request, chunked GET to a temp file (Source.py:435-494).
  * Exercised end to end against an in-process loopback origin
  * (HttpSpec: stat, conditional re-fetch on size/mtime change, force,
  * and the biomart martservice round trip) — zero-egress forbids
  * external networks, not 127.0.0.1. */
object HttpTransport extends Transport {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private lazy val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL).build()

  private def head(url: String): java.net.http.HttpResponse[Void] =
    client.send(
      HttpRequest.newBuilder(java.net.URI.create(url))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.discarding())

  def stat(url: String): Option[(Long, Long)] = {
    val r = head(url)
    if (r.statusCode() / 100 != 2) None
    else {
      val size = r.headers().firstValueAsLong("Content-Length")
      val mtime = r.headers().firstValue("Last-Modified")
        .map[java.lang.Long](v => java.lang.Long.valueOf(
          java.time.ZonedDateTime.parse(v,
            java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
            .toInstant.toEpochMilli))
      if (size.isPresent && mtime.isPresent)
        Some((size.getAsLong, mtime.get())) else None
    }
  }

  def download(url: String, dest: Path): Unit = {
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    val r = client.send(
      HttpRequest.newBuilder(java.net.URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofFile(tmp))
    require(r.statusCode() / 100 == 2, s"GET $url -> ${r.statusCode()}")
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    stat(url).foreach { case (_, m) =>
      Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime.fromMillis(m))
    }
  }

  def exists(url: String): Boolean = head(url).statusCode() / 100 == 2
}

/** Native FTP transport — a minimal RFC 959 (+ RFC 3659 SIZE/MDTM)
  * client over raw sockets, covering exactly the subset the reference's
  * urllib fetch uses for ftp:// origins (Source.py:435-494): anonymous
  * or url-embedded credentials, binary mode, passive-mode RETR, and the
  * SIZE/MDTM freshness probe that mirrors [[HttpTransport]]'s
  * Content-Length/Last-Modified contract. Exercised end to end against
  * an in-process loopback FTP origin (FtpSpec) — zero-egress forbids
  * external networks, not 127.0.0.1. */
object FtpTransport extends Transport {
  import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
  import java.net.{Socket, URI}
  import java.nio.charset.StandardCharsets.ISO_8859_1

  private final case class Ctrl(sock: Socket, in: BufferedReader,
                                out: PrintWriter) {
    /** One reply, collapsing RFC 959 multi-line form (`123-… 123 done`). */
    def reply(): (Int, String) = {
      var line = in.readLine()
      require(line != null && line.length >= 3, "FTP control channel closed")
      val code = line.take(3)
      if (line.length > 3 && line.charAt(3) == '-') {
        var l = in.readLine()
        while (l != null && !l.startsWith(code + " ")) l = in.readLine()
        require(l != null, "FTP control channel closed mid-reply")
        line = l
      }
      (code.toInt, line)
    }
    def cmd(c: String): (Int, String) = {
      out.print(c + "\r\n"); out.flush(); reply()
    }
  }

  private def connect(u: URI): Ctrl = {
    val sock = new Socket(u.getHost, if (u.getPort > 0) u.getPort else 21)
    // the socket must not outlive a failed banner/login — exists()
    // callers swallow the Throwable, so a leak here is one FD per probe
    try {
      val c = Ctrl(sock,
        new BufferedReader(new InputStreamReader(sock.getInputStream, ISO_8859_1)),
        new PrintWriter(new OutputStreamWriter(sock.getOutputStream, ISO_8859_1)))
      val (banner, _) = c.reply()
      require(banner == 220, s"FTP banner $banner from ${u.getHost}")
      // RAW userInfo, split on ':' BEFORE decoding, then decode each
      // part: a password containing ':' or '@' must be percent-encoded
      // to parse as a URI at all, and decoding first (what getUserInfo
      // does) would make an encoded ':' indistinguishable from the
      // user/password separator. Percent-decode ONLY: URLDecoder speaks
      // application/x-www-form-urlencoded, where a literal '+' (valid
      // unencoded in URI userinfo) decodes to a space — escape it first
      // so credentials with '+' survive verbatim.
      def dec(s: String) =
        java.net.URLDecoder.decode(s.replace("+", "%2B"),
          java.nio.charset.StandardCharsets.UTF_8)
      val (user, pass) = Option(u.getRawUserInfo).map(_.split(":", 2)) match {
        case Some(Array(us, pw)) => (dec(us), dec(pw))
        case Some(Array(us))     => (dec(us), "")
        case _                   => ("anonymous", "anonymous@")
      }
      val (uc, _) = c.cmd(s"USER $user")
      if (uc == 331) {
        val (pc, _) = c.cmd(s"PASS $pass")
        require(pc / 100 == 2, s"FTP login failed ($pc)")
      } else require(uc / 100 == 2, s"FTP USER rejected ($uc)")
      c
    } catch { case e: Throwable => sock.close(); throw e }
  }

  private def withCtrl[T](url: String)(f: (Ctrl, String) => T): T = {
    val u = URI.create(url)
    val c = connect(u)
    try f(c, u.getPath)
    finally {
      try { c.cmd("QUIT"); () } catch { case _: Throwable => }
      c.sock.close()
    }
  }

  /** MDTM's `YYYYMMDDHHMMSS[.sss]` (UTC per RFC 3659) → epoch millis. */
  private def mdtmMillis(v: String): Long =
    java.time.LocalDateTime.parse(v.trim.take(14),
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  private def statOn(c: Ctrl, path: String): Option[(Long, Long)] = {
    val (sc, sr) = c.cmd(s"SIZE $path")
    if (sc != 213) None
    else {
      val size = sr.drop(4).trim.toLong
      val (mc, mr) = c.cmd(s"MDTM $path")
      if (mc != 213) None else Some((size, mdtmMillis(mr.drop(4))))
    }
  }

  def stat(url: String): Option[(Long, Long)] =
    withCtrl(url)((c, path) => statOn(c, path))

  /** `227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)` → data socket.
    * Only the PORT is taken from the reply: the data connection reuses
    * the CONTROL connection's peer address, because a server behind
    * NAT advertises its private IP in the 227 digits (the standard
    * modern-client behavior — Python's ftplib does the same since 3.9,
    * curl unless told otherwise). */
  private def pasv(c: Ctrl): Socket = {
    val (code, rep) = c.cmd("PASV")
    require(code == 227, s"PASV -> $code")
    val nums = "\\d+".r.findAllIn(rep.dropWhile(_ != '(')).map(_.toInt).toSeq
    require(nums.length >= 6, s"unparseable PASV reply: $rep")
    new Socket(c.sock.getInetAddress, nums(4) * 256 + nums(5))
  }

  def download(url: String, dest: Path): Unit = withCtrl(url) { (c, path) =>
    val (tc, _) = c.cmd("TYPE I")
    require(tc / 100 == 2, s"TYPE I -> $tc")
    val data = pasv(c)
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    try {
      try {
        val (rc, _) = c.cmd(s"RETR $path")
        require(rc == 150 || rc == 125, s"RETR $path -> $rc")
        Files.copy(data.getInputStream, tmp, StandardCopyOption.REPLACE_EXISTING)
      } finally data.close()
      val (done, _) = c.reply()
      require(done == 226 || done == 250, s"RETR completion -> $done")
      Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } catch { case e: Throwable =>
      // a refused RETR, mid-stream copy failure, or failed completion
      // reply must not strand the .part file next to the cache entry —
      // repeated failed fetches would otherwise accumulate stale partials
      try Files.deleteIfExists(tmp) catch { case _: Throwable => }
      throw e
    }
    // mirror the origin's mtime (HttpTransport's Last-Modified contract)
    // so the SIZE/MDTM freshness probe is stable across fetches
    statOn(c, path).foreach { case (_, m) =>
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(m))
    }
  }

  /** 213 = present; 550 = missing/no access = absent. Any OTHER reply
    * (500/502 = SIZE unsupported on this ftpd) counts as PRESENT so the
    * fetch proceeds and RETR decides — the HttpTransport degrade
    * philosophy (stat=None → only `force` refetches) applied to
    * existence: a server that can serve the file but not RFC 3659 SIZE
    * must not fail the fetch at the probe. */
  def exists(url: String): Boolean =
    try withCtrl(url) { (c, path) =>
      val (code, _) = c.cmd(s"SIZE $path")
      code == 213 || (code != 550 && code / 100 != 4)
    }
    catch { case _: Throwable => false }
}

object Transport {
  /** Scheme dispatch (RDFGraph._getnode's http/https/ftp routing is the
    * same convention). */
  def forUrl(url: String): Transport =
    if (url.startsWith("http://") || url.startsWith("https://")) HttpTransport
    else if (url.startsWith("ftp://")) FtpTransport
    else FileTransport
}
