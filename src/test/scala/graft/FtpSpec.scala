package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Path}

import graft.sources.{Fetch, FtpTransport, Transport}

/** Native-FTP transport tests over an in-process loopback origin — the
  * HttpSpec device applied to ftp:// (zero-egress forbids external
  * networks, not 127.0.0.1): a minimal RFC 959 + SIZE/MDTM server
  * serving a temp directory, driven end to end through [[Fetch]]'s
  * conditional-fetch policy.
  */
class FtpSpec extends SparkSpec {

  /** Minimal passive-mode FTP origin over `root`: USER/PASS/TYPE/PASV/
    * SIZE/MDTM/RETR/QUIT — exactly the subset [[FtpTransport]] speaks. */
  private def withFtpServer(root: Path, supportSize: Boolean = true,
                            creds: Option[(String, String)] = None,
                            failCompletion: Boolean = false)
                           (run: String => Unit): Unit = {
    val server = new ServerSocket(0, 8, InetAddress.getByName("127.0.0.1"))
    val pool = java.util.concurrent.Executors.newCachedThreadPool()
    @volatile var running = true
    pool.submit(new Runnable {
      def run(): Unit = while (running) {
        try {
          val s = server.accept()
          pool.submit(new Runnable {
            def run(): Unit = handle(s, root, supportSize, creds, failCompletion)
          })
        } catch { case _: Throwable => () /* server closed */ }
      }
    })
    try run(s"ftp://127.0.0.1:${server.getLocalPort}")
    finally { running = false; server.close(); pool.shutdownNow() }
  }

  private def handle(sock: Socket, root: Path,
                     supportSize: Boolean = true,
                     creds: Option[(String, String)] = None,
                     failCompletion: Boolean = false): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, ISO_8859_1))
    val out = new PrintWriter(
      new OutputStreamWriter(sock.getOutputStream, ISO_8859_1))
    def send(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
    def resolve(arg: String): Path = root.resolve(arg.stripPrefix("/"))
    var dataSrv: ServerSocket = null
    send("220 graft test ftpd")
    var line = in.readLine()
    while (line != null) {
      val (cmd, arg) = line.split(" ", 2) match {
        case Array(c, a) => (c.toUpperCase, a)
        case Array(c)    => (c.toUpperCase, "")
      }
      cmd match {
        case "USER" =>
          if (creds.forall(_._1 == arg)) send("331 need password")
          else send("530 unknown user")
        case "PASS" =>
          if (creds.forall(_._2 == arg)) send("230 logged in")
          else send("530 bad password")
        case "TYPE" => send("200 ok")
        case "SIZE" =>
          val f = resolve(arg)
          if (!supportSize) send("502 SIZE not implemented")
          else if (Files.isRegularFile(f)) send(s"213 ${Files.size(f)}")
          else send("550 not found")
        case "MDTM" =>
          val f = resolve(arg)
          if (Files.isRegularFile(f)) {
            val ts = java.time.format.DateTimeFormatter
              .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)
              .format(Files.getLastModifiedTime(f).toInstant)
            send(s"213 $ts")
          } else send("550 not found")
        case "PASV" =>
          if (dataSrv != null) dataSrv.close()
          dataSrv = new ServerSocket(0, 1, InetAddress.getByName("127.0.0.1"))
          val p = dataSrv.getLocalPort
          send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
        case "RETR" =>
          val f = resolve(arg)
          if (dataSrv == null || !Files.isRegularFile(f)) send("550 can't open")
          else {
            send("150 opening data connection")
            val d = dataSrv.accept()
            try { Files.copy(f, d.getOutputStream); () } finally d.close()
            dataSrv.close(); dataSrv = null
            if (failCompletion) send("451 transfer aborted")
            else send("226 transfer complete")
          }
        case "QUIT" => send("221 bye"); sock.close(); return
        case _      => send("502 not implemented")
      }
      line = in.readLine()
    }
  }

  test("FTP transport: stat + conditional fetch against a loopback origin") {
    val root = Files.createTempDirectory("graft-ftp-root")
    val file = root.resolve("omim.txt")
    Files.write(file, "mim\tlabel\n100100\tx\n".getBytes("UTF-8"))
    // second-precision mtime: MDTM carries yyyyMMddHHmmss
    Files.setLastModifiedTime(file,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L))
    withFtpServer(root) { base =>
      val url = s"$base/omim.txt"
      assert(Transport.forUrl(url) eq FtpTransport) // scheme dispatch
      assert(FtpTransport.exists(url))
      assert(!FtpTransport.exists(s"$base/definitely-missing"))
      assert(FtpTransport.stat(url).contains((Files.size(file), 1700000000000L)))

      val dir = Files.createTempDirectory("graft-ftp-cache").toString
      val f1 = Fetch.fetch(url, dir)
      assert(f1.refetched)
      assert(Files.readAllLines(f1.path).get(1) == "100100\tx")
      // unchanged origin → cache hit, no refetch
      val f2 = Fetch.fetch(url, dir)
      assert(!f2.refetched)
      // origin grows + newer mtime → conditional refetch picks it up
      Files.write(file, "mim\tlabel\n100100\tx\n100200\ty\n".getBytes("UTF-8"))
      Files.setLastModifiedTime(file,
        java.nio.file.attribute.FileTime.fromMillis(1700000060000L))
      val f3 = Fetch.fetch(url, dir)
      assert(f3.refetched)
      assert(Files.readAllLines(f3.path).size == 3)
    }
  }

  test("FTP transport: SIZE-less ftpd degrades to fetch-and-let-RETR-decide") {
    val root = Files.createTempDirectory("graft-ftp-nosize")
    Files.write(root.resolve("f.txt"), "x\ty\n".getBytes("UTF-8"))
    withFtpServer(root, supportSize = false) { base =>
      // 502 on SIZE must not read as 'missing': the file is retrievable
      assert(FtpTransport.exists(s"$base/f.txt"))
      assert(FtpTransport.stat(s"$base/f.txt").isEmpty) // no metadata
      val dir = Files.createTempDirectory("graft-ftp-nosize-cache").toString
      val f1 = Fetch.fetch(s"$base/f.txt", dir)
      assert(f1.refetched && Files.readAllLines(f1.path).get(0) == "x\ty")
      // no origin metadata → never stale → only `force` refetches
      assert(!Fetch.fetch(s"$base/f.txt", dir).refetched)
      assert(Fetch.fetch(s"$base/f.txt", dir, force = true).refetched)
    }
  }

  test("FTP transport: percent-encoded credentials decode before login") {
    val root = Files.createTempDirectory("graft-ftp-auth")
    Files.write(root.resolve("f.txt"), "ok\n".getBytes("UTF-8"))
    // password contains ':' and '@' — only representable percent-encoded
    // in a URI; the transport must decode before USER/PASS
    withFtpServer(root, creds = Some(("u@x", "p:w%"))) { base =>
      val enc = base.replace("ftp://", "ftp://u%40x:p%3Aw%25@")
      val dest = Files.createTempDirectory("graft-ftp-auth-out").resolve("f.txt")
      FtpTransport.download(s"$enc/f.txt", dest)
      assert(Files.readAllLines(dest).get(0) == "ok")
      // wrong credentials are still rejected (the check is real)
      val bad = base.replace("ftp://", "ftp://u%40x:nope@")
      intercept[IllegalArgumentException] {
        FtpTransport.download(s"$bad/f.txt",
          dest.resolveSibling("f2.txt"))
      }
    }
    // a LITERAL '+' is valid unencoded in URI userinfo and must reach
    // the server verbatim — form-urlencoded decoding would turn it into
    // a space and silently send wrong credentials
    withFtpServer(root, creds = Some(("plus+user", "a+b:c"))) { base =>
      val enc = base.replace("ftp://", "ftp://plus+user:a+b%3Ac@")
      val dest = Files.createTempDirectory("graft-ftp-plus-out").resolve("f.txt")
      FtpTransport.download(s"$enc/f.txt", dest)
      assert(Files.readAllLines(dest).get(0) == "ok")
    }
  }

  test("FTP transport: failed fetch leaves no stale .part file") {
    val root = Files.createTempDirectory("graft-ftp-fail")
    Files.write(root.resolve("f.txt"), "data\n".getBytes("UTF-8"))
    val out = Files.createTempDirectory("graft-ftp-fail-out")
    def noPartFiles(): Boolean = {
      val s = Files.list(out)
      try !s.iterator().asInstanceOf[java.util.Iterator[Path]].hasNext
      finally s.close()
    }
    // refused RETR (missing remote file)
    withFtpServer(root) { base =>
      intercept[IllegalArgumentException] {
        FtpTransport.download(s"$base/missing.txt", out.resolve("m.txt"))
      }
      assert(noPartFiles(), "refused RETR stranded files")
    }
    // transfer streams fully but completion reply is 451: the .part was
    // WRITTEN by then — the cleanup path must still remove it
    withFtpServer(root, failCompletion = true) { base =>
      intercept[IllegalArgumentException] {
        FtpTransport.download(s"$base/f.txt", out.resolve("f.txt"))
      }
      assert(noPartFiles(), "failed completion stranded the .part file")
    }
  }

  test("FTP transport: downloaded bytes are binary-exact (TYPE I)") {
    val root = Files.createTempDirectory("graft-ftp-bin")
    val file = root.resolve("blob.gz")
    val bytes = Array.tabulate[Byte](4096)(i => (i * 31 % 256).toByte)
    Files.write(file, bytes)
    withFtpServer(root) { base =>
      val dest = Files.createTempDirectory("graft-ftp-out").resolve("blob.gz")
      FtpTransport.download(s"$base/blob.gz", dest)
      assert(java.util.Arrays.equals(Files.readAllBytes(dest), bytes))
    }
  }
}
