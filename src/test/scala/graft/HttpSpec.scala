package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{Biomart, Fetch, HttpTransport}

/** Live-transport tests over an in-process loopback origin — the
  * zero-egress environment forbids external networks, not sockets on
  * 127.0.0.1, so the HTTP transport and the martservice round trip are
  * exercised end to end against a real server instead of staying
  * policy-only (the former "permanent partial").
  */
class HttpSpec extends SparkSpec {

  private def rfc1123(ms: Long): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneId.of("GMT")))

  /** Loopback origin serving `body()` with Last-Modified + Content-Length
    * (HEAD and GET), the reference's freshness-probe contract. */
  private def withServer(path: String, body: () => Array[Byte],
                         mtime: () => Long)(run: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(path, (ex: HttpExchange) => {
      val bytes = body()
      ex.getResponseHeaders.set("Last-Modified", rfc1123(mtime()))
      if (ex.getRequestMethod == "HEAD") {
        // sun httpserver drops Content-Length when sendResponseHeaders
        // gets a positive length on HEAD — set it manually and pass -1
        ex.getResponseHeaders.set("Content-Length", bytes.length.toString)
        ex.sendResponseHeaders(200, -1)
      } else {
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HTTP transport: stat + conditional fetch against a loopback origin") {
    @volatile var body = "gene\tstart\ng1\t100\n"
    @volatile var mtime = 1700000000000L
    withServer("/data/genes.tsv", () => body.getBytes("UTF-8"), () => mtime) { base =>
      val url = s"$base/data/genes.tsv"
      assert(HttpTransport.exists(url))
      assert(!HttpTransport.exists(s"$base/definitely/missing"))
      // HEAD probe surfaces the origin's size + Last-Modified
      assert(HttpTransport.stat(url)
        .contains((body.getBytes("UTF-8").length.toLong, mtime)))

      val dir = Files.createTempDirectory("graft-http").toString
      val f1 = Fetch.fetch(url, dir)
      assert(f1.refetched)
      assert(new String(Files.readAllBytes(f1.path), "UTF-8") == body)
      // unchanged origin → cache hit, no re-download
      assert(!Fetch.fetch(url, dir).refetched)
      // origin updated (size + mtime move) → refetched, new bytes land
      body = "gene\tstart\ng1\t100\ng2\t250\n"
      mtime += 60000
      val f3 = Fetch.fetch(url, dir)
      assert(f3.refetched)
      assert(new String(Files.readAllBytes(f3.path), "UTF-8") == body)
      // force wins even when fresh
      assert(Fetch.fetch(url, dir, force = true).refetched)
    }
  }

  test("biomart martservice round trip over HTTP: query URL → TSV → scan") {
    val attrs = Seq("ensembl_gene_id", "external_gene_name", "start_position")
    val tsv = "Gene stable ID\tGene name\tGene start (bp)\n" +
      "ENSG01\tTP53\t100\nENSG02\tBRCA1\t250\n"
    @volatile var queryParamSeen: String = null
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/biomart/martservice", (ex: HttpExchange) => {
      queryParamSeen = ex.getRequestURI.getRawQuery
      val bytes = tsv.getBytes("UTF-8")
      ex.getResponseHeaders.set("Last-Modified", rfc1123(1700000000000L))
      ex.sendResponseHeaders(200, bytes.length.toLong)
      if (ex.getRequestMethod != "HEAD") ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val query = Biomart.buildQuery("hsapiens_gene_ensembl", attrs)
      val url = Biomart.requestUrl(base, query)
      val dir = Files.createTempDirectory("graft-mart").toString
      val landed = Fetch.fetch(url, dir)
      // the server received the urlencoded Query XML the reference sends
      assert(queryParamSeen != null && queryParamSeen.startsWith("query="))
      assert(java.net.URLDecoder.decode(
        queryParamSeen.stripPrefix("query="), "UTF-8") == query)
      // landed response scans with attribute-name columns
      val df = Biomart.scanResponse(spark, landed.path.toString, attrs)
      import spark.implicits._
      val rows = df.as[(String, String, String)].collect().toSet
      assert(rows == Set(("ENSG01", "TP53", "100"), ("ENSG02", "BRCA1", "250")))
    } finally server.stop(0)
  }
}
