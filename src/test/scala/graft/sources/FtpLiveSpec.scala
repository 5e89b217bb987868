package graft.sources

import java.io.IOException
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** LIVE-protocol FTP test: a minimal in-JVM FTP server (control channel +
  * per-PASV one-shot data sockets) serving a canned DATASUS-style
  * directory, driven by the socket-level client — login, CWD, NLST
  * newest-probe, SIZE+RETR download, and the error paths.
  */
class FtpLiveSpec extends AnyFunSuite {

  private val files = Map(
    "CNES_202604.zip" -> "april-bytes".getBytes(StandardCharsets.UTF_8),
    "CNES_202606.zip" -> "june-bytes-largest".getBytes(StandardCharsets.UTF_8),
    "CNES_202605.zip" -> "may-bytes!".getBytes(StandardCharsets.UTF_8),
    "SIH_202601.dbc" -> Array.tabulate[Byte](257)(_.toByte))

  /** One client connection at a time is plenty for the spec. */
  private final class FakeFtpServer {
    private val control = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    @volatile private var running = true
    val port: Int = control.getLocalPort

    private val thread = new Thread(() => {
      while (running) {
        try serve(control.accept())
        catch { case _: Exception if !running => () case _: Exception => () }
      }
    })
    thread.setDaemon(true)
    thread.start()

    private def serve(s: Socket): Unit = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        s.getInputStream, StandardCharsets.US_ASCII))
      val out = s.getOutputStream
      def reply(line: String): Unit = {
        out.write((line + "\r\n").getBytes(StandardCharsets.US_ASCII))
        out.flush()
      }
      var cwd = "/"
      var data: ServerSocket = null
      // multi-line greeting exercises the client's RFC 959 reply parser
      reply("220-datasus fake ftp")
      reply("220 ready")
      var open = true
      while (open) {
        val line = in.readLine()
        if (line == null) { open = false }
        else {
          val (c, arg) = line.split(" ", 2) match {
            case Array(a, b) => (a.toUpperCase, b)
            case Array(a) => (a.toUpperCase, "")
          }
          c match {
            case "USER" => reply(if (arg == "anonymous") "230 ok" else "331 need pass")
            case "PASS" => reply("230 ok")
            case "TYPE" => reply("200 ok")
            case "CWD" =>
              if (arg == "/dissemin/publicos/CNES") { cwd = arg; reply("250 ok") }
              else reply(s"550 no such directory: $arg")
            case "SIZE" => files.get(arg) match {
              case Some(b) => reply(s"213 ${b.length}")
              case None => reply("550 not found")
            }
            case "PASV" =>
              if (data != null) data.close()
              data = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
              val p = data.getLocalPort
              // advertise a BOGUS host (NAT'd-server shape): the client
              // must ignore it and connect the data channel to the
              // control host (ftplib bpo-43285 semantics) — honoring it
              // would hang against 10.99.99.99
              reply(s"227 Entering Passive Mode (10,99,99,99,${p / 256},${p % 256})")
            case "NLST" =>
              reply("150 here it comes")
              val d = data.accept()
              d.getOutputStream.write(files.keys.toSeq.sorted
                .mkString("", "\r\n", "\r\n").getBytes(StandardCharsets.US_ASCII))
              d.close()
              reply("226 done")
            case "RETR" => files.get(arg) match {
              case Some(b) =>
                reply("150 opening")
                val d = data.accept()
                d.getOutputStream.write(b)
                d.close()
                reply("226 done")
              case None => reply("550 not found")
            }
            case "QUIT" => reply("221 bye"); open = false
            case _ => reply(s"502 not implemented: $c")
          }
        }
      }
      if (data != null) data.close()
      s.close()
    }

    def stop(): Unit = { running = false; control.close() }
  }

  test("newest-version probe over a live server: NLST, base filter, desc sort, yyyymm snapshot") {
    val srv = new FakeFtpServer
    try {
      val (file, snapshot) = FtpReader.checkNewestFileVersion(
        "127.0.0.1", srv.port, "/dissemin/publicos/CNES", "CNES_")
      assert(file == "CNES_202606.zip" && snapshot == "2026-06")
    } finally srv.stop()
  }

  test("download over a live server: SIZE matches, RETR bytes land intact (binary-safe)") {
    val srv = new FakeFtpServer
    val outDir = java.nio.file.Files.createTempDirectory("ftp-dl").toString
    try {
      val (path, size) = FtpReader.download("127.0.0.1", srv.port,
        "/dissemin/publicos/CNES", "SIH_202601.dbc", outDir)
      assert(size == 257)
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      assert(bytes.toSeq == files("SIH_202601.dbc").toSeq) // all 256 byte values
    } finally srv.stop()
  }

  test("error paths are loud: bad directory, missing file, no matching base") {
    val srv = new FakeFtpServer
    try {
      val e1 = intercept[IOException](FtpReader.checkNewestFileVersion(
        "127.0.0.1", srv.port, "/wrong/dir", "CNES_"))
      assert(e1.getMessage.contains("550"))
      val e2 = intercept[IOException](FtpReader.download("127.0.0.1", srv.port,
        "/dissemin/publicos/CNES", "NOPE.zip", "/tmp"))
      assert(e2.getMessage.contains("550"))
      intercept[IllegalArgumentException](
        FtpReader.newestFileVersion(Seq("CNES_202606.zip"), "SIA_"))
      intercept[IllegalArgumentException](
        FtpReader.newestFileVersion(Seq("CNES_latest.zip"), "CNES_"))
    } finally srv.stop()
  }
}
