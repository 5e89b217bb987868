package graft.sources

import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** LIVE-protocol presentation delivery: a webhook HTTP endpoint and a
  * minimal in-JVM SMTP server. The headline test ships a real XlsxWriter
  * artifact as a mail attachment and reads it BACK out of the fake
  * server's captured DATA through XlsxReader — K8's artifact through
  * K9's delivery, round-tripped.
  */
class NotifierLiveSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- webhook

  private final class FakeWebhook {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var received: List[JValue] = Nil
    server.createContext("/api/webhooks/123/tok", { ex: HttpExchange =>
      received = received :+ JsonMethods.parse(new String(
        ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      ex.sendResponseHeaders(204, -1)
      ex.close()
    })
    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}/api/webhooks/123/tok"
    def stop(): Unit = server.stop(0)
  }

  test("Discord webhook over live HTTP: content + username posted; oversize guarded BEFORE any call") {
    val wh = new FakeWebhook
    try {
      val content = Notifier.discordContent("Erro no Fluxo X", "3 failures",
        "prod", "flow-a", "fr-1", "task-b", "tr-2", "https://pipelines.example")
      Notifier.sendDiscordWebhook(wh.url, content, username = Some("monitor"))
      assert(wh.received.size == 1)
      val j = wh.received.head
      assert((j \ "username") == JString("monitor"))
      val sent = (j \ "content").asInstanceOf[JString].s
      assert(sent.startsWith("## Erro no Fluxo X") &&
        sent.contains("[flow-a](https://pipelines.example/flow-run/fr-1)"))
      // the 2000-char guard trips before the network call
      val e = intercept[IllegalArgumentException] {
        Notifier.sendDiscordWebhook(wh.url, "x" * 2001)
      }
      assert(e.getMessage.contains("too long") && wh.received.size == 1)
    } finally wh.stop()
  }

  // ---------------------------------------------------------------- smtp

  private final class FakeSmtp(expectUser: String, expectPass: String) {
    private val server = new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    @volatile var from = ""
    @volatile var rcpts: List[String] = Nil
    @volatile var data = ""
    @volatile var authedUser = ""

    private val t = new Thread(() => try serve(server.accept()) catch { case _: Exception => () })
    t.setDaemon(true); t.start()

    private def serve(s: Socket): Unit = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        s.getInputStream, StandardCharsets.US_ASCII))
      val out = s.getOutputStream
      def reply(l: String): Unit = { out.write((l + "\r\n").getBytes); out.flush() }
      reply("220 fake-smtp ready")
      var open = true
      while (open) {
        val line = in.readLine()
        if (line == null) open = false
        else {
          val up = line.toUpperCase
          if (up.startsWith("EHLO")) { reply("250-fake"); reply("250 AUTH LOGIN") }
          else if (up == "AUTH LOGIN") {
            reply("334 VXNlcm5hbWU6")
            val u = new String(Base64.getDecoder.decode(in.readLine()), StandardCharsets.UTF_8)
            reply("334 UGFzc3dvcmQ6")
            val p = new String(Base64.getDecoder.decode(in.readLine()), StandardCharsets.UTF_8)
            if (u == expectUser && p == expectPass) { authedUser = u; reply("235 ok") }
            else reply("535 bad credentials")
          }
          else if (up.startsWith("MAIL FROM:")) { from = line.drop(10).trim; reply("250 ok") }
          else if (up.startsWith("RCPT TO:")) { rcpts = rcpts :+ line.drop(8).trim; reply("250 ok") }
          else if (up == "DATA") {
            reply("354 go ahead")
            val sb = new StringBuilder
            var l = in.readLine()
            while (l != null && l != ".") {
              // un-stuff leading dots like a real server
              sb.append(if (l.startsWith("..")) l.drop(1) else l).append("\r\n")
              l = in.readLine()
            }
            data = sb.toString
            reply("250 accepted")
          }
          else if (up == "QUIT") { reply("221 bye"); open = false }
          else reply("500 what")
        }
      }
      s.close()
    }
    def stop(): Unit = server.close()
  }

  test("report mail over live SMTP: Bcc hidden from payload, LGPD idempotent, XLSX attachment round-trips") {
    // a REAL report artifact: DataFrame -> XlsxWriter bytes
    val tmp = java.nio.file.Files.createTempDirectory("notif").toString
    val xlsxPath = s"$tmp/relatorio.xlsx"
    XlsxWriter.write(
      Seq(("AP32", 17L), ("AP40", 9L)).toDF("unidade", "casos"), xlsxPath)
    val xlsxBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xlsxPath))

    val lgpd = "Mensagem protegida pela LGPD."
    val plain = Notifier.appendLgpd("Segue o relatório.", lgpd, isHtml = false)
    // appending twice must not duplicate
    assert(Notifier.appendLgpd(plain, lgpd, isHtml = false) == plain)
    val html = Notifier.appendLgpd("<b>Segue o relatório.</b>", lgpd, isHtml = true)
    assert(html.endsWith(s"<p>$lgpd</p>"))

    val smtp = new FakeSmtp("svc@saude.example", "pw")
    try {
      val email = Notifier.Email(
        senderEmail = "svc@saude.example", senderName = "Relatórios",
        bccRecipients = Seq(" ana@org.example ", "not-an-email", null,
          "bia@org.example"),
        subject = "Informe semanal",
        plainBody = Some(plain), htmlBody = Some(html),
        attachments = Seq("relatorio.xlsx" -> xlsxBytes))
      Notifier.sendSmtp("127.0.0.1", smtp.port, "svc@saude.example", "pw", email)

      assert(smtp.authedUser == "svc@saude.example")
      assert(smtp.from == "<svc@saude.example>")
      // envelope: sender (visible To) + the two SURVIVING normalized bccs
      assert(smtp.rcpts == List("<svc@saude.example>", "<ana@org.example>",
        "<bia@org.example>"))
      // privacy: the transmitted payload names no recipient
      assert(!smtp.data.contains("Bcc") && !smtp.data.contains("ana@org.example"))
      assert(smtp.data.contains("Subject: Informe semanal"))
      // the non-ASCII sender display name ("Relatórios") travels RFC 2047
      // B-encoded, never as raw UTF-8 header bytes
      assert(smtp.data.contains("From: =?UTF-8?B?"))
      assert(smtp.data.contains("Content-Type: text/plain") &&
        smtp.data.contains("Content-Type: text/html") &&
        smtp.data.contains(lgpd))
      // the attachment survives delivery byte-for-byte: decode the base64
      // part and read it back through XlsxReader
      val b64 = smtp.data.split("\r\n\r\n").last
        .takeWhile(_ != '-').split("\r\n").filter(_.nonEmpty)
        .takeWhile(l => !l.startsWith("--")).mkString
      val back = Base64.getMimeDecoder.decode(b64)
      assert(back.toSeq == xlsxBytes.toSeq)
      val backPath = s"$tmp/back.xlsx"
      java.nio.file.Files.write(java.nio.file.Paths.get(backPath), back)
      val df = XlsxReader.read(spark, backPath)
      assert(df.count() == 2)
      assert(df.where("unidade = 'AP32'").head().getString(1) == "17")
    } finally smtp.stop()
  }

  test("recipient normalization: invalid dropped silently, empty list loud") {
    assert(Notifier.normalizeRecipients(Seq("a@b.co", "junk", "c@d.org")) ==
      Seq("a@b.co", "c@d.org"))
    intercept[IllegalArgumentException](
      Notifier.normalizeRecipients(Seq("junk", "", null)))
  }
}
