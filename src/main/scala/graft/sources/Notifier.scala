package graft.sources

import java.io.{BufferedReader, IOException, InputStreamReader, OutputStream}
import java.net.{InetSocketAddress, Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Presentation delivery — the engine half of the reference's monitor and
  * report notifications (reference: pipelines/utils/monitor.py:17-120
  * Discord webhook, pipelines/reports/utils/emails_subgeral.py:32-160
  * SMTP report mail):
  *
  *  - Discord: webhook POST with the 2000-char content guard CHECKED
  *    BEFORE sending (monitor.py:37-38), optional username, embed
  *    suppression, and the `## title` + flow-context header template
  *    (monitor.py:98-120);
  *  - SMTP: recipient normalization (regex-validate, drop invalid, loud
  *    on empty — emails_subgeral.py:32-57), idempotent LGPD footer append
  *    (:60-82), From/Subject with recipients on BCC so the list is never
  *    exposed (:84-103) — and, like smtplib's send_message, the Bcc
  *    header is STRIPPED from the transmitted payload and used only for
  *    envelope RCPTs; plain + HTML alternative bodies, base64 MIME
  *    attachments (the XlsxWriter artifact is the usual payload — K8's
  *    artifact, K9's delivery), AUTH LOGIN, dot-stuffed DATA.
  */
object Notifier {

  // ------------------------------------------------------------- Discord

  val DiscordContentLimit: Int = 2000

  /** The reference's message header template (monitor.py:110-120). */
  def discordContent(title: String, message: String, environment: String,
      flowName: String, flowRunId: String, taskName: String,
      taskRunId: String, runUrlBase: String): String =
    s"""## $title
       |> Environment: $environment
       |> Flow Run: [$flowName]($runUrlBase/flow-run/$flowRunId)
       |> Task Run: [$taskName]($runUrlBase/task-run/$taskRunId)
       |$message""".stripMargin

  private lazy val http: HttpClient = HttpClient.newHttpClient()

  /** POST to a Discord-style webhook. Content over the limit fails BEFORE
    * any network call (monitor.py:37-38); non-2xx is an error
    * (webhook.send's RuntimeError → ValueError, monitor.py:56-59).
    */
  def sendDiscordWebhook(webhookUrl: String, content: String,
      username: Option[String] = None, suppressEmbeds: Boolean = false,
      timeoutMs: Int = 60000): Unit = {
    require(content.length <= DiscordContentLimit,
      s"Message content is too long: ${content.length} > $DiscordContentLimit characters.")
    val fields = List("content" -> (JString(content): JValue)) ++
      username.map(u => "username" -> (JString(u): JValue)) ++
      (if (suppressEmbeds) List("flags" -> (JInt(4): JValue)) else Nil)
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(webhookUrl))
        .timeout(Duration.ofMillis(timeoutMs.toLong))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          JsonMethods.compact(JsonMethods.render(JObject(fields)))))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new IOException(
        s"Error sending message to webhook: HTTP ${resp.statusCode()}")
  }

  // ---------------------------------------------------------------- email

  private val EmailPattern =
    "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$".r

  /** Recipient normalization (emails_subgeral.py:32-57): trim, drop
    * null/invalid silently, error loudly when NOTHING survives.
    */
  def normalizeRecipients(raw: Seq[String]): Seq[String] = {
    val cleaned = raw.filter(_ != null).map(_.trim)
      .filter(r => r.nonEmpty && EmailPattern.matches(r))
    require(cleaned.nonEmpty, "recipient list empty after normalization")
    cleaned
  }

  /** Idempotent legal-footer append (emails_subgeral.py:60-82): already
    * present → unchanged; HTML bodies get it paragraph-wrapped.
    */
  def appendLgpd(message: String, lgpd: String, isHtml: Boolean): String = {
    val base = Option(message).getOrElse("").stripTrailing()
    val l = lgpd.strip()
    if (l.nonEmpty && base.contains(l)) base
    else if (isHtml) s"$base\n<p>$l</p>"
    else s"$base\n$l"
  }

  final case class Email(senderEmail: String, senderName: String,
      bccRecipients: Seq[String], subject: String,
      plainBody: Option[String], htmlBody: Option[String],
      attachments: Seq[(String, Array[Byte])] = Nil)

  /** Header-value hardening: CR/LF can never cross into a header (a
    * crafted subject would otherwise inject arbitrary headers or
    * terminate DATA early), and non-ASCII values travel RFC 2047
    * B-encoded like email.mime encodes them — raw UTF-8 header bytes are
    * mojibake or rejection on strict MTAs.
    */
  private[sources] def headerValue(raw: String): String = {
    val flat = raw.replaceAll("[\r\n]+", " ")
    if (flat.forall(c => c >= 0x20 && c < 0x7f)) flat
    else "=?UTF-8?B?" + Base64.getEncoder.encodeToString(
      flat.getBytes(StandardCharsets.UTF_8)) + "?="
  }

  /** Serialize to MIME, WITHOUT the Bcc header (smtplib.send_message
    * strips it; the hidden list rides only the envelope):
    * multipart/mixed( multipart/alternative(plain, html), attachments* ).
    */
  def buildMime(email: Email): String = {
    val b1 = "----graft-mixed-boundary"
    val b2 = "----graft-alt-boundary"
    val sb = new StringBuilder
    def line(s: String): Unit = sb.append(s).append("\r\n")
    val sender = s"${headerValue(email.senderName)} <${email.senderEmail}>"
    line(s"From: $sender")
    line(s"To: $sender")
    line(s"Subject: ${headerValue(email.subject)}")
    line("MIME-Version: 1.0")
    line(s"""Content-Type: multipart/mixed; boundary="$b1"""")
    line("")
    line(s"--$b1")
    line(s"""Content-Type: multipart/alternative; boundary="$b2"""")
    line("")
    email.plainBody.foreach { p =>
      line(s"--$b2")
      line("Content-Type: text/plain; charset=utf-8")
      line("Content-Transfer-Encoding: 8bit")
      line("")
      p.split("\r?\n", -1).foreach(line)
    }
    email.htmlBody.foreach { h =>
      line(s"--$b2")
      line("Content-Type: text/html; charset=utf-8")
      line("Content-Transfer-Encoding: 8bit")
      line("")
      h.split("\r?\n", -1).foreach(line)
    }
    line(s"--$b2--")
    email.attachments.foreach { case (name, bytes) =>
      // quote-stripped + CRLF-hardened: a crafted filename must not break
      // out of the quoted-string or inject headers
      val safe = headerValue(name).replace("\"", "")
      line(s"--$b1")
      line("Content-Type: application/octet-stream; name=\"" + safe + "\"")
      line("Content-Transfer-Encoding: base64")
      line("Content-Disposition: attachment; filename=\"" + safe + "\"")
      line("")
      line(Base64.getMimeEncoder(76, "\r\n".getBytes).encodeToString(bytes))
    }
    line(s"--$b1--")
    sb.toString
  }

  /** SMTP submission with AUTH LOGIN: EHLO → AUTH → MAIL FROM → one RCPT
    * per (hidden) recipient → dot-stuffed DATA → QUIT. `socketFactory`
    * is the TLS seam — the reference picks SMTP_SSL by port 465
    * (emails_subgeral.py:119-126), which here is
    * `javax.net.ssl.SSLSocketFactory.getDefault().createSocket(h, p)`;
    * the default is a plain socket (the in-JVM test server, internal
    * relays). The PROTOCOL conversation is identical on both.
    */
  def sendSmtp(host: String, port: Int, user: String, password: String,
      email: Email, timeoutMs: Int = 60000,
      socketFactory: (String, Int) => Socket = null): Unit = {
    val recipients = normalizeRecipients(email.bccRecipients)
    val sock = if (socketFactory != null) socketFactory(host, port) else {
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port), timeoutMs)
      s
    }
    sock.setSoTimeout(timeoutMs)
    try {
      val in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.US_ASCII))
      val out: OutputStream = sock.getOutputStream
      def reply(): (Int, String) = {
        val sb = new StringBuilder
        var l = in.readLine()
        if (l == null) throw new IOException("SMTP connection closed")
        sb.append(l)
        val code = l.take(3)
        if (code.length < 3 || !code.forall(_.isDigit))
          throw new IOException(s"malformed SMTP reply: '$l'")
        while (!(l == code || l.startsWith(code + " "))) {
          l = in.readLine()
          if (l == null) throw new IOException("SMTP connection closed")
          sb.append('\n').append(l)
        }
        (code.toInt, sb.toString)
      }
      def cmd(c: String, want: Int): String = {
        out.write((c + "\r\n").getBytes(StandardCharsets.US_ASCII))
        out.flush()
        val r = reply()
        if (r._1 != want)
          throw new IOException(s"SMTP '$c' failed: ${r._1} ${r._2}")
        r._2
      }
      def expect(want: Int, what: String): Unit = {
        val r = reply()
        if (r._1 != want) throw new IOException(s"$what: ${r._1} ${r._2}")
      }
      expect(220, "greeting")
      cmd(s"EHLO graft", 250)
      cmd("AUTH LOGIN", 334)
      cmd(Base64.getEncoder.encodeToString(
        user.getBytes(StandardCharsets.UTF_8)), 334)
      cmd(Base64.getEncoder.encodeToString(
        password.getBytes(StandardCharsets.UTF_8)), 235)
      cmd(s"MAIL FROM:<${email.senderEmail}>", 250)
      // envelope carries sender (the visible To) plus every hidden BCC
      (email.senderEmail +: recipients).foreach(r => cmd(s"RCPT TO:<$r>", 250))
      cmd("DATA", 354)
      // dot-stuffing (RFC 5321 §4.5.2): payload lines starting with '.'
      // double it so the bare terminator stays unambiguous
      val payload = buildMime(email).split("\r\n", -1).map { l =>
        if (l.startsWith(".")) "." + l else l
      }.mkString("\r\n")
      out.write((payload + "\r\n.\r\n").getBytes(StandardCharsets.UTF_8))
      out.flush()
      expect(250, "DATA completion")
      cmd("QUIT", 221)
    } finally sock.close()
  }
}
