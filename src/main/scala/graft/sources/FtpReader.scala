package graft.sources

import java.io.{BufferedReader, IOException, InputStreamReader, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** FTP acquisition — the engine half of the reference's DATASUS fetch
  * (reference: pipelines/utils/tasks.py:299-355 `download_from_ftp`,
  * pipelines/datalake/extract_load/datasus_ftp/datasus/utils.py:16-52
  * `check_newest_file_version`), speaking the control/data protocol over
  * raw sockets (USER/PASS, CWD, TYPE I, SIZE, PASV, NLST, RETR, QUIT —
  * the exact command set ftplib issues for these two tasks):
  *
  *  - passive-mode transfers (the 227 host,port reply opens the data
  *    channel, like ftplib's `transfercmd`);
  *  - `download` streams RETR to a local file and returns its path
  *    (tasks.py:335-353);
  *  - `newestFileVersion` replays the probe: NLST, substring-filter on the
  *    base name, DESCENDING sort, first match, `\d{6}` snapshot → "yyyy-MM"
  *    (utils.py:39-52).
  *
  * Driver-side acquisition like every fetch transport here; landed files
  * read distributed via CsvReader/DbfReader/spark.read.
  */
object FtpReader {

  /** One FTP control session. Create, use, `quit()`. */
  final class FtpClient(host: String, port: Int, user: String = "anonymous",
      password: String = "", timeoutMs: Int = 3600000) {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), timeoutMs)
    sock.setSoTimeout(timeoutMs)
    private val in = new BufferedReader(new InputStreamReader(
      sock.getInputStream, StandardCharsets.US_ASCII))
    private val out: OutputStream = sock.getOutputStream

    // a failed greeting/login must not leak the connected socket — the
    // caller's quit() never runs when construction throws
    try {
      expect(readReply(), 220, "greeting")
      // login: 230 = already in (anonymous), 331 = password needed
      cmd(s"USER $user") match {
        case (331, _) => expect(cmd(s"PASS $password"), 230, "PASS")
        case (230, _) => ()
        case (code, text) => throw new IOException(s"USER rejected: $code $text")
      }
    } catch { case e: Throwable => sock.close(); throw e }

    /** Read one (possibly multi-line) reply: lines continue until
      * `NNN<space>` (RFC 959 multi-line form `NNN-...`); a bare `NNN`
      * line is final too (overloaded servers send e.g. plain "421").
      * Malformed replies fail as IOException immediately instead of
      * blocking until the socket timeout or surfacing NumberFormatException.
      */
    private def readReply(): (Int, String) = {
      val sb = new StringBuilder
      var line = in.readLine()
      if (line == null) throw new IOException("FTP connection closed")
      sb.append(line)
      val code = line.take(3)
      if (code.length < 3 || !code.forall(_.isDigit))
        throw new IOException(s"malformed FTP reply: '$line'")
      while (!(line == code || line.startsWith(code + " "))) {
        line = in.readLine()
        if (line == null) throw new IOException("FTP connection closed")
        sb.append('\n').append(line)
      }
      (code.toInt, sb.toString)
    }

    private def cmd(c: String): (Int, String) = {
      out.write((c + "\r\n").getBytes(StandardCharsets.US_ASCII))
      out.flush()
      readReply()
    }

    private def expect(r: (Int, String), want: Int, what: String): String = {
      if (r._1 != want) throw new IOException(s"$what failed: ${r._1} ${r._2}")
      r._2
    }

    def cwd(dir: String): Unit = expect(cmd(s"CWD $dir"), 250, s"CWD $dir")

    /** SIZE in bytes (213 reply), for the reference's pre-download log. */
    def size(file: String): Long =
      expect(cmd(s"SIZE $file"), 213, s"SIZE $file").split(" ").last.trim.toLong

    /** Enter passive mode. The 227 reply's PORT is honored but its HOST is
      * NOT — the data channel connects to the control-connection host, the
      * modern ftplib default (bpo-43285): NAT'd servers advertise internal
      * addresses (hangs) and a malicious one could redirect the data
      * connection to an arbitrary target.
      */
    private def pasv(): Socket = {
      val text = expect(cmd("PASV"), 227, "PASV")
      val nums = "(\\d+),(\\d+),(\\d+),(\\d+),(\\d+),(\\d+)".r
        .findFirstMatchIn(text)
        .getOrElse(throw new IOException(s"unparseable PASV reply: $text"))
      val dataPort = nums.group(5).toInt * 256 + nums.group(6).toInt
      val s = new Socket()
      s.connect(new InetSocketAddress(host, dataPort), timeoutMs)
      s.setSoTimeout(timeoutMs)
      s
    }

    /** A full passive-mode data transfer for `command`, STREAMED to
      * `consume` (150/125 open → drain → 226 close, ftplib transfercmd
      * shape) — never buffers the transfer in memory.
      */
    private def transfer[A](command: String)(
        consume: java.io.InputStream => A): A = {
      val data = pasv()
      try {
        val open = cmd(command)
        if (open._1 != 150 && open._1 != 125)
          throw new IOException(s"$command failed: ${open._1} ${open._2}")
        val result = consume(data.getInputStream)
        expect(readReply(), 226, s"$command completion")
        result
      } finally data.close()
    }

    /** Switch to binary (image) type — required before SIZE as well as
      * RETR: strict servers reject SIZE in ASCII mode, and permissive ones
      * answer the CRLF-adjusted ASCII size, which would disagree with the
      * byte count RETR actually delivers.
      */
    def binary(): Unit = expect(cmd("TYPE I"), 200, "TYPE I")

    /** Directory listing (NLST), one name per line. */
    def nlst(): Seq[String] = {
      expect(cmd("TYPE A"), 200, "TYPE A")
      new String(transfer("NLST")(_.readAllBytes()), StandardCharsets.US_ASCII)
        .split("\r?\n").toSeq.filter(_.nonEmpty)
    }

    /** Binary RETR of one file, streamed to `out` (DATASUS archives run to
      * GBs — buffering a transfer would cap it at heap/2GB). Returns the
      * byte count delivered.
      */
    def retrTo(file: String, out: OutputStream): Long = {
      binary()
      transfer(s"RETR $file")(_.transferTo(out))
    }

    /** Binary RETR of one SMALL file fully in memory (listing-scale only). */
    def retr(file: String): Array[Byte] = {
      binary()
      transfer(s"RETR $file")(_.readAllBytes())
    }

    def quit(): Unit = {
      try { cmd("QUIT"); () } catch { case _: IOException => () }
      sock.close()
    }
  }

  /** The reference's download task: login → CWD → SIZE (logged there,
    * returned here) → RETR to `outputDir/fileName`. Returns the local
    * path (tasks.py:326-355).
    */
  def download(host: String, port: Int, directory: String, fileName: String,
      outputDir: String, user: String = "anonymous", password: String = "",
      timeoutMs: Int = 3600000): (String, Long) = {
    val c = new FtpClient(host, port, user, password, timeoutMs)
    try {
      c.cwd(directory)
      c.binary() // before SIZE: ASCII-mode SIZE is rejected or CRLF-adjusted
      val bytes = c.size(fileName)
      val dest = Paths.get(outputDir, fileName)
      Files.createDirectories(dest.getParent)
      val out = Files.newOutputStream(dest)
      val delivered = try c.retrTo(fileName, out) finally out.close()
      // a flaky server can close the data channel early and still 226 —
      // a silent short file is exactly the corruption SIZE lets us catch
      if (delivered != bytes)
        throw new java.io.IOException(
          s"RETR $fileName delivered $delivered of $bytes bytes")
      (dest.toString, bytes)
    } finally c.quit()
  }

  /** The newest-version probe on a listing (utils.py:39-52): keep names
    * CONTAINING the base, sort descending, take the first, snapshot =
    * first `\d{6}` group as "yyyy-MM". Errors loudly when nothing matches
    * or the name carries no date — silent staleness is the failure mode
    * this probe exists to prevent.
    */
  def newestFileVersion(files: Seq[String], baseFileName: String): (String, String) = {
    val matching = files.filter(_.contains(baseFileName))
    require(matching.nonEmpty, s"no file matching '$baseFileName' in listing")
    val newest = matching.max // = descending-sort head, one pass
    val six = "\\d{6}".r.findFirstIn(newest).getOrElse(
      throw new IllegalArgumentException(s"no yyyymm stamp in '$newest'"))
    (newest, s"${six.take(4)}-${six.drop(4)}")
  }

  /** Probe over a live server: login → CWD → NLST → [[newestFileVersion]]. */
  def checkNewestFileVersion(host: String, port: Int, directory: String,
      baseFileName: String, timeoutMs: Int = 3600000): (String, String) = {
    val c = new FtpClient(host, port, timeoutMs = timeoutMs)
    try { c.cwd(directory); newestFileVersion(c.nlst(), baseFileName) }
    finally c.quit()
  }
}
