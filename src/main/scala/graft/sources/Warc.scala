package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (ISO 28500 / WARC-1.0) ingestion: the raw-file side of the
  * Common-Crawl-style input table. The north-rule corpus arrives as an
  * Iceberg table of `(url, warc_ts, html, …)` rows, but the upstream of
  * that table in a real deployment is crawl archive files — WARC
  * `response` records, one gzip member per record (`.warc.gz`, the
  * Common Crawl layout) or plain concatenated records (`.warc`). This
  * module parses those files INTO the table shape, so a user can run the
  * whole pipeline straight off an archive dump.
  *
  * Parse contract (never throws, the kernel discipline):
  *   - only `WARC-Type: response` records with an HTTP response payload
  *     (`Content-Type: application/http` + `msgtype=response`) yield
  *     rows; `warcinfo` / `request` / `metadata` records are skipped;
  *   - the HTTP status line + headers are stripped — the emitted `html`
  *     is the raw body bytes, exactly what the table's `html` column
  *     holds;
  *   - `WARC-Date` (W3C/ISO-8601 instant, optional fractional seconds)
  *     becomes `warc_ts`; an unparsable date yields the epoch-0 sentinel
  *     (the [[graft.ops.LinkOps.parseSitemap]] convention);
  *   - a gzip payload (1f 8b magic) is inflated first — Common Crawl's
  *     member-per-record gzip concatenation reads as one stream;
  *     inflation is capped ([[MaxInflatedBytes]]) so a corrupt or
  *     hostile file cannot balloon a task — records parsed before the
  *     cap are still returned;
  *   - torn tails (truncated header block, Content-Length past EOF) end
  *     the scan; everything parsed before the tear is returned.
  *
  * Scale shape: parsing is a map-only `flatMap` per file row — no
  * shuffle, no driver funnel. One task holds one file's bytes (inflated)
  * — the same bound as any binary-file ingest; crawl archives are
  * written in ~1 GiB files precisely so this holds, and
  * `spark.sql.files.maxPartitionBytes` keeps one file per task at that
  * size. The writer side ([[record]]/[[buildFile]]) is deterministic
  * byte-for-byte (fixed header order, zero gzip mtime) so synthesized
  * fixtures are reproducible across JVMs.
  */
object Warc {

  /** One parsed response record in the input-table shape. */
  final case class WarcDoc(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte])

  /** Inflation cap per file (zip-bomb guard): 1 GiB. */
  val MaxInflatedBytes: Int = 1 << 30

  private val CRLF = "\r\n"
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  // ---------------------------------------------------------------- write

  /** One WARC/1.0 `response` record for (url, epoch-millis, body) —
    * deterministic: fixed header order, record id derived from the url,
    * millisecond-precision date (round-trips the table's timestamp). */
  def record(url: String, tsMillis: Long, body: Array[Byte]): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: application/octet-stream" + CRLF +
      "Content-Length: " + body.length + CRLF + CRLF).getBytes(UTF_8)
    val block = http ++ body
    val header = ("WARC/1.0" + CRLF +
      "WARC-Type: response" + CRLF +
      "WARC-Record-ID: <urn:graft:" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(url).toLong & 0xffffffffL) + ">" + CRLF +
      "WARC-Target-URI: " + url + CRLF +
      "WARC-Date: " + tsFmt.format(Instant.ofEpochMilli(tsMillis)) + CRLF +
      "Content-Type: application/http; msgtype=response" + CRLF +
      "Content-Length: " + block.length + CRLF + CRLF).getBytes(UTF_8)
    header ++ block ++ (CRLF + CRLF).getBytes(UTF_8)
  }

  /** A `warcinfo` header record (real files start with one — exercises
    * the parser's skip path). */
  def warcinfo(filename: String): Array[Byte] = {
    val body = ("software: graft" + CRLF + "format: WARC File Format 1.0" + CRLF)
      .getBytes(UTF_8)
    val header = ("WARC/1.0" + CRLF +
      "WARC-Type: warcinfo" + CRLF +
      "WARC-Filename: " + filename + CRLF +
      "WARC-Date: " + tsFmt.format(Instant.ofEpochMilli(0L)) + CRLF +
      "Content-Type: application/warc-fields" + CRLF +
      "Content-Length: " + body.length + CRLF + CRLF).getBytes(UTF_8)
    header ++ body ++ (CRLF + CRLF).getBytes(UTF_8)
  }

  /** One deterministic gzip member (mtime 0 — the JDK default — so the
    * bytes are reproducible). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** A whole archive file for in-order (url, epoch-millis, body) rows:
    * warcinfo first, then one response record per row. `gzip = true`
    * emits one gzip member PER RECORD concatenated (the Common Crawl
    * `.warc.gz` layout — each record independently inflatable). */
  def buildFile(rows: Seq[(String, Long, Array[Byte])], gzip: Boolean,
      filename: String = "graft.warc"): Array[Byte] = {
    val records = warcinfo(filename) +: rows.map { case (u, t, b) => record(u, t, b) }
    val bos = new ByteArrayOutputStream(records.iterator.map(_.length).sum)
    records.foreach(r => bos.write(if (gzip) gzipMember(r) else r))
    bos.toByteArray
  }

  // ---------------------------------------------------------------- parse

  /** Parse every response record of one archive file (plain or gzip) —
    * the never-throw file worker. */
  def parseAll(bytes: Array[Byte]): Seq[WarcDoc] = {
    if (bytes == null || bytes.length < 4) return Nil
    try {
      val buf = if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        inflateCapped(bytes) else bytes
      val out = Vector.newBuilder[WarcDoc]
      var i = 0
      var torn = false
      while (!torn && i < buf.length) {
        nextRecord(buf, i) match {
          case Some((doc, next)) => doc.foreach(out += _); i = next
          case None => torn = true
        }
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Inflate a (possibly member-concatenated) gzip stream up to the cap;
    * a truncated/corrupt tail keeps what inflated before it. */
  private def inflateCapped(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
    val tmp = new Array[Byte](64 * 1024)
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      var n = in.read(tmp)
      while (n >= 0 && out.size() < MaxInflatedBytes) {
        out.write(tmp, 0, n)
        n = in.read(tmp)
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    out.toByteArray
  }

  /** Scan one record starting at `i`: Some((maybeDoc, nextOffset)) or
    * None when the tail is torn / not a record boundary. Skips stray
    * CRLFs between records (tolerant of missing/extra trailers). */
  private def nextRecord(buf: Array[Byte], start: Int): Option[(Option[WarcDoc], Int)] = {
    var i = start
    while (i + 1 < buf.length && buf(i) == '\r' && buf(i + 1) == '\n') i += 2
    if (i >= buf.length) return Some((None, buf.length))
    val hdrEnd = indexOfBlankLine(buf, i)
    if (hdrEnd < 0) return None
    val headerText = new String(buf, i, hdrEnd - i, UTF_8)
    val lines = headerText.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val hdrs = lines.iterator.drop(1).flatMap { l =>
      val c = l.indexOf(':')
      if (c > 0) Some((l.substring(0, c).trim.toLowerCase,
        l.substring(c + 1).trim)) else None
    }.toMap
    val len = hdrs.get("content-length").flatMap(v => v.toLongOption)
      .getOrElse(-1L)
    if (len < 0 || hdrEnd + 4 + len > buf.length) return None
    val blockStart = hdrEnd + 4
    val blockEnd = (blockStart + len).toInt
    val doc =
      if (hdrs.get("warc-type").contains("response") &&
          hdrs.get("content-type").exists(_.contains("msgtype=response")) &&
          hdrs.contains("warc-target-uri")) {
        val httpEnd = indexOfBlankLine(buf, blockStart)
        // body = after the HTTP header block when one exists inside the
        // record block; a header-less block is taken whole (tolerant)
        val bodyStart =
          if (httpEnd >= 0 && httpEnd + 4 <= blockEnd) httpEnd + 4 else blockStart
        val body = java.util.Arrays.copyOfRange(buf, bodyStart, blockEnd)
        Some(WarcDoc(hdrs("warc-target-uri"), parseDate(hdrs.get("warc-date")), body))
      } else None
    Some((doc, blockEnd))
  }

  private def indexOfBlankLine(buf: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < buf.length) {
      if (buf(i) == '\r' && buf(i + 1) == '\n' && buf(i + 2) == '\r' && buf(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** ISO-8601 instant → Timestamp; absent/unparsable → epoch 0 (the
    * sitemap-lastmod sentinel convention). */
  private def parseDate(v: Option[String]): java.sql.Timestamp =
    new java.sql.Timestamp(v.flatMap { s =>
      try Some(Instant.parse(s).toEpochMilli)
      catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(0L))

  // ---------------------------------------------------------------- spark

  /** Archive-files table → input table: map-only flatMap of [[parseAll]]
    * over the binary column; emits exactly the north-rule ingest shape
    * `(url, warc_ts, html)`. */
  def readWarcTable(files: DataFrame, dataCol: String = "data"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(dataCol)).as[Array[Byte]]
      .flatMap(parseAll _)
      .toDF("url", "warc_ts", "html")
  }

  /** Directory of `.warc` / `.warc.gz` files → input table, via Spark's
    * `binaryFile` source (each file one row; `maxPartitionBytes` keeps
    * one file per task at archive sizes). */
  def readWarcDirectory(spark: SparkSession, path: String): DataFrame =
    readWarcTable(
      spark.read.format("binaryFile").load(path).select(col("content")),
      "content")
}
