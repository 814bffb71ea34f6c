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

  /** One parsed `conversion` (WET extracted-text) record. */
  final case class WetDoc(url: String, warc_ts: java.sql.Timestamp, text: String)

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

  /** One WARC/1.0 `conversion` record — the WET (extracted-text) archive
    * shape Common Crawl publishes alongside its response archives: plain
    * UTF-8 text, NO HTTP header block, `Content-Length` counting the
    * text's UTF-8 BYTES (multibyte text round-trips exactly).
    * Deterministic like [[record]]: fixed header order, url-derived ids,
    * millisecond date. */
  def conversionRecord(url: String, tsMillis: Long, text: String): Array[Byte] = {
    val body = text.getBytes(UTF_8)
    val idHex = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(url).toLong & 0xffffffffL)
    val header = ("WARC/1.0" + CRLF +
      "WARC-Type: conversion" + CRLF +
      "WARC-Record-ID: <urn:graft:wet:" + idHex + ">" + CRLF +
      "WARC-Refers-To: <urn:graft:" + idHex + ">" + CRLF +
      "WARC-Target-URI: " + url + CRLF +
      "WARC-Date: " + tsFmt.format(Instant.ofEpochMilli(tsMillis)) + CRLF +
      "Content-Type: text/plain" + CRLF +
      "Content-Length: " + body.length + CRLF + CRLF).getBytes(UTF_8)
    header ++ body ++ (CRLF + CRLF).getBytes(UTF_8)
  }

  /** A whole WET file for in-order (url, epoch-millis, text) rows:
    * warcinfo first, then one conversion record per row; `gzip = true`
    * emits one member per record (the `.warc.wet.gz` layout). */
  def buildWetFile(rows: Seq[(String, Long, String)], gzip: Boolean,
      filename: String = "graft.warc.wet"): Array[Byte] = {
    val records = warcinfo(filename) +: rows.map { case (u, t, x) => conversionRecord(u, t, x) }
    val bos = new ByteArrayOutputStream(records.iterator.map(_.length).sum)
    records.foreach(r => bos.write(if (gzip) gzipMember(r) else r))
    bos.toByteArray
  }

  /** One parsed `metadata` (WAT sidecar) record: the JSON payload as-is. */
  final case class WatDoc(url: String, warc_ts: java.sql.Timestamp, json: String)

  /** Minimal JSON string escape (backslash, quote, all control chars) —
    * the WAT payload builder's only string dependency. */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The WAT envelope JSON for one page — a documented SUBSET of the
    * Common Crawl WAT schema (warc-header metadata + HTML head title +
    * the outlink Links array), deterministic field order. */
  def watJson(url: String, tsMillis: Long, title: String,
      links: Seq[String]): String = {
    val linksJson = links.map(d => s"""{"url":${jsonStr(d)}}""").mkString("[", ",", "]")
    s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":${jsonStr(url)},""" +
      s""""WARC-Date":${jsonStr(tsFmt.format(Instant.ofEpochMilli(tsMillis)))}},""" +
      s""""Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{""" +
      s""""Head":{"Title":${jsonStr(title)}},"Links":$linksJson}}}}}"""
  }

  /** One WARC/1.0 `metadata` record carrying a WAT JSON payload. */
  def metadataRecord(url: String, tsMillis: Long, json: String): Array[Byte] = {
    val body = json.getBytes(UTF_8)
    val idHex = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(url).toLong & 0xffffffffL)
    val header = ("WARC/1.0" + CRLF +
      "WARC-Type: metadata" + CRLF +
      "WARC-Record-ID: <urn:graft:wat:" + idHex + ">" + CRLF +
      "WARC-Refers-To: <urn:graft:" + idHex + ">" + CRLF +
      "WARC-Target-URI: " + url + CRLF +
      "WARC-Date: " + tsFmt.format(Instant.ofEpochMilli(tsMillis)) + CRLF +
      "Content-Type: application/json" + CRLF +
      "Content-Length: " + body.length + CRLF + CRLF).getBytes(UTF_8)
    header ++ body ++ (CRLF + CRLF).getBytes(UTF_8)
  }

  /** A whole WAT file for in-order (url, epoch-millis, json) rows. */
  def buildWatFile(rows: Seq[(String, Long, String)], gzip: Boolean,
      filename: String = "graft.warc.wat"): Array[Byte] = {
    val records = warcinfo(filename) +: rows.map { case (u, t, j) => metadataRecord(u, t, j) }
    val bos = new ByteArrayOutputStream(records.iterator.map(_.length).sum)
    records.foreach(r => bos.write(if (gzip) gzipMember(r) else r))
    bos.toByteArray
  }

  /** Parse every `metadata` record of one archive file — same never-throw
    * / torn-tail / mixed-file contract as [[parseAll]]/[[parseAllWet]]. */
  def parseAllWat(bytes: Array[Byte]): Seq[WatDoc] =
    scanFile(bytes) { (buf, hdrs, bs, be) =>
      if (hdrs.get("warc-type").contains("metadata") &&
          hdrs.contains("warc-target-uri"))
        Some(WatDoc(hdrs("warc-target-uri"), parseDate(hdrs.get("warc-date")),
          new String(buf, bs, be - bs, UTF_8)))
      else None
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
  def parseAll(bytes: Array[Byte]): Seq[WarcDoc] =
    scanFile(bytes)(responseDoc)

  /** Parse every `conversion` (WET extracted-text) record of one archive
    * file (plain or gzip) — same never-throw / torn-tail contract as
    * [[parseAll]]; response records in a mixed file are skipped, exactly
    * as [[parseAll]] skips conversion records. */
  def parseAllWet(bytes: Array[Byte]): Seq[WetDoc] =
    scanFile(bytes)(conversionDoc)

  /** Shared file scan: inflate if gzip, then walk records front to back,
    * mapping each through `f`; a torn tail keeps what scanned before it. */
  private def scanFile[T](bytes: Array[Byte])(
      f: (Array[Byte], Map[String, String], Int, Int) => Option[T]): Seq[T] = {
    if (bytes == null || bytes.length < 4) return Nil
    try {
      val buf = if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        inflateCapped(bytes) else bytes
      val out = Vector.newBuilder[T]
      var i = 0
      var torn = false
      while (!torn && i < buf.length) {
        nextRecord(buf, i) match {
          case Some((raw, next)) =>
            raw.foreach { case (hdrs, bs, be) => f(buf, hdrs, bs, be).foreach(out += _) }
            i = next
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

  /** Scan one record starting at `i`: Some(((headers, blockStart,
    * blockEnd)?, nextOffset)) or None when the tail is torn / not a
    * record boundary. Skips stray CRLFs between records (tolerant of
    * missing/extra trailers). */
  private def nextRecord(buf: Array[Byte],
      start: Int): Option[(Option[(Map[String, String], Int, Int)], Int)] = {
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
    Some((Some((hdrs, blockStart, blockEnd)), blockEnd))
  }

  /** `response` record → table row: HTTP headers stripped, body bytes. */
  private def responseDoc(buf: Array[Byte], hdrs: Map[String, String],
      blockStart: Int, blockEnd: Int): Option[WarcDoc] =
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

  /** `conversion` record → WET row: the whole block, decoded as UTF-8. */
  private def conversionDoc(buf: Array[Byte], hdrs: Map[String, String],
      blockStart: Int, blockEnd: Int): Option[WetDoc] =
    if (hdrs.get("warc-type").contains("conversion") &&
        hdrs.contains("warc-target-uri")) {
      Some(WetDoc(hdrs("warc-target-uri"), parseDate(hdrs.get("warc-date")),
        new String(buf, blockStart, blockEnd - blockStart, UTF_8)))
    } else None

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

  // ------------------------------------------------------------------ cdx

  /** One CDX capture-index row: where a response record lives inside its
    * archive file. `offset`/`length` delimit the smallest byte slice of
    * the file that independently re-parses to exactly this capture — the
    * whole gzip member for `.warc.gz` (the Common Crawl random-access
    * contract), the header+block record bytes for plain `.warc`. */
  final case class CdxRow(urlkey: String, ts14: String, url: String,
      digest: String, offset: Long, length: Long)

  private val ts14Fmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
    .withZone(java.time.ZoneOffset.UTC)

  /** SURT-style url key (the CDX sort key), documented subset of the
    * archive-tools canonicalization: scheme and fragment dropped, host
    * lowercased, leading `www.` label and default `:80`/`:443` ports
    * stripped, host labels reversed with commas, `)` + path (missing or
    * query-only paths become `/`; query kept verbatim, params unsorted).
    * `https://WWW.News.Example:443/a/b?q=1#top` → `example,news)/a/b?q=1`.
    * The q_cdx_index oracle replays this exact subset in SQL. */
  def surt(url: String): String = {
    val noScheme = url.replaceFirst("^[Hh][Tt][Tt][Pp][Ss]?://", "")
    val noFrag = { val h = noScheme.indexOf('#'); if (h < 0) noScheme else noScheme.take(h) }
    val cut = noFrag.indexWhere(c => c == '/' || c == '?')
    val hostPort = if (cut < 0) noFrag else noFrag.take(cut)
    val rest0 = if (cut < 0) "" else noFrag.drop(cut)
    val rest = if (rest0.isEmpty) "/" else if (rest0.charAt(0) == '?') "/" + rest0 else rest0
    var host = hostPort.toLowerCase(java.util.Locale.ROOT)
      .replaceFirst(":(80|443)$", "")
    if (host.startsWith("www.")) host = host.substring(4)
    host.split("\\.", -1).reverse.mkString(",") + ")" + rest
  }

  /** md5 (lowercase hex) of the UPPERCASE-hex rendering of the body —
    * the repo's replayable digest convention (DuckDB `md5(hex(html))`,
    * same as the round-trip oracles; CC's sha1-b32 is not replayable). */
  def payloadDigest(body: Array[Byte]): String = {
    val up = "0123456789ABCDEF"
    val hexU = new Array[Byte](body.length * 2)
    var i = 0
    while (i < body.length) {
      hexU(2 * i) = up.charAt((body(i) >> 4) & 0xf).toByte
      hexU(2 * i + 1) = up.charAt(body(i) & 0xf).toByte
      i += 1
    }
    val d = java.security.MessageDigest.getInstance("MD5").digest(hexU)
    val lo = "0123456789abcdef"
    val out = new Array[Char](32)
    i = 0
    while (i < 16) {
      out(2 * i) = lo.charAt((d(i) >> 4) & 0xf)
      out(2 * i + 1) = lo.charAt(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Per-member scan of a concatenated-member gzip file: (byte offset,
    * compressed member length, inflated bytes). Walks each RFC 1952
    * header (FEXTRA/FNAME/FCOMMENT/FHCRC honored), inflates the raw
    * deflate stream to find where the member ends, and steps over the
    * 8-byte trailer. Never throws; a torn/corrupt tail or the
    * [[MaxInflatedBytes]] cap keeps the members scanned so far. */
  def gzipMemberScan(bytes: Array[Byte]): Seq[(Long, Long, Array[Byte])] = {
    val out = Vector.newBuilder[(Long, Long, Array[Byte])]
    var pos = 0
    var total = 0L
    try {
      while (pos + 18 <= bytes.length &&
          (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b) {
        val flg = bytes(pos + 3) & 0xff
        var p = pos + 10
        if ((flg & 4) != 0) {
          if (p + 2 > bytes.length) return out.result()
          p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
        }
        if ((flg & 8) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 }
        if ((flg & 16) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 }
        if ((flg & 2) != 0) p += 2
        if (p >= bytes.length) return out.result()
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, p, bytes.length - p)
        val bos = new ByteArrayOutputStream(4096)
        val tmp = new Array[Byte](64 * 1024)
        var stuck = false
        while (!stuck && !inf.finished() && total < MaxInflatedBytes) {
          val n = inf.inflate(tmp)
          if (n > 0) { bos.write(tmp, 0, n); total += n }
          else if (!inf.finished()) stuck = true // truncated input / needs dictionary
        }
        val done = inf.finished()
        val consumed = inf.getBytesRead
        inf.end()
        if (!done) return out.result() // torn deflate or inflation cap
        val end = p + consumed.toInt + 8 // CRC32 + ISIZE trailer
        if (end > bytes.length) return out.result()
        out += ((pos.toLong, (end - pos).toLong, bos.toByteArray))
        pos = end
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => out.result() }
  }

  /** CDX capture index of one archive file — the Common-Crawl-style
    * `cdx` sidecar a 100 TB archive store needs for random access
    * (re-fetch one capture without rescanning the file). Response
    * records only, file order; every row satisfies the slice contract:
    * `parseAll(bytes.slice(offset, offset+length))` yields exactly this
    * capture (pinned in CdxSpec). Never throws; torn tails index the
    * records before the tear. */
  def cdxOf(bytes: Array[Byte]): Seq[CdxRow] = {
    if (bytes == null || bytes.length < 4) return Nil
    def row(d: WarcDoc, off: Long, len: Long) =
      CdxRow(surt(d.url), ts14Fmt.format(java.time.Instant.ofEpochMilli(d.warc_ts.getTime)),
        d.url, payloadDigest(d.html), off, len)
    try {
      if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gzipMemberScan(bytes).flatMap { case (off, len, inflated) =>
          parseAll(inflated).map(row(_, off, len))
        }
      else {
        val out = Vector.newBuilder[CdxRow]
        var i = 0
        var torn = false
        while (!torn && i < bytes.length) {
          while (i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n') i += 2
          val start = i
          nextRecord(bytes, i) match {
            case Some((raw, next)) =>
              raw.flatMap { case (h, bs, be) => responseDoc(bytes, h, bs, be) }
                .foreach(d => out += row(d, start.toLong, (next - start).toLong))
              i = if (next > i) next else bytes.length
            case None => torn = true
          }
        }
        out.result()
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  // ---------------------------------------------------------------- spark

  /** Archive-files table → CDX capture index: map-only flatMap of
    * [[cdxOf]] per file — the same no-shuffle bound as [[readWarcTable]]
    * (index generation rides the ingest scan; sorting/partitioning the
    * index is the caller's write-side choice). */
  def cdxTable(files: DataFrame, dataCol: String = "data",
      fileIdCol: String = "file_id"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(fileIdCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, b) =>
        cdxOf(b).map(r => (fid, r.urlkey, r.ts14, r.url, r.digest, r.offset, r.length))
      }
      .toDF("file_id", "urlkey", "ts14", "url", "digest", "offset", "length")
  }

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

  /** Extracted-text table `(url, warc_ts, text)` → WET archive files
    * `(file_id, data, data_gz)` — the write side of the archive surface
    * (Common Crawl publishes exactly this alongside its response
    * archives). File assignment is `xxhash64(url) mod nFiles`
    * (deterministic, growth-stable — the split-assign convention), rows
    * within a file in url order so the bytes are reproducible across
    * JVMs and retries (an idempotent-sink requirement).
    *
    * Scale shape: ONE shuffle — the text moves once, to its file's
    * writer task, exactly what any archive writer must pay; `nFiles`
    * sizes a task's memory bound the way ~1 GiB archive files do at
    * crawl scale. `mapGroups` builds each file's bytes; no driver
    * funnel, no per-file sort wider than the file. */
  def writeWetTable(pages: DataFrame, nFiles: Int,
      urlCol: String = "url", tsCol: String = "warc_ts",
      textCol: String = "text"): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val spark = pages.sparkSession
    import spark.implicits._
    // null url rows have no archive representation (WARC-Target-URI is
    // the record key) and are dropped; null text/ts coalesce to the
    // empty body / epoch-0 sentinel — the writer never throws
    pages.filter(col(urlCol).isNotNull)
      .select(col(urlCol).cast("string").as("u"),
        coalesce(unix_millis(col(tsCol).cast("timestamp")), lit(0L)).as("ms"),
        coalesce(col(textCol).cast("string"), lit("")).as("x"),
        pmod(xxhash64(col(urlCol).cast("string")), lit(nFiles.toLong)).as("fid"))
      .as[(String, Long, String, Long)]
      .groupByKey(_._4)
      .mapGroups { (fid, it) =>
        val rows = it.map(r => (r._1, r._2, r._3)).toVector.sortBy(_._1)
        (fid, buildWetFile(rows, gzip = false, s"graft-$fid.warc.wet"),
          buildWetFile(rows, gzip = true, s"graft-$fid.warc.wet"))
      }.toDF("file_id", "data", "data_gz")
  }

  /** WET archive files → extracted-text table `(url, warc_ts, text)`:
    * map-only flatMap of [[parseAllWet]], the same no-shuffle bound as
    * [[readWarcTable]]. */
  def readWetTable(files: DataFrame, dataCol: String = "data"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(dataCol)).as[Array[Byte]]
      .flatMap(parseAllWet _)
      .toDF("url", "warc_ts", "text")
  }

  /** WAT sidecar files → metadata table `(url, warc_ts, json)`: map-only
    * flatMap of [[parseAllWat]]. */
  def readWatTable(files: DataFrame, dataCol: String = "data"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(dataCol)).as[Array[Byte]]
      .flatMap(parseAllWat _)
      .toDF("url", "warc_ts", "json")
  }
}
