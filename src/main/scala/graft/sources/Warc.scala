package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC/1.0 container codec — the Common Crawl ingestion format (ISO
  * 28500, public spec; reference behavior: hashquery ingests whatever
  * its warehouse already holds, but a training-data pipeline's FIRST
  * step is the crawl container itself).
  *
  * Layout per record (the subset every CC record uses):
  * {{{
  *   WARC/1.0\r\n
  *   <Name>: <value>\r\n ...           (headers; Content-Length required)
  *   \r\n
  *   <payload: Content-Length bytes>
  *   \r\n\r\n                          (record boundary)
  * }}}
  *
  * [[read]] is DISTRIBUTED by file: Spark's `binaryFile` source gives
  * one task per shard, which is the production parallelism — CC ships
  * ~1 GB shards by the tens of thousands, so a 100 TB crawl is ~100 k
  * independent tasks with no shuffle at all. Per task the record walk
  * is a single pass over the shard bytes. `.gz` shards decompress
  * through GZIPInputStream (multistream members concatenate — the CC
  * member-per-record convention reads transparently). binaryFile holds
  * a whole shard in memory (Spark caps files at 2 GB): exactly the CC
  * shard-size contract.
  *
  * Malformed bytes fail LOUDLY (IllegalArgumentException with the
  * offset) — a truncated crawl shard is an ingestion incident, not a
  * row to silently drop. */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("url", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType)))

  /** Fixture/test encoder: one spec-conformant WARC file from (type,
    * url, contentType, payload) records; gzip when `path` ends `.gz`
    * (one member per record — the CC convention). */
  def write(
      path: String,
      records: Seq[(String, String, String, Array[Byte])]): Unit = {
    val out = new java.io.FileOutputStream(path)
    try {
      records.foreach { case (wtype, url, ct, payload) =>
        val head = new StringBuilder()
          .append("WARC/1.0\r\n")
          .append(s"WARC-Type: $wtype\r\n")
          .append(s"WARC-Target-URI: $url\r\n")
          .append(s"Content-Type: $ct\r\n")
          .append(s"Content-Length: ${payload.length}\r\n")
          .append("\r\n")
          .toString.getBytes(US_ASCII)
        val rec = new ByteArrayOutputStream()
        rec.write(head)
        rec.write(payload)
        rec.write("\r\n\r\n".getBytes(US_ASCII))
        if (path.endsWith(".gz")) {
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(rec.toByteArray)
          gz.finish() // member boundary, stream stays open
        } else out.write(rec.toByteArray)
      }
    } finally out.close()
  }

  /** Parse one shard's bytes into records (single pass). */
  private[graft] def parse(bytes: Array[Byte]): Seq[Row] = {
    def fail(i: Int, why: String): Nothing =
      throw new IllegalArgumentException(s"malformed WARC at byte $i: $why")
    val out = Seq.newBuilder[Row]
    var i = 0
    while (i < bytes.length) {
      // header block: ASCII lines to the first empty line
      val headEnd = indexOfCrlfCrlf(bytes, i)
      if (headEnd < 0) fail(i, "unterminated header block")
      val head = new String(bytes, i, headEnd - i, US_ASCII)
      val lines = head.split("\r\n")
      if (lines.isEmpty || !lines(0).startsWith("WARC/"))
        fail(i, s"expected WARC/ version line, got '${lines.headOption.getOrElse("")}'")
      val hs = lines.drop(1).map { l =>
        val c = l.indexOf(':')
        if (c < 0) fail(i, s"header line without ':' — '$l'")
        l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim
      }.toMap
      val len = hs.getOrElse("content-length",
        fail(i, "missing Content-Length")).toLong
      val payloadStart = headEnd + 4
      if (payloadStart + len > bytes.length) fail(i, "truncated payload")
      val payload = java.util.Arrays.copyOfRange(
        bytes, payloadStart, payloadStart + len.toInt)
      out += Row(hs.getOrElse("warc-type", null),
        hs.getOrElse("warc-target-uri", null),
        hs.getOrElse("content-type", null), len, payload)
      var j = payloadStart + len.toInt
      // record boundary: exactly one \r\n\r\n
      if (j + 4 > bytes.length ||
        bytes(j) != '\r' || bytes(j + 1) != '\n' ||
        bytes(j + 2) != '\r' || bytes(j + 3) != '\n')
        fail(j, "missing record boundary")
      i = j + 4
    }
    out.result()
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Distributed WARC scan: one row per record across every shard under
    * `path` (file-level task parallelism; `.gz` shards decompress in
    * the task). Columns: [[schema]]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val raw = r.getAs[Array[Byte]]("content")
        val bytes =
          if (r.getString(0).endsWith(".gz")) gunzipAll(raw) else raw
        parse(bytes)
      }
    }(Encoders.row(schema))
  }
}
