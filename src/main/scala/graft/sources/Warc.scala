package graft.sources

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

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
  * [[read]] is DISTRIBUTED by shard: the driver lists the shard paths
  * (a 100 TB crawl is ~100 k shards — a trivial listing) and each task
  * opens ONE shard through the Hadoop filesystem and walks it with a
  * STREAMING record cursor ([[records]]): at no point is more than one
  * record's payload buffered, so a ~1 GB .gz shard that decompresses to
  * 3-5 GB reads fine — there is no whole-shard array and no 2 GB
  * file-size ceiling. `.gz` shards decompress through GZIPInputStream
  * (multistream members concatenate — the CC member-per-record
  * convention reads transparently).
  *
  * Malformed bytes fail LOUDLY (IllegalArgumentException with the
  * offset) — a truncated crawl shard is an ingestion incident, not a
  * row to silently drop. A single record whose Content-Length exceeds
  * the per-record buffer cap (2 GiB JVM array limit, or a test-injected
  * smaller cap) also fails loudly instead of wrapping `toInt`. */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("url", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType)))

  /** Fixture/test encoder: one spec-conformant WARC file from (type,
    * url, contentType, payload) records; gzip when `path` ends `.gz`
    * (one member per record — the CC convention). Each gzip member is
    * encoded into its own closed stream so no Deflater leaks. */
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
          val member = new ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(member)
          gz.write(rec.toByteArray)
          gz.close() // member boundary; releases the native Deflater
          member.writeTo(out)
        } else out.write(rec.toByteArray)
      }
    } finally out.close()
  }

  /** STREAMING record cursor over one shard's (already-decompressed)
    * byte stream. Buffers at most one record's payload at a time — the
    * decompressed shard is never materialized, so shard size is
    * unbounded. `maxRecordBytes` caps the single-record buffer (JVM
    * array ceiling by default; specs inject a small cap to prove the
    * cursor holds one record, not the shard). Closes `in` on clean
    * exhaustion AND on a malformed-shard failure; when running inside a
    * task, a completion listener also closes it if the iterator is
    * abandoned part-way (a downstream limit/take) — the long-running
    * streaming reader must never leak a Hadoop/GZIP handle. */
  private[graft] def records(
      in: InputStream,
      where: String,
      maxRecordBytes: Long = Int.MaxValue - 8): Iterator[Row] =
    new Iterator[Row] {
      private val input = new java.io.BufferedInputStream(in, 1 << 16)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          try input.close() catch { case _: java.io.IOException => }
        })
      private var offset = 0L
      private var pending: Row = _
      private var done = false

      private def fail(why: String): Nothing = {
        try input.close() catch { case _: java.io.IOException => }
        throw new IllegalArgumentException(
          s"malformed WARC in $where at byte $offset: $why")
      }

      private def readByte(): Int = {
        val b = input.read(); if (b >= 0) offset += 1; b
      }

      /** One CRLF-terminated ASCII header line (terminator stripped);
        * null on clean EOF at line start (= end of shard). */
      private def readLine(): String = {
        var b = readByte()
        if (b < 0) return null
        val sb = new java.lang.StringBuilder(96)
        while (b >= 0 && b != '\n') { sb.append(b.toChar); b = readByte() }
        if (b < 0) fail("EOF inside header line")
        val n = sb.length()
        if (n == 0 || sb.charAt(n - 1) != '\r')
          fail("header line not CRLF-terminated")
        sb.setLength(n - 1)
        sb.toString
      }

      private def readFully(buf: Array[Byte]): Unit = {
        var p = 0
        while (p < buf.length) {
          val n = input.read(buf, p, buf.length - p)
          if (n < 0) fail("truncated payload")
          p += n; offset += n
        }
      }

      private def advance(): Unit = {
        val first = readLine()
        if (first == null) { done = true; input.close(); return }
        if (!first.startsWith("WARC/"))
          fail(s"expected WARC/ version line, got '$first'")
        val hs = scala.collection.mutable.Map.empty[String, String]
        var line = readLine()
        while (line != null && line.nonEmpty) {
          val c = line.indexOf(':')
          if (c < 0) fail(s"header line without ':' — '$line'")
          hs(line.substring(0, c).trim.toLowerCase) =
            line.substring(c + 1).trim
          line = readLine()
        }
        if (line == null) fail("unterminated header block")
        val len = hs.getOrElse("content-length",
          fail("missing Content-Length")).toLong
        if (len < 0) fail(s"negative Content-Length $len")
        if (len > maxRecordBytes)
          fail(s"Content-Length $len exceeds the per-record buffer cap " +
            s"$maxRecordBytes — a single record cannot be buffered")
        val payload = new Array[Byte](len.toInt)
        readFully(payload)
        val bound = new Array[Byte](4)
        readFully(bound)
        if (bound(0) != '\r' || bound(1) != '\n' ||
          bound(2) != '\r' || bound(3) != '\n')
          fail("missing record boundary")
        pending = Row(hs.getOrElse("warc-type", null),
          hs.getOrElse("warc-target-uri", null),
          hs.getOrElse("content-type", null), len, payload)
      }

      override def hasNext: Boolean = {
        if (pending == null && !done) advance()
        pending != null
      }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException("end of WARC shard")
        val r = pending; pending = null; r
      }
    }

  /** Open one shard path through the Hadoop filesystem, decompressing
    * `.gz` on the fly (bounded inflate buffer — never the whole shard). */
  private[graft] def openShard(conf: Configuration, path: String): InputStream = {
    val p = new Path(path)
    val raw = p.getFileSystem(conf).open(p)
    if (path.endsWith(".gz"))
      new java.util.zip.GZIPInputStream(raw, 1 << 16)
    else raw
  }

  /** Driver-side shard listing (glob, file, or directory). ~100 k paths
    * for a full crawl — trivially driver-sized. */
  private[graft] def listShards(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }.filter(_.isFile).map(_.getPath.toString).sorted
  }

  /** Distributed WARC scan: one row per record across every shard under
    * `path`. One task per shard (the production parallelism: CC ships
    * ~1 GB shards by the tens of thousands, so a 100 TB crawl is ~100 k
    * independent tasks with no data shuffle — only the tiny path list
    * redistributes). Per task the record walk is a single streaming
    * pass; memory high-water mark is one record, not one shard.
    * Columns: [[schema]]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val shards = listShards(spark, path)
    require(shards.nonEmpty, s"no WARC shards match $path")
    val bconf = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    val paths = spark.createDataset(shards)(Encoders.STRING)
      .repartition(shards.size) // one shard per task
    paths.mapPartitions { it =>
      it.flatMap { p => records(openShard(bconf.value.value, p), p) }
    }(Encoders.row(schema))
  }

  /** WET (extracted-text) scan — the sibling format real pipelines
    * consume NEXT to WARC: Common Crawl publishes a `.warc.wet.gz`
    * shard per crawl shard with the SAME ISO-28500 container grammar,
    * one `WARC-Type: conversion` record per page whose payload is the
    * page's extracted plain text (UTF-8), plus a leading `warcinfo`
    * header record per shard. The container walk is [[read]]'s streaming
    * cursor verbatim (one task per shard, one record buffered at a
    * time); this is the text-typed view on top: conversion records
    * only, payload decoded to a string. Columns: (url, text). */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path)
      .where(col("warc_type") === "conversion")
      .select(col("url"), col("payload").cast("string").as("text"))
  }

  /** WAT (link-metadata) scan — the third member of Common Crawl's
    * WARC/WAT/WET trio: one `WARC-Type: metadata` record per page on
    * the same ISO-28500 container, payload a JSON envelope whose
    * `Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata
    * .Links` array lists the page's outlinks — `path: "A@/href"` marks
    * anchor hrefs (vs IMG@/src etc). This is the CHEAP input real
    * link-graph pipelines consume: the link rows without fetching or
    * parsing the page HTML. The container walk is [[read]]'s streaming
    * cursor verbatim; the JSON parse is Spark's codegen'd `from_json`
    * against the minimal schema (unknown envelope fields skip for
    * free — no UDF, no driver work). One row per ANCHOR link:
    * (src_url, dst_url), relative/pseudo targets included as published
    * (filtering absolute http(s) is the graph layer's policy —
    * [[graft.llm.Graph.linkEdges]]). */
  def readWat(spark: SparkSession, path: String): DataFrame =
    watLinks(read(spark, path))

  /** The WAT link projection over a [[schema]]-shaped record frame —
    * shared verbatim by the batch reader above and the streaming shard
    * watcher ([[graft.streaming.Streams.streamingWatRecords]]), so the
    * two paths cannot disagree on parse or filter rules. */
  private[graft] def watLinks(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val linksType = ArrayType(StructType(Seq(
      StructField("path", StringType),
      StructField("url", StringType))))
    val watSchema = StructType(Seq(StructField("Envelope", StructType(Seq(
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Links", linksType)))))))))))))))
    records
      .where(col("warc_type") === "metadata")
      .select(col("url").as("src_url"),
        from_json(col("payload").cast("string"), watSchema).as("__w__"))
      .select(col("src_url"),
        explode(col("__w__")
          .getField("Envelope").getField("Payload-Metadata")
          .getField("HTTP-Response-Metadata").getField("HTML-Metadata")
          .getField("Links")).as("__l__"))
      .where(col("__l__").getField("path") === "A@/href" &&
        col("__l__").getField("url").isNotNull)
      .select(col("src_url"), col("__l__").getField("url").as("dst_url"))
  }
}
