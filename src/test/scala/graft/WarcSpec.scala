package graft

import graft.model.Model

/** Round-trip specs for the WARC codec (graft.sources.Warc): the writer
  * exists to prove the reader (the xlsx/PNG/GIF-encoder pattern). */
class WarcSpec extends GraftSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_warc_spec")
      .resolve(name).toString

  private val recs = Seq(
    ("response", "https://a.example/1", "text/plain",
      "hello warc".getBytes("UTF-8")),
    // binary payload containing the record-boundary byte sequence:
    // Content-Length framing must NOT scan for it inside payloads
    ("response", "https://a.example/2", "application/octet-stream",
      Array[Byte](13, 10, 13, 10, 0, -1, 'W', 'A', 'R', 'C')),
    // empty payload
    ("metadata", "https://a.example/3", "text/plain", Array.empty[Byte]))

  private def roundTrip(p: String): Unit = {
    graft.sources.Warc.write(p, recs)
    val rows = graft.sources.Warc.read(spark, p)
      .collect().sortBy(_.getString(1))
    assert(rows.length === 3)
    rows.zip(recs).foreach { case (r, (t, u, ct, payload)) =>
      assert(r.getString(0) === t)
      assert(r.getString(1) === u)
      assert(r.getString(2) === ct)
      assert(r.getLong(3) === payload.length.toLong)
      assert(r.getAs[Array[Byte]](4).toSeq === payload.toSeq)
    }
  }

  test("plain shard round-trips: headers, lengths, exact payload bytes") {
    roundTrip(tmp("shard.warc"))
  }

  test("gzip shard round-trips (multistream member-per-record, the CC convention)") {
    roundTrip(tmp("shard.warc.gz"))
  }

  test("malformed shards fail loudly with the offset") {
    val p = tmp("bad.warc")
    graft.sources.Warc.write(p, recs.take(1))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // truncate mid-payload
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      java.util.Arrays.copyOf(bytes, bytes.length - 8))
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.Warc.read(spark, p).collect()
    }
    assert(e.getCause match {
      case c: IllegalArgumentException => c.getMessage.contains("malformed WARC")
      case c => c.getMessage.contains("malformed WARC")
    })
  }

  test("record cursor streams: shard far larger than the per-record cap reads fine") {
    // The old reader materialized the WHOLE decompressed shard in one
    // JVM array (2 GiB ceiling — a real ~1 GB .gz CC shard breaks it).
    // Prove the cursor buffers one record at a time: inject a 64 KiB
    // per-record cap, stream a shard whose TOTAL decompressed size is
    // ~6 MiB (100× the cap). Under the old design this could not read.
    val p = tmp("big.warc.gz")
    val payload = Array.fill[Byte](60 * 1024)('x')
    graft.sources.Warc.write(p, (0 until 100).map(i =>
      ("response", s"https://big.example/$i", "text/plain", payload)))
    val it = graft.sources.Warc.records(
      graft.sources.Warc.openShard(
        spark.sessionState.newHadoopConf(), p),
      p, maxRecordBytes = 64 * 1024)
    var n = 0
    it.foreach { r => assert(r.getLong(3) === payload.length.toLong); n += 1 }
    assert(n === 100)
    // and the cap itself fails LOUDLY when one record exceeds it
    val tight = graft.sources.Warc.records(
      graft.sources.Warc.openShard(
        spark.sessionState.newHadoopConf(), p),
      p, maxRecordBytes = 1024)
    val e = intercept[IllegalArgumentException] { tight.next() }
    assert(e.getMessage.contains("per-record buffer cap"))
  }

  test("WET view: conversion records only, text decoded, warcinfo skipped; wire round-trip") {
    val p = tmp("pages.warc.wet.gz")
    graft.sources.Warc.write(p, Seq(
      ("warcinfo", "urn:wet:shard", "application/warc-fields",
        "software: graft\r\n".getBytes("UTF-8")),
      ("conversion", "https://a.example/1", "text/plain",
        "extracted text one".getBytes("UTF-8")),
      ("conversion", "https://b.example/2", "text/plain",
        "päge twö é".getBytes("UTF-8")))) // UTF-8 survives decode
    val rows = graft.sources.Warc.readWet(spark, p)
      .orderBy("url").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(
      ("https://a.example/1", "extracted text one"),
      ("https://b.example/2", "päge twö é")))
    // Model.wet composes through the engine and the wire codec
    val m = Model.wet(p)
      .pick(graft.funcs.col("url"), graft.funcs.col("text"))
      .sort(graft.funcs.col("url"))
    val direct = m.run(spark).collect().map(r => (r.getString(0), r.getString(1)))
    val wired = graft.wire.WireFormat
      .fromJson(graft.wire.WireFormat.toJson(m))
      .run(spark).collect().map(r => (r.getString(0), r.getString(1)))
    assert(direct.toSeq === rows.toSeq)
    assert(wired.toSeq === direct.toSeq)
  }

  test("WAT view: anchor links parsed from the JSON metadata, non-anchor paths and warcinfo skipped; wire round-trip") {
    val p = tmp("pages.warc.wat.gz")
    val json1 =
      """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[
        |{"path":"A@/href","url":"https://b.example/x"},
        |{"path":"A@/href","url":"/relative/only"},
        |{"path":"IMG@/src","url":"https://img.example/i.png"},
        |{"path":"A@/href","url":"javascript:void(0)"}
        |]}}}}}""".stripMargin
    // a page with NO HTML-Metadata at all (binary response): parses to
    // a NULL links array and contributes zero rows, never a crash
    val json2 = """{"Envelope":{"Payload-Metadata":{}}}"""
    graft.sources.Warc.write(p, Seq(
      ("warcinfo", "urn:wat:shard", "application/warc-fields",
        "software: graft\r\n".getBytes("UTF-8")),
      ("metadata", "https://a.example/1", "application/json",
        json1.getBytes("UTF-8")),
      ("metadata", "https://c.example/2", "application/json",
        json2.getBytes("UTF-8"))))
    val rows = graft.sources.Warc.readWat(spark, p)
      .orderBy("src_url", "dst_url").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // IMG@/src dropped by the reader; relative/javascript anchors kept
    // as published (the GRAPH layer's rlike drops them)
    assert(rows.toSeq === Seq(
      ("https://a.example/1", "/relative/only"),
      ("https://a.example/1", "https://b.example/x"),
      ("https://a.example/1", "javascript:void(0)")))
    // linkEdges applies the absolute-http + non-self + domain reduction
    val edges = graft.llm.Graph.linkEdges(
      graft.sources.Warc.readWat(spark, p), "src_url", "dst_url")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq === Seq(("a.example", "b.example")))
    // Model.wat composes through the engine and the wire codec
    val m = Model.wat(p)
      .pick(graft.funcs.col("src_url"), graft.funcs.col("dst_url"))
      .sort(graft.funcs.col("dst_url"))
    val direct = m.run(spark).collect().map(r => (r.getString(0), r.getString(1)))
    val wired = graft.wire.WireFormat
      .fromJson(graft.wire.WireFormat.toJson(m))
      .run(spark).collect().map(r => (r.getString(0), r.getString(1)))
    assert(direct.length === 3)
    assert(wired.toSeq === direct.toSeq)
  }

  test("Model.warc composes and survives the wire codec") {
    val p = tmp("model.warc.gz")
    graft.sources.Warc.write(p, recs)
    val m = Model.warc(p)
      .filter(graft.funcs.col("warc_type") === graft.funcs.lit("response"))
      .pick(graft.funcs.col("url"), graft.funcs.col("content_length"))
      .sort(graft.funcs.col("url"))
    val direct = m.run(spark).collect().map(r => (r.getString(0), r.getLong(1)))
    val wired = graft.wire.WireFormat
      .fromJson(graft.wire.WireFormat.toJson(m))
      .run(spark).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(direct.toSeq === Seq(
      ("https://a.example/1", 10L), ("https://a.example/2", 10L)))
    assert(wired.toSeq === direct.toSeq)
  }
}
