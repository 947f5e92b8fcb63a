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
