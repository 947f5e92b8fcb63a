package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Multimodal column support (beyond-reference surface; SURVEY.md §2.7):
  * image/audio/video payloads are opaque `binary` columns with typed
  * metadata extracted by a batched per-partition decode.
  *
  * The Spark-side plumbing here is real and tested — schema, partition
  * iteration, batch shape, typed output encoder. The codec itself is a
  * clearly-marked STUB ([[decodeStub]]): this environment ships no
  * image/audio libraries, so the stub computes deterministic fake metadata
  * from the raw bytes. A real deployment swaps [[decodeStub]] for a native
  * decoder (JNI/FFI) and nothing else changes; batching exists precisely so
  * such a decoder can amortize per-call setup across `batchSize` payloads,
  * the same shape `mapInPandas` gives Python pipelines.
  */
object Multimodal {

  /** Typed metadata produced by decode. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("sha", StringType, nullable = false),
  ))

  /** STUB decoder — stands in for a real image/audio codec, which is not
    * available in this environment. Deterministic fake: dimensions derive
    * from the first payload bytes, the content fingerprint is a real
    * SHA-256. Swap this single function for a native decoder in production. */
  def decodeStub(payload: Array[Byte]): Row = {
    val b0 = if (payload.length > 0) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    Row("fake", 64 + b0 % 64, 64 + b1 % 64, 1 + payload.length % 8,
      payload.length.toLong, sha)
  }

  /** Decode a binary payload column into a `meta` struct column, iterating
    * each partition in batches of `batchSize` rows (the batch is where a
    * real codec would amortize setup / exploit vectorized decode). Runs as
    * one narrow mapPartitions — no shuffle, scales with the scan. */
  def decode(df: DataFrame, payloadCol: String, batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("meta", MetaSchema, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real decoder would submit `batch` as one call
        batch.map { row =>
          val payload = row.getAs[Array[Byte]](payloadIdx)
          val meta = if (payload == null) null else decodeStub(payload)
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }(Encoders.row(outSchema))
  }
}
