package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.TextOps

/** Structured-Streaming operators for continuous training-data ingestion
  * (beyond-reference surface: the reference is batch-only — zero streaming
  * code in its src/). The same transformations the batch engine compiles
  * work on `readStream` inputs; this module adds the two genuinely
  * streaming-shaped pieces a corpus pipeline needs:
  *
  *   - streaming exact dedup — keep the FIRST document per content hash
  *     across the unbounded stream, with per-key state handled by
  *     `flatMapGroupsWithState` (state = one boolean per hash; bounded by
  *     distinct-hash cardinality, the same bound the batch dedup's shuffle
  *     has). At 100 TB/day this state lives in RocksDB via the state-store
  *     provider; the operator shape is unchanged.
  *   - watermarked windowed counts — tumbling-window event statistics with
  *     bounded lateness, the monitoring side of an ingestion pipeline.
  */
object Streams {

  /** CONTINUOUS crawl ingestion: watch a directory for arriving WARC
    * shards (the shape a live crawl delivers — Common Crawl publishes
    * new ~1 GB shards continuously) and emit one row per record as each
    * shard lands. The file stream source supplies only PATHS (its
    * processed-files log gives exactly-once per shard); each task opens
    * its shard through the Hadoop filesystem and walks it with the same
    * streaming record cursor the batch reader uses
    * ([[graft.sources.Warc.records]] — one record buffered at a time,
    * gzip members decompress in the task, no whole-shard array and no
    * 2 GB file ceiling). Downstream gates/dedup compose as on any
    * stream. Schema: [[graft.sources.Warc.schema]]. */
  def streamingWarcRecords(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val bconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val files = spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(dir)
      .select("path") // content column pruned — the source never loads it
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getString(0)
        graft.sources.Warc.records(
          graft.sources.Warc.openShard(bconf.value.value, p), p)
      }
    }(Encoders.row(graft.sources.Warc.schema))
  }

  /** Emit only the first-seen document per normalized-content hash.
    * Output schema = input schema. Works on batch frames too (useful for
    * backfill parity tests of the same operator). */
  def streamingExactDedup(
      docs: DataFrame,
      textCol: String,
  ): DataFrame = {
    val hashed = docs.withColumn("__h__",
      md5(TextOps.normalize(col(textCol)).cast("binary")))
    val outSchema = docs.schema
    val hIdx = hashed.schema.fieldIndex("__h__")
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    hashed
      .groupByKey((r: Row) => r.getString(hIdx))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // several same-hash rows can arrive in one micro-batch: keep
            // exactly one (iterator order within the group)
            rows.take(1).map(r => Row.fromSeq(r.toSeq.dropRight(1)))
          }
      }(Encoders.scalaBoolean, rowEnc)
  }

  /** Streaming corpus-level LINE dedup — the streaming twin of
    * `graft.llm.Dedup.corpusLineDedup`'s first-occurrence semantics:
    * emit each distinct line (by md5 of its exact bytes) ONCE, from the
    * first document that carries it. Output is the kept-line stream
    * `(<idCol> long, line_ix int, line string)` — dropped duplicates are
    * implicit (append mode can't retract), and downstream reassembly is a
    * batch post-pass over the kept set, which is how a production
    * pipeline consumes a dedup decision stream anyway.
    *
    * Tie-break parity with the batch operator: WITHIN a micro-batch the
    * winner among same-hash lines is min(id, line_ix) — exactly the batch
    * window-min — computed in one pass over the group iterator (O(1)
    * memory; a boilerplate line repeated millions of times in one batch
    * buffers nothing). ACROSS batches it is first-arrival-wins, which
    * equals the batch result whenever arrival order follows id order (an
    * append-only corpus feed); out-of-order arrival keeps an older
    * duplicate instead — the inherent difference between a one-pass
    * stream and a corpus-wide min, documented rather than hidden.
    *
    * State: one boolean per distinct line hash (the same distinct-line
    * bound the batch operator's shuffle has); RocksDB-backed at corpus
    * scale like [[streamingExactDedup]]. The id column is cast to long —
    * the schema-generic price also paid by [[streamingMatchSteps]]'s
    * string group. */
  def streamingLineDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      delim: String = "\n",
  ): DataFrame = {
    import org.apache.spark.sql.types._
    val lines = docs.select(
      col(idCol).cast("long").as("__id__"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(delim), -1)).as(Seq("__ix__", "__ln__")))
      // a null id has no place in the (id, ix) tie-break order; dropping
      // beats a runtime NPE in the state function (null TEXT already
      // drops via posexplode of the null split, like the batch operator)
      .where(col("__id__").isNotNull)
      .withColumn("__lh__", md5(col("__ln__").cast("binary")))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("line_ix", IntegerType),
      StructField("line", StringType)))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    lines
      .groupByKey((r: Row) => r.getString(3))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) { Iterator.empty }
          else {
            state.update(true)
            // single pass, O(1) state: min(id, ix) replays the batch
            // operator's window-min tie-break within this batch
            var bid = 0L; var bix = 0; var bln: String = null; var any = false
            rows.foreach { r =>
              val id = r.getLong(0); val ix = r.getInt(1)
              if (!any || id < bid || (id == bid && ix < bix)) {
                bid = id; bix = ix; bln = r.getString(2); any = true
              }
            }
            Iterator.single(Row(bid, bix, bln))
          }
      }(Encoders.scalaBoolean, rowEnc)
  }

  /** Streaming per-domain document cap — the streaming twin of
    * `graft.llm.TextOps.domainCap`: admit at most `cap` documents per
    * domain over the unbounded stream. Emits the admitted
    * `(<idCol> long, <domainCol> string)` rows; rejections are implicit
    * (append mode can't retract).
    *
    * Admission-order parity with the batch operator: WITHIN a
    * micro-batch, candidates rank by the batch operator's exact
    * (md5(id), id) order — so single-batch backfill reproduces the batch
    * kept SET bit-for-bit (the driver query's oracle is q_domain_cap's,
    * shared by reference). ACROSS batches the policy is first-arrivals:
    * a stream cannot rank against documents it has not seen — the
    * standard admission-control semantics, documented rather than
    * hidden. Per-batch, per-domain rows buffer once for the ranking
    * sort; at most `cap − used` of them survive.
    *
    * State: ONE long (admitted count) per distinct domain — strictly
    * smaller than the dedup operators' per-distinct-key booleans;
    * RocksDB-backed at scale like [[streamingExactDedup]]. */
  def streamingDomainCap(
      docs: DataFrame,
      domainCol: String,
      idCol: String,
      cap: Int,
  ): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    import org.apache.spark.sql.types._
    // the (md5(id), id) rank key is computed HERE in codegen'd
    // distributed expressions; the keyed-state function only compares —
    // per-row hashing inside the group function would sit on the per-key
    // SEQUENTIAL path (measured 12× at 10× data on the token-budget twin
    // before the same fix)
    val rows = docs.select(
      col(idCol).cast("long").as("__id__"),
      col(domainCol).cast("string").as("__dom__"),
      md5(col(idCol).cast("string")).as("__mk__"))
      .where(col("__id__").isNotNull && col("__dom__").isNotNull)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField(domainCol, StringType)))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    rows
      .groupByKey((r: Row) => r.getString(1))
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dom: String, it: Iterator[Row], state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          if (used >= cap) Iterator.empty
          else {
            // rank this batch's candidates by the batch operator's exact
            // (md5(id), id) order via a SIZE-BOUNDED selection: a k-cap
            // max-heap over the iterator keeps memory O(cap − used) per
            // (domain, batch) group — a hot domain never buffers its
            // whole micro-batch just to admit the top few
            val k = (cap - used).toInt
            val ord = Ordering.Tuple2(Ordering.String, Ordering.Long)
            val heap = new java.util.PriorityQueue[(String, Long)](
              k, ord.reverse) // worst-ranked candidate at the head
            it.foreach { r =>
              val key = (r.getString(2), r.getLong(0))
              if (heap.size < k) heap.add(key)
              else if (ord.lt(key, heap.peek)) { heap.poll(); heap.add(key) }
            }
            val take = heap.toArray(new Array[(String, Long)](heap.size))
              .sortBy(identity)(ord).map(_._2)
            state.update(used + take.length)
            take.iterator.map(id => Row(id, dom))
          }
      }(Encoders.scalaLong, rowEnc)
  }

  /** Streaming token-budget admission — the streaming twin of
    * `graft.llm.TextOps.tokenBudgetFill` (the [[streamingDomainCap]]
    * pattern): each group g gets quota_g = floor(weight_g·budget + 0.5)
    * tokens; rows are admitted while the group's RUNNING token sum stays
    * within quota. The running sum counts EVERY processed row, admitted
    * or not — the batch operator's cumulative-window rule — so once a
    * group's cum passes its quota the group is closed for good (fast
    * path: no buffering, no state write). Emits the admitted
    * `(<idCol> long, <groupCol> string, n_tokens, cum_tokens)` rows.
    *
    * Batch parity: WITHIN a micro-batch candidates rank by the batch
    * operator's exact (md5(id), id) order, so single-batch backfill
    * reproduces tokenBudgetFill's rows bit-for-bit (the driver query
    * shares q_token_budget's oracle by reference). ACROSS batches the
    * policy is first-arrivals — a stream cannot rank against documents
    * it has not seen. Groups without a weight admit nothing (the batch
    * op's inner weight join).
    *
    * MEMORY BOUND per (group, batch): the admitted set is a RANK PREFIX
    * (cum only grows, so once it passes quota nothing later admits), and
    * every admissible row with ≥1 token consumes ≥1 of the remaining
    * quota — so a bounded max-heap holding the `remaining + 1`
    * lowest-ranked nonzero-token rows provably contains every admissible
    * one (a row evicted past that capacity has ≥ remaining+1 tokens of
    * lower-ranked text before it). Zero-token rows (admissible at ANY
    * crossing point before the prefix closes) buffer separately; they
    * are part of the output itself, so holding them is the information
    * floor, not slack. Total: O(min(batch-group rows, remaining-quota +
    * zero-token rows)) — never the unconditional whole-batch `toArray`.
    * The running sum still counts EVERY row via a single-pass total, so
    * admission semantics are unchanged.
    *
    * State: ONE long (cumulative token count) per group — group-bounded
    * (mixture tables are tiny), RocksDB-backed at scale. */
  def streamingTokenBudget(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      weights: Map[String, Double],
      budget: Long,
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.types._
    // the (md5(id), id) rank key is computed HERE, in codegen'd
    // distributed expressions — the keyed-state function only sorts by
    // it (a per-row JVM MessageDigest in the group function would put
    // hashing on the per-key SEQUENTIAL path, the one that doesn't scale
    // with executors)
    val rows = docs
      .where(col(textCol).isNotNull)
      .select(
        col(idCol).cast("long").as("__id__"),
        col(groupCol).cast("string").as("__g__"),
        size(graft.llm.TextOps.tokens(col(textCol))).cast("long").as("__nt__"),
        md5(col(idCol).cast("string").cast("binary")).as("__mk__"))
      .where(col("__id__").isNotNull && col("__g__").isNotNull)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField(groupCol, StringType),
      StructField("n_tokens", LongType), StructField("cum_tokens", LongType)))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    val quotas = weights.map { case (g, w) =>
      g -> math.floor(w * budget + 0.5).toLong // the batch op's quota expr
    }
    rows
      .groupByKey((r: Row) => r.getString(1))
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[Row], state: GroupState[Long]) =>
          quotas.get(g) match {
            case None => Iterator.empty // unweighted group: nothing admits
            case Some(quota) =>
              val entering = state.getOption.getOrElse(0L)
              if (entering > quota) Iterator.empty // closed group fast path
              else {
                val rankOrd: Ordering[(String, Long, Long)] =
                  Ordering.by(t => (t._1, t._2))
                // capacity = remaining quota + 1 (Long quota clamped):
                // every kept nonzero row costs >= 1 token, so an evicted
                // row has > remaining tokens ranked before it — provably
                // never admitted
                val cap = math.min(quota - entering + 1L, Int.MaxValue.toLong)
                val heap = // max-heap by rank: evicts the HIGHEST-ranked
                  scala.collection.mutable.PriorityQueue.empty(rankOrd)
                val zeros = Seq.newBuilder[(String, Long, Long)]
                var total = 0L
                it.foreach { r =>
                  val row = (r.getString(3), r.getLong(0), r.getLong(2))
                  total += row._3
                  if (row._3 == 0L) zeros += row
                  else if (heap.size < cap) heap.enqueue(row)
                  else if (rankOrd.lt(row, heap.head)) {
                    heap.dequeue(); heap.enqueue(row)
                  }
                }
                // merge the two candidate sets in rank order and walk the
                // prefix sum; rows evicted from the heap are all ranked
                // after every kept row, so they can only matter past the
                // crossing point — where nothing admits anyway
                val ranked = (heap.dequeueAll.reverse ++ zeros.result())
                  .sorted(rankOrd)
                var cum = entering
                val out = Seq.newBuilder[Row]
                ranked.foreach { case (_, id, nt) =>
                  cum += nt
                  if (cum <= quota) out += Row(id, g, nt, cum)
                }
                state.update(entering + total)
                out.result().iterator
              }
          }
      }(Encoders.scalaLong, rowEnc)
  }

  /** Streaming EXACT perceptual image dedup — the crawler-side "drop
    * repeated images as they stream" gate: first-seen-wins per dHash
    * (`graft.llm.Multimodal.dhash`), so byte-identical copies AND
    * re-encodes that hash identically collapse. NEAR-dup pairing
    * (hamming > 0) WITHIN the stream stays a batch job against the
    * persisted hash index — a stream cannot band-join candidates it has
    * not seen — but pairing against the EXISTING corpus is
    * [[streamingImageNearDup]]'s stream-static join. The decode +
    * hash runs in the DISTRIBUTED mapPartitions stage; the keyed-state
    * function only picks winners (the per-key-sequential-path rule).
    *
    * WITHIN a micro-batch the winner among same-hash payloads is the
    * minimum id (one pass over the group iterator, O(1) memory), so
    * single-batch backfill is deterministic and oracle-replayable;
    * across batches first-arrivals. Undecodable / sub-grid payloads
    * drop (no hash, no admission decision — honest, like the batch
    * decoder's nulls). Emits `(<idCol> long, dhash array<int>)`.
    * State: one boolean per distinct hash. */
  def streamingImageDedup(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
  ): DataFrame = {
    import org.apache.spark.sql.types._
    val hashed = graft.llm.Multimodal.dhash(
        docs.select(col(idCol).cast("long").as(idCol), col(payloadCol)),
        idCol, payloadCol)
      .where(col("dhash").isNotNull && col(idCol).isNotNull)
    val outSchema = StructType(Seq(StructField(idCol, LongType),
      StructField("dhash", ArrayType(IntegerType, containsNull = false))))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    hashed
      .groupByKey((r: Row) => r.getSeq[Int](1).mkString(":"))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // min-id winner in one pass (batch-window parity)
            var best: Row = null
            rows.foreach { r =>
              if (best == null || r.getLong(0) < best.getLong(0)) best = r
            }
            Iterator.single(best)
          }
      }(Encoders.scalaBoolean, rowEnc)
  }

  /** STREAMING perceptual NEAR-dup gate — the missing half next to
    * [[streamingImageDedup]]'s exact gate: each incoming image is
    * adjudicated against the PERSISTED corpus dHash index
    * (`graft.llm.Multimodal.dhashIndex`, read back from its bucketed
    * table) by a stateless STREAM-STATIC band join — a stream cannot
    * band-join candidates it has not seen, but it CAN join the corpus
    * that already exists, which is exactly the production "flag the new
    * crawl as it streams" shape. Decode + hash + band-explode + join +
    * popcount all run in DISTRIBUTED stateless stages; the keyed-state
    * function only de-duplicates one image's candidate list (an image
    * colliding with the same index entry in several bands) — bounded at
    * 8·cap rows with a build-time-capped index — and marks the id
    * adjudicated so a re-sent payload never re-emits. Emits
    * (<idCol> long, b_id index match, hamming ≤ `maxHamming`) —
    * [[graft.llm.Multimodal.imageNearDupJoinIndexed]]'s contract, so
    * single-batch backfill parity against the batch op is spec-gated. */
  def streamingImageNearDup(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      index: DataFrame,
      maxHamming: Int = 6,
  ): DataFrame =
    streamingHashNearDup(
      graft.llm.Multimodal.dhash(
        docs.select(col(idCol).cast("long").as(idCol), col(payloadCol)),
        idCol, payloadCol),
      idCol, index, maxHamming)

  /** [[streamingImageNearDup]] for AUDIO clips — the energy-delta hash
    * against a persisted [[graft.llm.Multimodal.audioDhashIndex]]; the
    * shared stream-static band join and keyed dedupe state are
    * modality-agnostic once the 8-byte fingerprint exists. */
  def streamingAudioNearDup(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      index: DataFrame,
      maxHamming: Int = 6,
  ): DataFrame =
    streamingHashNearDup(
      graft.llm.Multimodal.audioDhash(
        docs.select(col(idCol).cast("long").as(idCol), col(payloadCol)),
        idCol, payloadCol),
      idCol, index, maxHamming)

  /** [[streamingImageNearDup]] through the SPECTRAL image hash against
    * a persisted [[graft.llm.Multimodal.imageSpectralIndex]] — the
    * re-encode-robust live gate: a brightness/contrast/pixel-repeat-
    * upscale re-encode of an indexed image collides at hamming 0 where
    * the box-mean dHash gate misses it. */
  def streamingImageSpectralNearDup(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      index: DataFrame,
      maxHamming: Int = 6,
  ): DataFrame =
    streamingHashNearDup(
      graft.llm.Multimodal.imageSpectralHash(
        docs.select(col(idCol).cast("long").as(idCol), col(payloadCol)),
        idCol, payloadCol),
      idCol, index, maxHamming)

  /** [[streamingAudioNearDup]] through the SPECTRAL hash against a
    * persisted [[graft.llm.Multimodal.audioSpectralIndex]] — the
    * re-encode-robust live gate: a gain-scaled / level-shifted /
    * integer-upsampled re-encode of an indexed clip collides at
    * hamming 0 where the energy-delta gate misses it. */
  def streamingAudioSpectralNearDup(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      index: DataFrame,
      maxHamming: Int = 6,
  ): DataFrame =
    streamingHashNearDup(
      graft.llm.Multimodal.audioSpectralHash(
        docs.select(col(idCol).cast("long").as(idCol), col(payloadCol)),
        idCol, payloadCol),
      idCol, index, maxHamming)

  /** The shared single-fingerprint streaming gate: band-explode the
    * hashed stream, stream-static join the persisted capped index,
    * verify inline by popcount, and dedupe one item's ≤ 8·cap candidate
    * rows in keyed state (also suppressing re-sent ids). */
  private def streamingHashNearDup(
      hashedIn: DataFrame,
      idCol: String,
      index: DataFrame,
      maxHamming: Int,
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "byte-band blocking is exact only for hamming <= 7")
    import org.apache.spark.sql.types._
    // NULL ids cannot carry adjudication state (and would NPE the keyed
    // extractor) — dropped like undecodable payloads
    val hashed = hashedIn.where(col("dhash").isNotNull &&
      col(idCol).isNotNull)
    val cand = hashed
      .select(col(idCol).as("__nid__"), col("dhash"),
        posexplode(col("dhash")).as(Seq("__band__", "__bv__")))
      .select(col("__nid__"), col("dhash"),
        concat(col("__band__"), lit(":"), col("__bv__")).as("__bkey__"))
      .join(index, Seq("__bkey__"))
      .select(col("__nid__"), col("__id__").cast("long").as("__bid__"),
        expr("""CAST(aggregate(zip_with(dhash, __dhash__,
                  (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)
                AS BIGINT)""").as("__ham__"))
      .where(col("__ham__") <= maxHamming)
    adjudicateFirstSeen(cand,
      StructType(Seq(StructField(idCol, LongType),
        StructField("b_id", LongType), StructField("hamming", LongType))),
      dedupePairs = true)
  }

  /** The shared ADMISSION TAIL of the streaming near-dup matrix (text
    * MinHash / image / audio / video hash / embedding / snapshot diff):
    * `cand` is the stateless stream-static candidate frame — FIRST
    * column the arriving item's non-null LONG id, remaining columns the
    * verified payload — and this keyed-state pass only (a) marks the id
    * adjudicated so a re-sent item never re-emits, and (b) when
    * `dedupePairs`, drops the same (item, indexed) pair colliding in
    * several bands, keeping the first occurrence (the payload is a pure
    * function of the pair, so first-wins is exact; the seen-set is
    * bounded by the candidate fan-out, never the batch). ALL per-row
    * work (hashing, joins, verify math) stays out of this function —
    * anything here runs on the per-KEY sequential path (the r11
    * token-budget lesson). */
  private def adjudicateFirstSeen(
      cand: DataFrame,
      outSchema: org.apache.spark.sql.types.StructType,
      dedupePairs: Boolean): DataFrame = {
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val longEnc = Encoders.scalaLong
    val width = outSchema.size
    cand
      .groupByKey((r: Row) => r.getLong(0))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // item already adjudicated
          else {
            state.update(true)
            if (!dedupePairs)
              rows.map(r => Row.fromSeq(id +: (1 until width).map(r.get)))
            else {
              val seen = scala.collection.mutable.HashSet.empty[Long]
              val out = Seq.newBuilder[Row]
              rows.foreach { r =>
                if (seen.add(r.getLong(1)))
                  out += Row.fromSeq(id +: (1 until width).map(r.get))
              }
              out.result().iterator
            }
          }
      }(Encoders.scalaBoolean, rowEnc)
  }

  /** CONTINUOUS WET ingestion — [[streamingWarcRecords]] through the
    * extracted-text view ([[graft.sources.Warc.readWet]]'s contract):
    * watch a directory for arriving `.warc.wet.gz` shards and emit one
    * (url, text) row per `conversion` record as each shard lands
    * (warcinfo headers skipped). Composes with every downstream text
    * gate/dedup exactly like the batch reader. */
  def streamingWetRecords(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    streamingWarcRecords(spark, dir)
      .where(col("warc_type") === "conversion")
      .select(col("url"), col("payload").cast("string").as("text"))

  /** CONTINUOUS WAT ingestion — the link-metadata member of the trio,
    * streamed: (src_url, dst_url) anchor rows as `.warc.wat.gz` shards
    * land, through the SAME projection the batch reader uses
    * ([[graft.sources.Warc.watLinks]] — parse and filter rules cannot
    * diverge). Composes with [[graft.llm.Graph.linkEdges]] for a
    * continuously-growing domain edge set. */
  def streamingWatRecords(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.sources.Warc.watLinks(streamingWarcRecords(spark, dir))

  /** STREAMING text MinHash near-dup admission — the single most common
    * production dedup shape, streamed: each document of a new crawl is
    * adjudicated against the PERSISTED cleaned-corpus MinHash index
    * ([[graft.llm.Dedup.minhashIndex]], read back from its bucketed
    * table) as it arrives. Tokenize + signature + band-explode + the
    * stream-static band equi-join + the exact n-gram-Jaccard verify all
    * run in DISTRIBUTED stateless stages (the verify token sets ride on
    * the posting rows — the index denormalizes them, so no join back to
    * the corpus); the keyed-state function only de-duplicates one
    * document's candidate list (the same (new, indexed) pair colliding
    * in several bands) — bounded at numBands·bucket rows — and marks the
    * id adjudicated so a re-sent document never re-emits. Emits
    * (left_id, right_id, jaccard) — [[graft.llm.Dedup
    * .minhashJoinIndexed]]'s exact contract, so single-batch backfill
    * parity against the batch op is spec-gated and the driver query
    * shares its oracle by reference. */
  def streamingMinhashNearDup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      shingleSize: Int = 3,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.8,
  ): DataFrame = {
    require(numHashes == rowsPerBand * (numHashes / rowsPerBand),
      "numHashes must be a multiple of rowsPerBand")
    graft.GraftExtensions.install(docs.sparkSession)
    import org.apache.spark.sql.types._
    val numBands = numHashes / rowsPerBand
    val cand = docs
      .select(col(idCol).cast("long").as("__nid__"),
        col(textCol).as("__text__"))
      // a NULL id cannot carry adjudication state (and would NPE the
      // keyed extractor) — dropped honestly, like undecodable payloads
      .where(col("__nid__").isNotNull)
      .withColumn("__ntoks__", TextOps.tokens(col("__text__")))
      .where(size(col("__ntoks__")) >= shingleSize)
      .withColumn("__sig__",
        expr(s"minhash_sig_words(__ntoks__, $shingleSize, $numHashes)"))
      .select(col("__nid__"), col("__ntoks__"),
        posexplode(TextOps.bandHashes("__sig__", numBands, rowsPerBand))
          .as(Seq("__band__", "__bh__")))
      .select(col("__nid__"), col("__ntoks__"),
        concat(col("__band__"), lit(":"), col("__bh__")).as("__bkey__"))
      .join(index, Seq("__bkey__"))
      .withColumn("jaccard",
        round(expr(s"word_ngram_jaccard(__ntoks__, __toks__, $shingleSize)"), 6))
      .where(col("jaccard") >= threshold)
      .select(col("__nid__"), col("__id__").cast("long").as("__bid__"),
        col("jaccard"))
    adjudicateFirstSeen(cand,
      StructType(Seq(StructField("left_id", LongType),
        StructField("right_id", LongType),
        StructField("jaccard", DoubleType))),
      dedupePairs = true)
  }

  /** STREAMING embedding near-dup admission — the EMBEDDING modality of
    * the streaming near-dup matrix (text MinHash / image / audio /
    * video dHash+spectral are the siblings): each arriving vector is
    * adjudicated against the PERSISTED IVF index
    * ([[graft.llm.Embeddings.ivfIndexSave]]) — assign to its nearest
    * frozen centroid (1-row broadcast of the centroid array, codegen'd
    * argmax; joined on a literal key, not a cross join — stream-static
    * cross joins are the unsupported shape), stream-static-join the
    * probed cell's postings, exact cosine ≥ `threshold` verifies
    * inline; keyed state only de-duplicates re-sent ids (a neighbor
    * lives in one cell, so pairs never duplicate). Emits
    * (left_id, right_id, cosine) — [[graft.llm.Embeddings
    * .ivfNearDupJoinIndexed]]'s contract, so single-batch backfill
    * parity is spec-gated and the driver query shares its oracle. */
  /** Per-query probe cells as a PROJECTION over the folded centroid
    * array — the window-free formulation that makes streaming nprobe>1
    * possible (the batch [[graft.llm.Embeddings]] rank is a per-query
    * row_number window, unsupported on streams): sort the per-centroid
    * (rounded cosine, cid) structs by the batch window's exact order —
    * NULL sims last, NaN sims first (Spark's desc total order), then
    * sim desc via negation, then cid asc — slice the first `nprobe`,
    * explode. Each posting lives in exactly one cell, so probing P
    * cells never duplicates a candidate. Input must carry `__q__`,
    * `__qn__`, `__cents__`; output replaces them with one `__qcell__`
    * row per probed cell. nprobe=1 keeps the codegen'd argmax native
    * (the HOF sort is CodegenFallback — fine on the tiny query side,
    * not the hot single-probe path). */
  private def withProbeCells(df: DataFrame, nprobe: Int): DataFrame =
    if (nprobe == 1)
      df.withColumn("__qcell__",
          expr("vec_argmax_cell(__q__, __qn__, __cents__)"))
        .drop("__cents__", "__one__")
    else
      df.withColumn("__qcell__", explode(expr(
          s"""transform(slice(array_sort(transform(
                transform(__cents__, c -> named_struct(
                  's', round(float_vec_dot(__q__, c.__cv__)
                             / (__qn__ * c.__cn__), 6),
                  'cid', c.__cid__)),
                p -> named_struct(
                  'sn', p.s IS NULL,
                  'nf', coalesce(NOT isnan(p.s), true),
                  'ns', -p.s,
                  'cid', p.cid))), 1, $nprobe), s -> s.cid)""")))
        .drop("__cents__", "__one__")

  def streamingIvfNearDup(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      postings: DataFrame,
      threshold: Double,
      nprobe: Int = 1,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val centArr = centroids
      .select(col("cid").as("__cid__"), col("cv").as("__cv__"),
        sqrt(expr("float_vec_dot(cv, cv)")).as("__cn__"))
      .agg(collect_list(struct(col("__cid__"), col("__cv__"),
        col("__cn__"))).as("__cents__"))
      .withColumn("__one__", lit(1))
    require(nprobe >= 1, "nprobe must be at least 1")
    val cand = withProbeCells(docs
      .select(col(idCol).cast("long").as("__nid__"), col(vecCol).as("__q__"))
      // NULL ids cannot carry adjudication state — dropped honestly
      .where(col("__nid__").isNotNull)
      .withColumn("__qn__",
        sqrt(expr("float_vec_dot(__q__, __q__)")))
      .withColumn("__one__", lit(1))
      .join(centArr, Seq("__one__")), // 1-row static side, equi-keyed
      nprobe)
      .join(postings, col("__qcell__") === col("__cell__"))
      .withColumn("cosine",
        round(expr(s"float_vec_dot($vecCol, __q__)")
          / (col("__n__") * col("__qn__")), 6))
      .where(col("cosine") >= threshold)
      .select(col("__nid__"), col(idCol).cast("long").as("__bid__"),
        col("cosine"))
    // no per-pair dedupe: a neighbor lives in exactly one cell
    adjudicateFirstSeen(cand,
      StructType(Seq(StructField("left_id", LongType),
        StructField("right_id", LongType),
        StructField("cosine", DoubleType))),
      dedupePairs = false)
  }

  /** STREAMING kNN LABEL PROPAGATION — [[graft.llm.Embeddings
    * .knnLabelIndexed]]'s continuous twin: each arriving vector gets the
    * MAJORITY label of its k nearest neighbors in the PERSISTED
    * label-attributed IVF index. Assignment is the streaming admission
    * shape (1-row centroid broadcast joined on a literal key, codegen'd
    * argmax), candidates are the cell's postings via one stream-static
    * join, and the top-k cut is the K-BOUNDED `topk_by` aggregate — the
    * piece that makes a streaming top-k possible at all (row_number
    * windows are unsupported on streams) and keeps per-key state k-sized
    * rather than cell-sized. The vote then runs in a PROJECTION over the
    * k-element array (array_sort by (votes desc, label asc) — a
    * per-verdict loop over k elements, never per candidate), so no
    * per-row work ever reaches a keyed sequential path. nprobe>1 probes
    * each query's best-P cells via [[withProbeCells]] — the window-free
    * per-row centroid rank that removed the old "wider probes are
    * batch-only" constraint. Re-sent ids just update their aggregate
    * and re-emit the same verdict. Emits (idCol, <labelCol>, votes) —
    * the batch contract, so single-batch backfill parity is spec-gated.
    * The candidate with id equal to the arriving id is excluded (the
    * batch self-exclusion), compared as long. */
  def streamingKnnLabel(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      postings: DataFrame,
      labelCol: String,
      k: Int,
      nprobe: Int = 1,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    require(k >= 1, "k must be at least 1")
    require(nprobe >= 1, "nprobe must be at least 1")
    require(postings.columns.contains(labelCol),
      s"postings carry no '$labelCol' column — save the index with " +
        s"attrs = Seq(\"$labelCol\")")
    // same type gate as the batch twin: the label rides topk_by's BIGINT
    // tag slot, and a non-integral label would otherwise pass the
    // existence check only to fail at runtime under ANSI (or silently
    // null every tag). The batch path falls back to a window for
    // non-integral types; a stream has no such fallback, so refuse loudly.
    locally {
      import org.apache.spark.sql.types._
      val lt = postings.schema(labelCol).dataType
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(lt),
        s"streamingKnnLabel needs an integral '$labelCol' (got $lt) — " +
          "labels ride topk_by's BIGINT tag; encode string labels first")
    }
    val spark = docs.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val centArr = centroids
      .select(col("cid").as("__cid__"), col("cv").as("__cv__"),
        sqrt(expr("float_vec_dot(cv, cv)")).as("__cn__"))
      .agg(collect_list(struct(col("__cid__"), col("__cv__"),
        col("__cn__"))).as("__cents__"))
      .withColumn("__one__", lit(1))
    withProbeCells(docs
      .select(col(idCol).cast("long").as("__nid__"), col(vecCol).as("__q__"))
      .where(col("__nid__").isNotNull)
      .withColumn("__qn__", sqrt(expr("float_vec_dot(__q__, __q__)")))
      .withColumn("__one__", lit(1))
      .join(centArr, Seq("__one__")), // 1-row static side, equi-keyed
      nprobe)
      .join(postings, col("__qcell__") === col("__cell__") &&
        col(idCol).cast("long") =!= col("__nid__"))
      .withColumn("__cos__",
        round(expr(s"float_vec_dot($vecCol, __q__)")
          / (col("__n__") * col("__qn__")), 6))
      .groupBy(col("__nid__"))
      .agg(expr(s"topk_by(__cos__, CAST($idCol AS BIGINT), " +
        s"CAST($labelCol AS BIGINT), $k)").as("__tk__"))
      // majority vote over the k-element array: candidates per distinct
      // label counted null-safely, sorted by (votes desc, label asc
      // NULLS LAST) via the negated-count struct order — deterministic,
      // window-free. The explicit `ln` null flag mirrors the batch
      // twin's asc_nulls_last (struct comparison alone would sort a
      // NULL label field FIRST, flipping the tie-break vs the oracle).
      .withColumn("__win__", expr(
        """element_at(array_sort(transform(
             array_distinct(transform(__tk__, e -> e.tag)),
             l -> named_struct(
               'nv', -size(filter(__tk__, e -> e.tag <=> l)),
               'ln', l IS NULL,
               'l', l))), 1)"""))
      .where(col("__win__").isNotNull)
      .select(col("__nid__").as(idCol), col("__win__.l").as(labelCol),
        (-col("__win__.nv")).cast("long").as("votes"))
  }

  /** STREAMING IVF top-k serving — [[graft.llm.Embeddings
    * .ivfTopKIndexed]]'s continuous twin: each arriving query vector
    * gets its ranked top-k neighbors from the PERSISTED index. The
    * probe set comes from [[withProbeCells]] (nprobe ≥ 1, window-free),
    * candidates from one stream-static join on the probed cells, and
    * the cut is the k-bounded `topk_by` aggregate whose output array is
    * already IN RANK ORDER — so rank/cosine/neighbor emit from a plain
    * posexplode PROJECTION after the aggregate, never a window. State
    * per query id is k-sized. Update/complete mode; a re-sent query
    * re-emits its (identical) rows. Emits (query_id, neighbor_id,
    * cosine, rank) — [[graft.llm.Embeddings.ivfTopKTrained]]'s exact
    * contract over the same centroids, so single-batch backfill parity
    * shares `q_ann_ivf_probe`'s oracle. Self-matches are excluded by id
    * (compared as long), mirroring the batch serve. */
  def streamingIvfTopK(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      postings: DataFrame,
      k: Int,
      nprobe: Int = 1,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    require(k >= 1, "k must be at least 1")
    require(nprobe >= 1, "nprobe must be at least 1")
    val spark = docs.sparkSession
    val idType = postings.schema(idCol).dataType
    // ids ride topk_by's BIGINT slots — same gate as streamingKnnLabel
    // (the batch twin's window fallback has no streaming equivalent)
    locally {
      import org.apache.spark.sql.types._
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(idType),
        s"streamingIvfTopK needs an integral '$idCol' (got $idType)")
    }
    val centroids = spark.read.parquet(s"$dir/centroids")
    val centArr = centroids
      .select(col("cid").as("__cid__"), col("cv").as("__cv__"),
        sqrt(expr("float_vec_dot(cv, cv)")).as("__cn__"))
      .agg(collect_list(struct(col("__cid__"), col("__cv__"),
        col("__cn__"))).as("__cents__"))
      .withColumn("__one__", lit(1))
    withProbeCells(docs
      .select(col(idCol).cast("long").as("__nid__"), col(vecCol).as("__q__"))
      .where(col("__nid__").isNotNull)
      .withColumn("__qn__", sqrt(expr("float_vec_dot(__q__, __q__)")))
      .withColumn("__one__", lit(1))
      .join(centArr, Seq("__one__")), // 1-row static side, equi-keyed
      nprobe)
      .join(postings, col("__qcell__") === col("__cell__") &&
        col(idCol).cast("long") =!= col("__nid__"))
      .withColumn("__cos__",
        round(expr(s"float_vec_dot($vecCol, __q__)")
          / (col("__n__") * col("__qn__")), 6))
      .groupBy(col("__nid__"))
      .agg(expr(s"topk_by(__cos__, CAST($idCol AS BIGINT), " +
        s"CAST(NULL AS BIGINT), $k)").as("__tk__"))
      .select(col("__nid__").cast(idType).as("query_id"),
        posexplode(col("__tk__")).as(Seq("__p__", "__e__")))
      .select(col("query_id"),
        col("__e__.id").cast(idType).as("neighbor_id"),
        col("__e__.score").as("cosine"),
        (col("__p__") + 1).cast("int").as("rank"))
  }

  /** STREAMING IVF-SQ8 serving — [[streamingIvfTopK]]'s quantized twin
    * over a persisted [[graft.llm.Embeddings.ivfSq8IndexSave]] artifact:
    * the coarse assignment and (for nprobe > 1) the probe ranking run as
    * PROJECTIONS against 1-row static joins (windows are unsupported on
    * streams — the array_sort rank is the spec-pinned equivalent), the
    * stream-static equi-join pulls only the probed cells' CODED
    * postings, the dequantized cosine scores in one codegen'd
    * projection, and the per-query k cut is the `topk_by` aggregate in
    * update mode. Raw vectors never load — the static side the stream
    * scans is the 4×-smaller coded representation. */
  def streamingIvfSq8TopK(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      postings: DataFrame,
      dim: Int,
      k: Int,
      nprobe: Int = 1,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    require(k >= 1, "k must be at least 1")
    require(nprobe >= 1, "nprobe must be at least 1")
    val spark = docs.sparkSession
    val idType = postings.schema(idCol).dataType
    locally {
      import org.apache.spark.sql.types._
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(idType),
        s"streamingIvfSq8TopK needs an integral '$idCol' (got $idType)")
    }
    val centroids = spark.read.parquet(s"$dir/centroids")
    val centArr = centroids
      .select(col("cid").as("__cid__"), col("cv").as("__cv__"),
        sqrt(expr("float_vec_dot(cv, cv)")).as("__cn__"))
      .agg(collect_list(struct(col("__cid__"), col("__cv__"),
        col("__cn__"))).as("__cents__"))
      .withColumn("__one__", lit(1))
    val params = graft.llm.Embeddings.sq8StoredParams(spark, dir, dim)
      .withColumn("__onep__", lit(1))
    withProbeCells(docs
      .select(col(idCol).cast("long").as("__nid__"), col(vecCol).as("__q__"))
      .where(col("__nid__").isNotNull)
      .withColumn("__qn__", sqrt(expr("float_vec_dot(__q__, __q__)")))
      .withColumn("__one__", lit(1))
      .join(centArr, Seq("__one__")), nprobe)
      .withColumn("__onep__", lit(1))
      .join(params, Seq("__onep__")) // 1-row static side, equi-keyed
      .join(postings, col("__qcell__") === col("__cell__") &&
        col(idCol).cast("long") =!= col("__nid__"))
      .withColumn("__cos__", round(
        expr("vec_sq8_dot(__code__, __mins__, __scales__, __q__)") /
          (col("__qn__") *
            sqrt(expr("vec_sq8_norm2(__code__, __mins__, __scales__)"))), 6))
      .groupBy(col("__nid__"))
      .agg(expr(s"topk_by(__cos__, CAST($idCol AS BIGINT), " +
        s"CAST(NULL AS BIGINT), $k)").as("__tk__"))
      .select(col("__nid__").cast(idType).as("query_id"),
        posexplode(col("__tk__")).as(Seq("__p__", "__e__")))
      .select(col("query_id"),
        col("__e__.id").cast(idType).as("neighbor_id"),
        col("__e__.score").as("cosine"),
        (col("__p__") + 1).cast("int").as("rank"))
  }

  /** STREAMING maximal-substring admission — the exact-span TEXT
    * modality of the streaming admission matrix ([[graft.llm.Dedup
    * .substringMatchesIndexed]]'s continuous twin, and the
    * exact-overlap decontamination gate run at ingest): each arriving
    * document's k-grams stream-static-join the persisted
    * [[graft.llm.Dedup.substringIndexSave]] postings (hot grams cut by
    * the PUSHED `__gf__` cap riding the index rows), and each
    * (arrival, indexed doc, diagonal) key's matched positions aggregate
    * into one sorted set — state bounded by ONE document's positions,
    * never the corpus. The diagonal runs (= the pairwise maximal
    * matches) then compute in a PROJECTION over that array (one
    * linear HOF fold — per pair, never per candidate row) and explode
    * to the batch op's exact row contract (left_id, right_id,
    * match_start, match_words); value identity with the batch window
    * formulation is spec-pinned, so the driver backfill shares the
    * batch oracle. Update/complete mode; re-sent docs re-join the same
    * grams, the set collapses duplicates, verdicts re-emit identically. */
  def streamingSubstringAdmission(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      postings: DataFrame,
      minMatchWords: Int,
      maxGramCopies: Int = 64,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    require(minMatchWords >= 2, "minMatchWords must be >= 2")
    require(maxGramCopies >= 1, "maxGramCopies must be >= 1")
    val k = minMatchWords
    graft.llm.Dedup.substringAdmissionJoin(docs, idCol, textCol, postings,
      k, maxGramCopies)
      .groupBy(col("__nid__"), col("__id__"), col("__diag__"))
      .agg(sort_array(collect_set(col("__npos__"))).as("__ps__"))
      // consecutive-position runs over the sorted distinct positions:
      // one left fold, emitting (start, len) per run — `prev` starts at
      // -2 so position 1 can never chain onto the seed
      .withColumn("__runs__", expr(
        """aggregate(__ps__,
             named_struct('prev', CAST(-2 AS BIGINT),
                          'st', CAST(NULL AS BIGINT),
                          'ln', CAST(0 AS BIGINT),
                          'out', array_repeat(named_struct(
                            's', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT)), 0)),
             (acc, p) -> IF(p = acc.prev + 1,
               named_struct('prev', p, 'st', acc.st, 'ln', acc.ln + 1,
                            'out', acc.out),
               named_struct('prev', p, 'st', p, 'ln', CAST(1 AS BIGINT),
                            'out', IF(acc.st IS NULL, acc.out,
                              array_append(acc.out,
                                named_struct('s', acc.st, 'l', acc.ln))))),
             acc -> IF(acc.st IS NULL, acc.out,
               array_append(acc.out,
                 named_struct('s', acc.st, 'l', acc.ln))))"""))
      .select(col("__nid__").as("left_id"), col("__id__").as("right_id"),
        explode(col("__runs__")).as("__r__"))
      .select(col("left_id"), col("right_id"),
        col("__r__.s").as("match_start"),
        (col("__r__.l") + lit(k - 1)).cast("long").as("match_words"))
  }

  /** STREAMING corpus snapshot diff — [[graft.llm.Dedup.corpusDiff]]'s
    * continuous twin: as new-snapshot shards stream in, each arriving
    * id gets its per-id verdict against the PERSISTED old snapshot —
    * one stream-static LEFT OUTER join on id (zero index-side exchange
    * when the snapshot is stored id-bucketed, the same layout contract
    * the batch diff's zero-shuffle plan rides): 'added' (no old row),
    * 'changed' (hash differs), or 'unchanged'. 'removed' is the one
    * verdict a stream cannot emit — absence is only decidable when the
    * new snapshot CLOSES, so the batch [[graft.llm.Dedup.corpusDiff]]
    * pass owns it (documented, like cross-batch admission). Hashing is
    * the batch op's raw md5 (a diff reports what changed — no
    * normalization); keyed state only suppresses re-sent ids. Emits
    * (idCol, status, old_md5, new_md5) — the batch contract minus
    * 'removed', so single-batch backfill parity is spec-gated and the
    * driver query's oracle is the batch diff restricted to the
    * new-snapshot side. */
  def streamingCorpusDiff(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      oldSnapshot: DataFrame,
  ): DataFrame = {
    import org.apache.spark.sql.types._
    val o = oldSnapshot.select(col(idCol).cast("long").as("__oid__"),
      md5(col(textCol).cast("binary")).as("old_md5"),
      lit(true).as("__in_old__"))
    val cand = newDocs
      .select(col(idCol).cast("long").as("__nid__"),
        md5(col(textCol).cast("binary")).as("new_md5"))
      // NULL ids cannot carry adjudication state — dropped honestly
      .where(col("__nid__").isNotNull)
      .join(o, col("__nid__") === col("__oid__"), "left_outer")
      .select(col("__nid__"),
        // presence flag, never hash nullness: a NULL text hashes to
        // NULL and would misreport changed as added (batch-diff rule)
        when(col("__in_old__").isNull, "added")
          .when(col("old_md5") <=> col("new_md5"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_md5"), col("new_md5"))
    adjudicateFirstSeen(cand,
      StructType(Seq(StructField(idCol, LongType),
        StructField("status", StringType),
        StructField("old_md5", StringType),
        StructField("new_md5", StringType))),
      dedupePairs = false)
  }

  /** Streaming perceptual VIDEO near-dup gate — [[streamingImageNearDup]]
    * for clips: each arriving clip decodes + hashes its sampled frames in
    * DISTRIBUTED stateless stages (the per-clip sampled-frame count rides
    * on every frame row from the hash pass — no stateful aggregation),
    * per-frame postings stream-static-join the persisted
    * [[graft.llm.Multimodal.videoDhashIndex]] on the composite
    * "<frame>:<band>:<value>" key, and candidates verify inline by
    * popcount. Keyed state per clip only applies the all-aligned-frames
    * pairing rule over that clip's ≤ nf·8·cap candidate rows (count
    * distinct matched frames per index clip, require = both frame
    * counts) and suppresses re-sent ids. Emits (idCol, b_id,
    * max_hamming). */
  def streamingVideoNearDup(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      index: DataFrame,
      every: Int = 2,
      maxHamming: Int = 6,
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "byte-band blocking is exact only for hamming <= 7")
    import org.apache.spark.sql.types._
    val hashed = graft.llm.Multimodal.videoDhash(
        docs.select(col(idCol).cast("long").as(idCol), col(payloadCol)),
        idCol, payloadCol, every)
      .where(col("dhash").isNotNull && col(idCol).isNotNull)
    val cand = hashed
      .select(col(idCol).as("__nid__"), col("n_frames").as("__nfa__"),
        col("frame_ix"), col("dhash"),
        posexplode(col("dhash")).as(Seq("__band__", "__bv__")))
      .select(col("__nid__"), col("__nfa__"), col("dhash"),
        concat(col("frame_ix"), lit(":"), col("__band__"), lit(":"),
          col("__bv__")).as("__bkey__"),
        col("frame_ix"))
      .join(index, Seq("__bkey__"))
      .select(col("__nid__"), col("__nfa__"), col("frame_ix"),
        col("__id__").cast("long").as("__bid__"),
        col("__nf__").cast("long").as("__nfb__"),
        expr("""CAST(aggregate(zip_with(dhash, __dhash__,
                  (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)
                AS BIGINT)""").as("__ham__"))
      .where(col("__ham__") <= maxHamming)
    val outSchema = StructType(Seq(StructField(idCol, LongType),
      StructField("b_id", LongType), StructField("max_hamming", LongType)))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val longEnc = Encoders.scalaLong
    cand
      .groupByKey((r: Row) => r.getLong(0))
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // clip already adjudicated
          else {
            state.update(true)
            // per index-clip: distinct matched frames + max hamming —
            // bounded at the clip's candidate fan-out, never the batch
            var nfa = 0L
            val frames = scala.collection.mutable
              .HashMap.empty[Long, scala.collection.mutable.HashSet[Int]]
            val maxHam = scala.collection.mutable.HashMap.empty[Long, Long]
            val nfb = scala.collection.mutable.HashMap.empty[Long, Long]
            rows.foreach { r =>
              nfa = r.getLong(1)
              val b = r.getLong(3)
              frames.getOrElseUpdate(b,
                scala.collection.mutable.HashSet.empty[Int])
                .add(r.getInt(2))
              maxHam.update(b, math.max(maxHam.getOrElse(b, 0L), r.getLong(5)))
              nfb.update(b, r.getLong(4))
            }
            frames.toSeq.sortBy(_._1).iterator.collect {
              case (b, fs) if fs.size.toLong == nfa && nfa == nfb(b) =>
                Row(id, b, maxHam(b))
            }
          }
      }(Encoders.scalaBoolean, rowEnc)
  }

  /** Keyed state of [[streamingMatchSteps]]: each step's pruned candidate
    * frontier, in micros (the serialized form of graft.expr.ChainState). */
  final case class ChainFrontier(cands: Seq[Seq[Long]])

  /** Streaming funnel / chain matching — the streaming twin of
    * `Model.matchSteps`, powered by the SAME pruned-frontier state machine
    * as the batch `greedy_chain` aggregate (graft.expr.ChainState). The
    * frontier is merge-order-independent (its monotone-cap pruning is
    * proven for ANY arrival order), so out-of-order events are handled
    * EXACTLY without a watermark: a step-0 event arriving three batches
    * after the step-1 events it unlocks still produces the same chain the
    * batch operator computes over the full history — the state simply
    * retains each step's still-feasible candidates (O(steps) once the
    * chain matches early; the batch aggregate's bound).
    *
    * Update-mode output: one row per group per micro-batch in which the
    * group's chain CHANGED — (group, `<step>_ts`...). Steps match on
    * equality of `eventCol` against each step name (the reference's
    * string-step normalization); a REPEATED step name feeds every one of
    * its positions, like the batch operator's per-step conditions. Works
    * on batch frames too (one group call over full history = batch
    * parity).
    *
    * State: the frontier is O(steps) once a group's chain matches early,
    * but a group whose next-unmatched step never arrives retains its
    * later-step candidates indefinitely (the same information-theoretic
    * floor the batch aggregate has — except a stream never terminates).
    * `idleTimeout` (e.g. "7 days") bounds that: a group receiving no
    * events for the duration has its state dropped (a later resumption
    * restarts its chain from scratch — the documented trade). None keeps
    * exact unbounded semantics. */
  def streamingMatchSteps(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      eventCol: String,
      steps: Seq[String],
      idleTimeout: Option[String] = None,
  ): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    require(steps.nonEmpty && steps.size <= 62, "1..62 steps")
    // every position of a repeated step name gets the event
    val stepIdx: Map[String, Seq[Int]] =
      steps.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val prep = events.select(
      col(groupCol).cast("string").as("__g__"),
      col(tsCol).cast("timestamp").as("__t__"),
      col(eventCol).cast("string").as("__e__"))
    // with ANY repeated name, every column carries its position — a
    // selective suffix could collide with a literal step named like the
    // suffixed form (steps "view","view","view_0")
    val anyRepeat = steps.distinct.size != steps.size
    val outSchema = StructType(
      StructField("group", StringType) +:
        steps.zipWithIndex.map { case (s, i) =>
          val n = if (anyRepeat) s"${s}_${i}_ts" else s"${s}_ts"
          StructField(n, TimestampType)
        })
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val bufEnc = Encoders.product[ChainFrontier]
    implicit val strEnc = Encoders.STRING
    def restore(buf: Option[ChainFrontier]): graft.expr.ChainState = {
      val sets = Array.fill(steps.size)(new java.util.TreeSet[java.lang.Long]())
      buf.foreach(_.cands.zipWithIndex.foreach { case (c, k) =>
        c.foreach(t => sets(k).add(t))
      })
      new graft.expr.ChainState(sets)
    }
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    prep
      .groupByKey((r: Row) => r.getString(0))
      .flatMapGroupsWithState[ChainFrontier, Row](
        OutputMode.Update, timeoutConf) {
        (g: String, rows: Iterator[Row], state: GroupState[ChainFrontier]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = restore(state.getOption)
            val before = st.chain().toSeq
            rows.foreach { r =>
              if (!r.isNullAt(1) && !r.isNullAt(2)) {
                stepIdx.get(r.getString(2)).foreach(_.foreach { k =>
                  st.add(k, DateTimeUtils.fromJavaTimestamp(r.getTimestamp(1)))
                  st.prune()
                })
              }
            }
            val after = st.chain().toSeq
            state.update(ChainFrontier(st.sets.toSeq.map { s =>
              val it = s.iterator(); val b = Seq.newBuilder[Long]
              while (it.hasNext) b += it.next()
              b.result()
            }))
            idleTimeout.foreach(state.setTimeoutDuration)
            if (after == before) Iterator.empty
            else Iterator.single(Row.fromSeq(g +: after.map {
              case null => null
              case m: java.lang.Long => DateTimeUtils.toJavaTimestamp(m)
            }))
          }
      }(bufEnc, rowEnc)
  }

  /** Keyed state of [[streamingMatchStepsFinal]]: the chain frontier plus
    * the max event-time seen (ms, for idle finalization), a tombstone
    * flag set once the group's single final row has been emitted, and the
    * tombstone's FIXED expiry (watermark ms, set once at emission —
    * straggler batches re-pin the timeout to this value rather than
    * extending it, so steady straggler traffic cannot keep a tombstone
    * alive past emission + tombstoneTtlMs). */
  final case class ChainFinalState(
      cands: Seq[Seq[Long]], maxSeenMs: Long, done: Boolean,
      tombstoneUntilMs: Long = 0L)

  /** Watermark-finalized APPEND-mode streaming match_steps: each group
    * emits its chain EXACTLY ONCE, when it provably can no longer change —
    * the production alternative to [[streamingMatchSteps]]'s update-mode
    * refinements (which downstream consumers must upsert).
    *
    * Finality argument: the greedy chain only changes when an event with
    * timestamp STRICTLY BELOW an existing match (improvement) or any
    * timestamp beyond the last match (extension) arrives. Once a chain is
    * COMPLETE, no extension exists, and once the watermark has passed its
    * last matched timestamp every admissible event (ts ≥ watermark) is too
    * late to improve any match — so a complete chain whose last match is
    * behind the watermark is final, and that is exactly when its
    * event-time timeout fires and emits. Late-but-admissible data before
    * that point still updates the frontier and is reflected in the single
    * emitted row (the spec's refinement-then-one-emission case).
    *
    * Incomplete chains never provably finalize while the stream lives;
    * `idleFinalizeMs` drains them — a group whose event time stops
    * advancing for that gap emits its partial chain (nulls for unmatched
    * steps, funnel-style) and closes. None = only complete chains emit.
    *
    * After emission the state collapses to a TOMBSTONE held for
    * `tombstoneTtlMs` of watermark time: admissible stragglers landing
    * inside the TTL are ignored (no duplicate row); after the tombstone
    * expires a reactivated group starts a fresh chain — the documented
    * at-most-once-per-TTL trade. Streaming-only by design: in batch
    * execution timeouts never fire — use `Model.matchSteps` for batch.
    * State is O(steps) per live group, same bound as update mode. */
  def streamingMatchStepsFinal(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      eventCol: String,
      steps: Seq[String],
      watermarkDelay: String,
      idleFinalizeMs: Option[Long] = None,
      tombstoneTtlMs: Long = 24L * 3600 * 1000,
  ): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    require(steps.nonEmpty && steps.size <= 62, "1..62 steps")
    val stepIdx: Map[String, Seq[Int]] =
      steps.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val prep = events.select(
        col(groupCol).cast("string").as("__g__"),
        col(tsCol).cast("timestamp").as("__t__"),
        col(eventCol).cast("string").as("__e__"))
      .withWatermark("__t__", watermarkDelay)
    val anyRepeat = steps.distinct.size != steps.size
    val outSchema = StructType(
      StructField("group", StringType) +:
        steps.zipWithIndex.map { case (s, i) =>
          val n = if (anyRepeat) s"${s}_${i}_ts" else s"${s}_ts"
          StructField(n, TimestampType)
        })
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val bufEnc = Encoders.product[ChainFinalState]
    implicit val strEnc = Encoders.STRING
    def restore(buf: Option[ChainFinalState]): graft.expr.ChainState = {
      val sets = Array.fill(steps.size)(new java.util.TreeSet[java.lang.Long]())
      buf.foreach(_.cands.zipWithIndex.foreach { case (c, k) =>
        c.foreach(t => sets(k).add(t))
      })
      new graft.expr.ChainState(sets)
    }
    def emitRow(g: String, chain: Seq[Any]): Row =
      Row.fromSeq(g +: chain.map {
        case null            => null
        case m: java.lang.Long => DateTimeUtils.toJavaTimestamp(m)
      })
    prep
      .groupByKey((r: Row) => r.getString(0))
      .flatMapGroupsWithState[ChainFinalState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (g: String, rows: Iterator[Row], state: GroupState[ChainFinalState]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val cur = state.get
            if (cur.done) { state.remove(); Iterator.empty }
            else {
              // fire = the finality (or idle) condition held at watermark;
              // the tombstone expiry is fixed NOW, at emission
              val until = wm + math.max(1L, tombstoneTtlMs)
              state.update(cur.copy(cands = Nil, done = true,
                tombstoneUntilMs = until))
              state.setTimeoutTimestamp(until)
              Iterator.single(emitRow(g, restore(Some(cur)).chain().toSeq))
            }
          } else if (state.getOption.exists(_.done)) {
            // straggler after emission: swallow; re-pin the timeout to the
            // emission-time expiry (GroupState clears a pending timeout on
            // every data invocation, so it must be re-set — but to the
            // SAME instant, never extended). wm + 1 only guards the race
            // where the expiring batch itself carries a straggler (Spark
            // rejects timeouts at/below the current watermark).
            val until = state.get.tombstoneUntilMs
            state.update(state.get)
            state.setTimeoutTimestamp(math.max(until, wm + 1L))
            Iterator.empty
          } else {
            val st = restore(state.getOption)
            var maxSeenMs = state.getOption.map(_.maxSeenMs).getOrElse(Long.MinValue)
            rows.foreach { r =>
              if (!r.isNullAt(1) && !r.isNullAt(2)) {
                val micros = DateTimeUtils.fromJavaTimestamp(r.getTimestamp(1))
                maxSeenMs = math.max(maxSeenMs, micros / 1000L)
                stepIdx.get(r.getString(2)).foreach(_.foreach { k =>
                  st.add(k, micros)
                  st.prune()
                })
              }
            }
            state.update(ChainFinalState(st.sets.toSeq.map { s =>
              val it = s.iterator(); val b = Seq.newBuilder[Long]
              while (it.hasNext) b += it.next()
              b.result()
            }, maxSeenMs, done = false))
            val chain = st.chain()
            if (chain.nonEmpty && chain.last != null) {
              // complete: final once the watermark passes the last match
              val lastMs = chain.last.asInstanceOf[java.lang.Long].longValue() / 1000L
              state.setTimeoutTimestamp(math.max(lastMs + 1, wm + 1))
            } else idleFinalizeMs.foreach { gap =>
              state.setTimeoutTimestamp(
                math.max(maxSeenMs + gap, wm + 1))
            }
            Iterator.empty
          }
      }(bufEnc, rowEnc)
  }

  /** Pending (not-yet-final) sessions of one group — the keyed state of
    * [[streamingSessionize]]. Each entry is (startMs, endMs, count). */
  final case class SessionBuf(sessions: Seq[(Long, Long, Long)])

  /** Streaming gap-based sessionization — the streaming twin of
    * `Model.sessionize`. Keyed state = ALL not-yet-final sessions of the
    * group (each (start, end, count); usually exactly one). An incoming
    * event extends whichever pending session it lands within `gapSeconds`
    * of — merging two pending sessions when it bridges them — and a
    * session is EMITTED only once the watermark passes its end + gap,
    * i.e. once no admissible event can still extend it (an event-time
    * timeout flushes groups that simply stop sending).
    *
    * Deferring emission to the watermark is what makes cross-batch
    * stragglers exact: two watermark-admitted stragglers from the same
    * old session arriving in DIFFERENT micro-batches accumulate into the
    * same pending session and emit once — an emit-on-sight design would
    * produce two singleton sessions where the batch operator produces
    * one. Within the watermark delay the output is therefore identical to
    * `Model.sessionize` over the same events; only events later than the
    * watermark (dropped by the engine) can diverge, which is the
    * unavoidable streaming trade.
    *
    * State per group stays bounded: one open session plus one entry per
    * straggler cluster still inside the watermark delay — the timeout
    * drains them oldest-first. Group key is emitted as its string form
    * (`group`), the price of a schema-generic operator. Output: group,
    * session_start, n_events, session_end (append mode). */
  def streamingSessionize(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      gapSeconds: Long,
      watermarkDelay: String,
  ): DataFrame = {
    import org.apache.spark.sql.types._
    val gapMs = gapSeconds * 1000L
    // null timestamps cannot belong to any session — same rule as batch
    val src = events.where(col(tsCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
    val gIdx = src.schema.fieldIndex(groupCol)
    val tIdx = src.schema.fieldIndex(tsCol)
    val outSchema = StructType(Seq(
      StructField("group", StringType, nullable = false),
      StructField("session_start", TimestampType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("session_end", TimestampType, nullable = false)))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val strEnc = Encoders.STRING
    src
      .groupByKey((r: Row) => String.valueOf(r.get(gIdx)))
      .flatMapGroupsWithState[SessionBuf, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Row], state: GroupState[SessionBuf]) =>
          def emit(s: (Long, Long, Long)): Row =
            Row(key, new java.sql.Timestamp(s._1), s._3, new java.sql.Timestamp(s._2))
          val wm = state.getCurrentWatermarkMs()
          var sess = state.getOption.map(_.sessions.toList).getOrElse(Nil)
          // a micro-batch is unordered: fold events in event-time order;
          // each event merges every pending session within a gap of it
          // (bridging two sessions unifies them — exact batch parity)
          rows.map(_.getTimestamp(tIdx).getTime).toArray.sorted.foreach { t =>
            val (near, far) =
              sess.partition(s => t >= s._1 - gapMs && t <= s._2 + gapMs)
            val merged = near.foldLeft((t, t, 1L)) {
              case ((s0, e0, n0), (s1, e1, n1)) =>
                (math.min(s0, s1), math.max(e0, e1), n0 + n1)
            }
            sess = merged :: far
          }
          // final = the watermark guarantees no event can extend it: any
          // still-admissible event has ts ≥ wm ≥ end + gap, outside the gap
          val (done, pending) = sess.partition(s => s._2 + gapMs <= wm)
          if (pending.nonEmpty) {
            state.update(SessionBuf(pending))
            // fire when the earliest pending session becomes final;
            // clamped strictly past the watermark (earlier timestamps are
            // rejected by the engine)
            state.setTimeoutTimestamp(
              math.max(pending.map(_._2).min + gapMs, wm + 1L))
          } else state.remove()
          done.sortBy(_._1).map(emit).iterator
      }(Encoders.product[SessionBuf], rowEnc)
  }

  /** Tumbling-window counts per key with watermarked bounded lateness:
    * the standard `withWatermark` + `window()` aggregation; late events
    * beyond `watermarkDelay` are dropped, windows finalize incrementally. */
  /** Streaming benchmark decontamination — the streaming twin of
    * `Dedup.contamination`, shaped as a FILTER: drop any incoming document
    * that shares a word n-gram with the (static, small-by-definition)
    * evaluation suite; everything else passes through unchanged.
    *
    * The eval side collapses to a distinct md5(n-gram) set ONCE at query
    * definition and rides the plan as an array literal — the streaming
    * side is then a pure stateless per-row predicate: no stream-static
    * join, no state store, no watermark; it composes freely with the
    * stateful operators (dedup, sessionize) in either order. A benchmark
    * suite is a few thousand documents (the same tiny-side argument the
    * batch operator uses to broadcast), so the literal is MBs.
    *
    * An eval set whose distinct gram count exceeds `maxExactGrams` swaps
    * the array for a BLOOM FILTER built by one distributed aggregate
    * (`df.stat.bloomFilter`, fpp = `bloomFpp`) and probed per row by the
    * native `bloom_any_contain` expression — the same stateless predicate
    * shape with a bounded plan size at ANY suite scale. The trade is
    * one-sided: a Bloom filter has no false negatives, so contaminated
    * documents can never leak through; clean documents are over-dropped
    * at most at the fpp rate.
    *
    * Documents with fewer than `n` tokens carry no n-gram and pass (they
    * cannot leak an n-gram answer). Works on batch frames too (backfill
    * parity with the batch detector). */
  def streamingDecontaminate(
      docs: DataFrame,
      textCol: String,
      eval: DataFrame,
      evalText: String,
      n: Int = 3,
      // 64k md5-hex grams ≈ 2 MB plan literal — the "literal is MBs"
      // design point; past it the per-row arrays_overlap against a huge
      // literal costs more than the O(1) bloom probe anyway
      maxExactGrams: Long = 1L << 16,
      bloomFpp: Double = 0.001,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    val evalGramsDf = eval
      .select(TextOps.tokens(col(evalText)).as("__toks__"))
      .where(size(col("__toks__")) >= n)
      .select(explode(array_distinct(TextOps.wordShingles("__toks__", n)))
        .as("__g__"))
      .select(md5(col("__g__").cast("binary")).as("__gh__"))
      .distinct()
    // SAME tokens/shingles composition as the batch detector — one
    // tokenizer, two execution modes, no way to drift apart. NULL text
    // coalesces to '' so its gram array is EMPTY, not NULL: a null array
    // would make `!contaminated` three-valued-NULL and silently DROP the
    // doc, where every other short-of-n-grams doc passes — the oracle
    // (len(w) >= n on the token array) keeps null-text docs too.
    // gram hashing via the codegen'd native: array_distinct AFTER
    // hashing ≡ the HOF's md5-of-distinct-shingles (md5 is a pure
    // function; first-occurrence order is preserved either way — the
    // value-identity spec pins this), without paying an interpreted
    // lambda + shingle-string allocation per gram
    val withGrams = docs
      .withColumn("__toks__", TextOps.tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__gh__",
        array_distinct(call_function("word_kgram_md5s", col("__toks__"), lit(n))))
    // the gram pipeline feeds both the path decision and the chosen
    // structure — cache it so query construction runs ONE tokenize/
    // shingle/distinct job, not two over the same lineage
    evalGramsDf.persist()
    try {
      val nGrams = evalGramsDf.count()
      val contaminated: Column =
        if (nGrams <= maxExactGrams) {
          val evalArr = typedLit(
            evalGramsDf.collect().map(_.getString(0)).sorted.toSeq)
          arrays_overlap(col("__gh__"), evalArr)
        } else {
          val bf = evalGramsDf.stat.bloomFilter("__gh__", nGrams, bloomFpp)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          call_function("bloom_any_contain", lit(bos.toByteArray), col("__gh__"))
        }
      withGrams.where(!contaminated).drop("__toks__", "__gh__")
    } finally evalGramsDf.unpersist(blocking = false)
  }

  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String,
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("window_start"),
        col(keyCol), col("n"))

  /** Streaming per-group HyperLogLog registers — the streaming face of
    * [[graft.llm.Sketch.hllDistinct]]: "distinct documents/URLs/users per
    * group so far" maintained over an unbounded stream in 2^p integers of
    * state per group. The register build is ONE aggregation whose merge
    * operation (bucket-wise MAX) is idempotent and commutative, so
    * streaming's incremental micro-batch merges produce EXACTLY the batch
    * registers for the same history — run with Update mode (refreshed
    * groups only) or Complete for a snapshot, then fold the snapshot
    * through [[graft.llm.Sketch.hllEstimate]] at read time (the estimator
    * is a second aggregation, which streaming can't chain — and the
    * production shape doesn't want it to: the state IS the sketch, the
    * estimate is a query-time formula over ≤2^p rows per group). */
  def streamingHllRegisters(
      docs: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      p: Int = 8,
  ): DataFrame =
    graft.llm.Sketch.hllRegisters(docs, groupCols, valueCol, p)

  /** Streaming count-min counters — the frequency twin of
    * [[streamingHllRegisters]]: the d×w counter matrix maintained over an
    * unbounded stream as ONE streaming SUM aggregation (merge = bucket-wise
    * add, so each micro-batch's partial counters fold into state exactly
    * as batch partitions would; exactly-once input semantics make the
    * Complete-mode snapshot EQUAL the batch sketch of the full history).
    * State is ≤ d·w integer rows TOTAL — the only streaming frequency
    * shape whose state does not grow with the term dictionary; snapshot
    * rows feed [[graft.llm.Sketch.cmsEstimate]] at read time. */
  def streamingCmsCounters(
      docs: DataFrame,
      valueCol: Column,
      d: Int = 4,
      w: Int = 512,
  ): DataFrame =
    graft.llm.Sketch.cmsCounters(docs, valueCol, d, w)

  /** Streaming per-group Misra-Gries heavy-hitter candidates — the
    * streaming face of [[graft.llm.Search.heavyHittersByGroup]]'s pass 1:
    * a plain streaming aggregation whose buffer IS the mergeable MG
    * summary ([[graft.expr.MgSummary]]), so the state store holds
    * `width` counters per group forever, regardless of stream length or
    * vocabulary size. Run with Update output mode (each micro-batch
    * refreshes the groups it touched) or Complete for a per-batch
    * snapshot.
    *
    * The candidate GUARANTEE (every token with frequency > n_g/(width+1)
    * over the whole history is present) holds under streaming's
    * incremental merge order because MG summaries merge associatively
    * with additive error — the same any-merge-tree property PropertySpec
    * pins for the batch aggregate. Candidate counts (the map values)
    * remain lower bounds; the exact recount stays a batch/offline pass,
    * exactly as in the two-pass batch operator. */
  def streamingHeavyHitterCandidates(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      width: Int,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    docs
      .groupBy(col(groupCol))
      .agg(expr(s"mg_summary($textCol, $width)").as("mg_candidates"))
  }
}
