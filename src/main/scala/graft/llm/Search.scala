package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level keyword relevance / retrieval operators (beyond-reference
  * surface; the reference has no text-search operators — SURVEY.md §2.7).
  *
  * Scale design: the query path ([[bm25TopK]]) never explodes the corpus —
  * per-document term frequencies for the handful of query terms are per-row
  * closed-form expressions, corpus statistics (N, avgdl, per-term document
  * frequency) are ONE global aggregate broadcast back as a 1-row frame, and
  * the final top-k is a TakeOrdered, so the whole plan is two scans and no
  * wide shuffle. The indexing-style paths ([[tfidfTopTerms]], [[topNgrams]])
  * explode to (doc, term) grain — linear in corpus size — and aggregate
  * with map-side combine; per-document top-k pruning uses a row_number
  * window, which Spark caps per map task via WindowGroupLimit.
  *
  * Determinism: scores use only IEEE-exact double ops (+ * /) over exact
  * integer counts, except `ln` in the idf — rounded to 6 dp with id/term
  * tie-breaks, so the DuckDB oracle replays scores bit-identically.
  */
object Search {

  /** Okapi BM25 top-k document retrieval for a constant bag of query terms.
    *
    * score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    * with idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)) (Robertson/
    * Sparck-Jones with the +1 floor, as in Lucene). Documents matching no
    * term are dropped.
    *
    * The per-term tf columns are `size(filter(toks, t -> t = term))` — one
    * codegen'd pass over the token array per term, no corpus explode. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK requires at least one query term")
    def lit1(s: String) = s"'${s.replace("'", "''")}'"
    val base = docs
      .withColumn("__toks__", TextOps.tokens(col(textCol)))
      .withColumn("__dl__", size(col("__toks__")).cast("long"))
    val withTf = queryTerms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"__tf_${i}__",
        expr(s"size(filter(__toks__, t -> t = ${lit1(t)}))").cast("long"))
    }
    // ONE global aggregate → 1-row broadcast: corpus size, total token
    // count, and per-term document frequency.
    val statAggs =
      Seq(count(lit(1)).as("__n__"), sum(col("__dl__")).as("__tdl__")) ++
        queryTerms.indices.map(i =>
          sum(when(col(s"__tf_${i}__") > 0, 1L).otherwise(0L)).as(s"__df_${i}__"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("__tdl__").cast("double") / col("__n__").cast("double")
    val score = queryTerms.indices
      .map { i =>
        val tf = col(s"__tf_${i}__").cast("double")
        val df = col(s"__df_${i}__").cast("double")
        val idf = log(lit(1.0) +
          (col("__n__").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
        idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl__").cast("double") / avgdl))
      }
      .reduce(_ + _) // fixed fold order: term list order, as in the oracle
    scored
      .withColumn("score", round(score, 6))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("__dl__").as("dl"), col("score"))
  }

  /** Per-document top-k TF-IDF terms: tfidf = (tf/|d|) · ln(N/df), with
    * document frequencies taken over the WHOLE corpus and results reported
    * for the documents matching `reportPred` (bound the output, not the
    * statistics). Returns (id, term, tf, tfidf, rank ≤ k).
    *
    * Plan: corpus explode to (doc, term) → tf aggregate (map-side combine)
    * → per-term df aggregate → equi-join tf×df on term (shuffle join — the
    * term dictionary of a 100 TB corpus is itself large, so no broadcast)
    * → 1-row stats broadcast → per-doc row_number window. */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reportPred: Column,
      k: Int,
      scope: CacheScope = CacheScope.global,
  ): DataFrame = {
    val pairs = scope.cache(docs
      .withColumn("__toks__", TextOps.tokens(col(textCol)))
      .select(col(idCol), col("__toks__"),
        explode(col("__toks__")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(size(col("__toks__"))).as("__dl__")))
    val dfPerTerm = pairs.groupBy(col("term"))
      .agg(count(lit(1)).as("__df__"))
    val stats = pairs.agg(countDistinct(col(idCol)).as("__n__"))
    val ranked = pairs
      .where(reportPred)
      .join(dfPerTerm, "term")
      .crossJoin(broadcast(stats))
      .withColumn("tfidf", round(
        (col("tf").cast("double") / col("__dl__").cast("double")) *
          log(col("__n__").cast("double") / col("__df__").cast("double")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("term"))))
    ranked.where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** Corpus-wide top-k word n-grams by occurrence count (the building block
    * of n-gram LM statistics and boilerplate mining). Deterministic order:
    * count desc, gram asc. Explode is linear in corpus token count; the
    * count aggregate combines map-side; the final top-k is a TakeOrdered
    * (no global sort materialization). */
  def topNgrams(
      docs: DataFrame,
      textCol: String,
      n: Int,
      k: Int,
  ): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    docs
      .withColumn("__toks__", TextOps.tokens(col(textCol)))
      // codegen'd gram generation (wordShingles is the spec-pinned anchor)
      .select(explode(expr(s"word_ngrams(__toks__, $n)")).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  /** Fixed-size overlapping word-window chunking — the standard
    * context-window preparation step for embedding / training pipelines.
    * Chunk i covers tokens [i·stride, i·stride + chunkSize); the last chunk
    * is the first one reaching the end of the document, so every token is
    * covered and no chunk is fully contained in its predecessor. Returns
    * one row per chunk: (id, chunk_ix, chunk_text, n_tokens).
    *
    * Per-row closed form + posexplode: no shuffle, output linear in corpus
    * size (≤ chunkSize/stride × input tokens). */
  def chunkWords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int,
  ): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val toksed = docs
      .withColumn("__toks__", TextOps.tokens(col(textCol)))
      // integer ceil: 1 + ceil(max(n - chunkSize, 0) / stride)
      .withColumn("__nchunks__",
        expr(s"1 + CAST((greatest(size(__toks__) - $chunkSize, 0) + ${stride - 1}) / $stride AS INT)"))
    toksed
      .select(col(idCol),
        posexplode(expr(
          s"""transform(sequence(0, __nchunks__ - 1),
                i -> struct(
                  concat_ws(' ', slice(__toks__, i * $stride + 1, $chunkSize)) AS text,
                  least($chunkSize, size(__toks__) - i * $stride) AS n))""")))
      .select(col(idCol), col("pos").as("chunk_ix"),
        col("col.text").as("chunk_text"), col("col.n").as("n_tokens"))
  }

  /** Concat-and-chunk sequence packing — the standard LLM-pretraining prep
    * that concatenates documents in a deterministic order and splits the
    * token stream at fixed `budget` boundaries (docs crossing a boundary
    * straddle two training sequences; the trainer masks cross-doc
    * attention). Output grain is one row per (document, sequence) slice:
    * `(shard, seq_id, <id>, tok_offset, n_tokens)` where `tok_offset` is
    * the slice's position INSIDE its sequence — exactly the index map a
    * packed-batch loader needs. Every sequence except each shard's last is
    * full, so padding waste is bounded by shards/total.
    *
    * Distribution: documents are sharded by an md5 hash of the id (stable
    * under repartitioning and engine-portable), the running token count is
    * a per-shard window cumsum — ONE hash exchange + sort — and the
    * boundary explode emits 1 + spans extra rows per doc (≤ n_tok/budget).
    * The per-shard prefix sum is the only sequential dependency, so
    * `shards` is the parallelism knob: size it to ~target-sequences-per-
    * task at 100 TB (the packing itself never needs a global order). */
  /** Feature-hashing document vectors — the "hashing trick" (Weinberger
    * et al. 2009; MLlib's HashingTF analog, but md5-portable so the
    * DuckDB oracle replays the bucket assignment bit-for-bit): token t
    * lands in bucket md5_32(t) mod dims, the vector is per-bucket term
    * counts. Bridges raw text into the ANN/cosine serving ops with no
    * external embedding model — fixed dims, no vocabulary state, and the
    * inevitable collisions are the technique's documented trade-off.
    *
    * Scale shape: token explode is corpus-linear with map-side combine
    * into (doc, bucket) partial counts; assembly is one per-doc aggregate
    * whose map is bounded by `dims`. Returns (idCol, tf: array<double>
    * of length dims) — doubles so [[Embeddings]] consumes it directly. */
  def hashedTfVectors(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 64,
  ): DataFrame = {
    require(dims > 0, "dims must be positive")
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__t__"))
      .select(col(idCol),
        (conv(substring(md5(col("__t__").cast("binary")), 1, 8), 16, 10)
          .cast("bigint") % dims).as("__b__"))
      .groupBy(col(idCol), col("__b__"))
      .agg(count(lit(1)).as("__tf__"))
      .groupBy(col(idCol))
      .agg(expr(
        s"""transform(sequence(0, ${dims - 1}),
              b -> CAST(coalesce(
                element_at(map_from_arrays(collect_list(__b__),
                                           collect_list(__tf__)), CAST(b AS bigint)),
                0L) AS double))""").as("tf"))
  }

  /** Content-defined chunking (word-level Rabin-style CDC, the LBFS /
    * dedup-storage boundary rule): a chunk boundary falls BEFORE word i
    * (i >= 2) whenever the md5 of the k-gram starting at i is ≡ 0 mod
    * `modulus` — so boundaries are functions of LOCAL content only, and an
    * edit early in a document perturbs chunk identities only up to the
    * next boundary (fixed-size chunking shifts every downstream chunk).
    * Expected chunk length ≈ `modulus` words. Emits one row per chunk:
    * (id, chunk_ix, start_word, n_words, chunk_md5).
    *
    * Scale shape: gram hashing ([[graft.expr.WordKgramMd5s]]) and boundary
    * selection ([[graft.expr.CdcStarts]]) are codegen'd per-row natives;
    * the chunk rows come from ONE posexplode that carries the token array
    * alongside — zero joins, zero shuffles, the whole operator is a
    * narrow map over the scan. Chunk ends derive from the starts array
    * itself (`element_at(starts, ix+2) - 1`, else n). */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      modulus: Int = 16,
  ): DataFrame = {
    require(k >= 1 && modulus >= 1, "need k >= 1 and modulus >= 1")
    graft.GraftExtensions.install(docs.sparkSession)
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__w__"))
      .withColumn("__n__", size(col("__w__")))
      .withColumn("__starts__",
        expr(s"cdc_starts(word_kgram_md5s(__w__, $k), $modulus)"))
      .select(col(idCol), col("__w__"), col("__n__"), col("__starts__"),
        posexplode(col("__starts__")).as(Seq("__p__", "__s__")))
      .withColumn("__e__",
        coalesce(expr("try_element_at(__starts__, __p__ + 2) - 1"), col("__n__")))
      .select(
        col(idCol),
        (col("__p__") + 1).cast("long").as("chunk_ix"),
        col("__s__").cast("long").as("start_word"),
        (col("__e__") - col("__s__") + 1).cast("long").as("n_words"),
        md5(expr("CAST(array_join(slice(__w__, __s__, __e__ - __s__ + 1), ' ') AS binary)"))
          .as("chunk_md5"))
  }

  /** Exact distributed top-k frequent tokens via the two-pass heavy-hitter
    * scheme: a Misra-Gries candidate pass, then an exact recount restricted
    * to the candidates.
    *
    * Pass 1 is ONE global aggregate of [[graft.expr.MgSummary]] — state is
    * `width` counters per partition, merged map-side; no token row ever
    * shuffles, and the driver collect is a bounded model parameter
    * (<= width entries, the LM-plan-literal pattern). Pass 2 explodes
    * tokens (corpus-linear, narrow) and broadcast-semi-joins the candidate
    * set, so the groupBy shuffles at most `width` distinct keys with
    * map-side combine — at 100 TB the wire carries O(width x partitions)
    * rows either pass, never the vocabulary.
    *
    * EXACTNESS: Misra-Gries retains every token with true frequency
    * > n_tokens/(width+1) (mergeable-summaries bound, any merge tree), so
    * the recounted top-k equals the true top-k whenever the k-th true
    * count clears that threshold; `require` width >= some sanity floor and
    * document the precondition. Ties cut by (n DESC, token ASC), matching
    * the oracle's ORDER BY.
    */
  def heavyHitters(
      docs: DataFrame,
      textCol: String,
      k: Int,
      width: Int,
  ): DataFrame = {
    require(k >= 1 && width >= k,
      s"heavyHitters needs width >= k >= 1, got k=$k width=$width")
    graft.GraftExtensions.install(docs.sparkSession)
    val spark = docs.sparkSession
    import spark.implicits._
    val summary = docs
      .agg(expr(s"mg_summary($textCol, $width)").as("__mg__"))
      .select(explode(col("__mg__")).as(Seq("__tok__", "__lb__")))
    // bounded collect: <= width candidate tokens (a model parameter)
    val candidates = summary.select("__tok__").as[String].collect().toSeq
    val candDf = broadcast(candidates.toDF("__tok__"))
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("__tok__"))
      .where(col("__tok__") =!= "")
      .join(candDf, Seq("__tok__"), "left_semi")
      .groupBy(col("__tok__").as("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }

  /** Per-group exact top-k frequent tokens — [[heavyHitters]] composed
    * under a group key (the "top terms per language/source/domain" shape).
    * Pass 1 is one hash aggregate of [[graft.expr.MgSummary]] per group
    * (map-side combined, width-bounded state per group); pass 2 recounts
    * exactly over a (group, token) semi-join against the broadcast
    * candidate frame (≤ width × |groups| rows — intended for low-
    * cardinality group columns; for unbounded groups swap the broadcast
    * for a shuffle semi-join, same plan otherwise). Exactness per group
    * needs the group's k-th count > n_g/(width+1), the same Misra-Gries
    * superset bound as the global op. */
  def heavyHittersByGroup(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int,
      width: Int,
  ): DataFrame = {
    require(k >= 1 && width >= k,
      s"heavyHittersByGroup needs width >= k >= 1, got k=$k width=$width")
    graft.GraftExtensions.install(docs.sparkSession)
    val cand = docs
      .groupBy(col(groupCol))
      .agg(expr(s"mg_summary($textCol, $width)").as("__mg__"))
      .select(col(groupCol), explode(map_keys(col("__mg__"))).as("__tok__"))
    docs
      .select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("__tok__"))
      .where(col("__tok__") =!= "")
      .join(broadcast(cand), Seq(groupCol, "__tok__"), "left_semi")
      .groupBy(col(groupCol), col("__tok__"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col("n").desc, col("__tok__"))))
      .where(col("rank") <= k)
      .select(col(groupCol), col("__tok__").as("token"), col("n"), col("rank"))
  }

  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shards: Int,
  ): DataFrame = {
    require(budget > 0 && shards > 0, "need positive budget and shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .where(length(trim(col(textCol))) > 0)
      .withColumn("__nt__", size(TextOps.tokens(col(textCol))).cast("long"))
      .withColumn("shard",
        conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
          16, 10).cast("bigint") % shards)
      .withColumn("__end__", sum(col("__nt__")).over(w))
      .withColumn("__start__", col("__end__") - col("__nt__"))
      .withColumn("seq_id",
        explode(expr(s"sequence(__start__ div $budget, (__end__ - 1) div $budget)")))
      .select(col("shard"), col("seq_id"), col(idCol),
        greatest(col("__start__") - col("seq_id") * budget, lit(0L))
          .as("tok_offset"),
        (least(col("__end__"), (col("seq_id") + 1) * budget)
          - greatest(col("__start__"), col("seq_id") * budget)).as("n_tokens"))
  }
}
