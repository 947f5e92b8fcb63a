package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-language-model (SentencePiece-style, Kudo 2018) subword
  * tokenization — the OTHER production tokenizer family next to BPE
  * ([[TextOps.bpeTrain]]): pieces carry -log-probability costs and a word
  * segments to its minimal-total-cost piece sequence by Viterbi DP.
  *
  * This implementation is the deterministic, oracle-replayable core:
  * piece inventory = the corpus's most frequent substrings (length ≤
  * `maxPieceLen`) of the Heaps-bounded word-frequency table, plus EVERY
  * single character (segmentability guarantee — Viterbi can never
  * strand); piece cost = round((ln Σn − ln n) · 1e6) INTEGER micro-bits
  * (the DSIR integer-log trick: all downstream DP/compare/sum arithmetic
  * is exact, so cross-engine parity is bit-level); segmentation = the
  * codegen'd [[graft.expr.UnigramViterbi]] integer DP probing the model
  * frozen into the plan as a binary literal (the LM-plan-literal pattern
  * — zero joins at serve time). Published SentencePiece additionally runs
  * EM rounds to re-estimate piece probabilities and prunes the inventory
  * by likelihood loss; the frequency-seeded inventory here is EM's
  * standard initialization, and its serving-side mechanics (Viterbi over
  * -log-prob costs) are identical.
  *
  * Scale shape: training = one vocabulary-bounded substring explode
  * (≤ len × maxPieceLen candidates per DISTINCT word) + one aggregate +
  * a TakeOrdered cut + a ≤(V+Σchars)-row collect (bounded model
  * parameters); serving tokenizes once per DISTINCT word and
  * broadcast-joins counts back to documents (the bpeSubwordCounts
  * shape) — per-document work is a lookup, never a re-segmentation.
  */
object Unigram {

  private def normWords(textCol: String): Column =
    TextOps.letterWords(textCol) // Unicode path: NFC + lower + \p{L} split

  /** Word-frequency table (`__w__`, `__f__`) over [a-z]+ words. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(normWords(textCol)).as("__w__"))
      .where(length(col("__w__")) >= 1)
      .groupBy(col("__w__"))
      .agg(count(lit(1)).as("__f__"))

  /** Piece inventory with counts and integer micro-bit costs:
    * (piece, n, cost_microbits). Top `vocabSize` substrings by
    * (n DESC, piece) plus all single characters. */
  def fitVocab(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4,
  ): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1, "need positive knobs")
    graft.GraftExtensions.install(docs.sparkSession)
    val wf = wordFreq(docs, textCol)
    // all substrings of length 1..maxPieceLen, replicated by word freq —
    // HOF explode over the VOCABULARY frame (never raw text), the bpe
    // replace-chain precedent for vocab-bounded interpreted work
    val cand = wf.select(col("__f__"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(__w__)), i ->
                transform(sequence(1, least($maxPieceLen, length(__w__) - i + 1)),
                  l -> substring(__w__, i, l))))""")).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("__f__")).as("n"))
    val top = cand.orderBy(col("n").desc, col("piece")).limit(vocabSize)
    val chars = cand.where(length(col("piece")) === 1)
    val sel = top.union(chars).distinct()
    // 1-row total broadcast: cost = round((ln T - ln n) * 1e6) micro-bits
    val tot = sel.agg(sum(col("n")).as("__t__"))
    sel.crossJoin(broadcast(tot))
      .select(col("piece"), col("n"),
        expr("CAST(round((ln(CAST(__t__ AS double)) - ln(CAST(n AS double))) * 1000000) AS bigint)")
          .as("cost_microbits"))
  }

  /** One hard-EM (Viterbi) re-estimation + prune round over a seed
    * inventory — the published SentencePiece training loop's step (Kudo
    * 2018 §4.2), in its deterministic Viterbi approximation (the 1-best
    * segmentation stands in for forward-backward expectations, so every
    * count is an exact integer and the DuckDB oracle can replay the
    * whole round bit-for-bit):
    *
    *   - E-step: every DISTINCT corpus word (≤ `maxWordLen`; longer
    *     words are unk and carry no piece evidence) segments through the
    *     codegen'd `unigram_viterbi_pieces` native probing the seed
    *     model as a plan literal — zero joins, one DP per distinct word;
    *     expected counts = word-frequency-weighted piece counts of the
    *     best paths, ONE map-side-combined aggregate;
    *   - prune: keep the top `vocabSize` pieces by (count DESC, piece) —
    *     pieces Viterbi never uses fall out of the inventory, the
    *     likelihood-loss prune's deterministic proxy;
    *   - segmentability floor: seed single-character pieces always stay,
    *     at count max(n, 1), so any future word remains segmentable;
    *   - M-step: cost = round((ln ΣN − ln n)·1e6) integer micro-bits
    *     over the kept inventory (`StrictMath.log` + HALF_UP — the exact
    *     functions Spark's `ln`/`round` codegen calls).
    *
    * The count table is vocabulary-bounded, so prune/floor/M-step run on
    * the driver as model parameters (the k-means-centroid defense).
    * Output: (piece, n, cost_microbits) — [[fitVocab]]'s schema, so
    * rounds chain: feed the output costs back through
    * [[emRefitWithVocab]] for EM round two. */
  def emRefit(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 12,
  ): DataFrame = {
    val seed = fitVocab(docs, textCol, vocabSize, maxPieceLen)
      .select(col("piece"), col("cost_microbits"))
      .collect() // bounded model parameter: <= vocabSize + |alphabet| rows
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    emRefitWithVocab(docs, textCol, seed, vocabSize, maxPieceLen, maxWordLen)
  }

  /** [[emRefit]] from an EXPLICIT seed (piece, cost_microbits) inventory
    * — chain rounds by feeding one round's output costs into the next. */
  def emRefitWithVocab(
      docs: DataFrame,
      textCol: String,
      seedCosts: Seq[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 12,
  ): DataFrame = {
    require(seedCosts.nonEmpty, "need a non-empty seed vocabulary")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.GraftExtensions.install(spark)
    // unk cost is irrelevant here: unreachable words return "[UNK]" from
    // the pieces native and are filtered out of the evidence
    val model = graft.expr.UnigramModel.encode(
      seedCosts.sortBy(_._1), maxPieceLen, maxWordLen, 30000000L)
    val counts = wordFreq(docs, textCol)
      .where(length(col("__w__")) <= maxWordLen)
      .select(col("__f__"), explode(split(
        call_function("unigram_viterbi_pieces", col("__w__"), lit(model)),
        " ")).as("piece"))
      .where(col("piece") =!= "[UNK]")
      .groupBy(col("piece")).agg(sum(col("__f__")).as("n"))
      .collect() // bounded model parameter: <= seed inventory rows
      .map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (p, n) => (-n, p) }.take(vocabSize)
    val topPieces = top.map(_._1).toSet
    val floorChars = seedCosts.map(_._1).filter(_.length == 1).distinct
      .filterNot(topPieces)
      .map(c => (c, math.max(counts.collectFirst {
        case (p, n) if p == c => n
      }.getOrElse(0L), 1L)))
    val kept = (top ++ floorChars).sortBy(_._1)
    val t = kept.map(_._2).sum
    def cost(n: Long): Long =
      BigDecimal((StrictMath.log(t.toDouble) - StrictMath.log(n.toDouble))
        * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    kept.map { case (p, n) => (p, n, cost(n)) }.toSeq
      .toDF("piece", "n", "cost_microbits")
  }

  /** The non-cut vocabSize passed to the recost E-step after pruning —
    * large enough that the count table (≤ pruned inventory) is never cut
    * again; the oracle replays the same literal. */
  val PruneRecostCap = 1000000

  /** VOCABULARY PRUNING by likelihood loss — the missing half of Kudo
    * 2018's training loop next to [[emRefit]] (§4.2 step 3: "compute the
    * loss of removing each piece, keep the top η%"), in the same
    * deterministic Viterbi approximation that makes the EM rounds
    * oracle-replayable:
    *
    *   - loss(x) = Σ_w f_w · (viterbi_cost_without_x(w) − best_cost(w))
    *     over the words whose BEST path uses x — computed by the
    *     codegen'd `unigram_viterbi_excl` native (one extra DP per
    *     (word, used-multi-char-piece) pair; words and their paths come
    *     from the same `unigram_viterbi[_pieces]` plan-literal probes as
    *     the E-step). Pieces outside every best path have zero loss and
    *     are never probed.
    *   - keep the `keepPieces` highest-loss multi-char pieces
    *     ((loss DESC, piece) — removing them would hurt the corpus
    *     likelihood most); single characters always survive (the
    *     segmentability floor, exactly SentencePiece's rule).
    *   - re-cost: one [[emRefitWithVocab]] pass through the pruned
    *     inventory (vocabSize = [[PruneRecostCap]], a non-cut) re-counts
    *     usage under the smaller model and re-derives integer micro-bit
    *     costs.
    *
    * The loss aggregate is vocabulary-bounded (collected as model
    * parameters, the k-means-centroid defense); corpus work is two
    * distinct-word passes (loss probes + recost) — linear, shuffle-free
    * per-word natives. Output: (piece, n, cost_microbits) —
    * [[fitVocab]]'s schema, chainable into further EM rounds. */
  def pruneVocab(
      docs: DataFrame,
      textCol: String,
      seedCosts: Seq[(String, Long)],
      keepPieces: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 12,
  ): DataFrame = {
    require(seedCosts.nonEmpty, "need a non-empty seed vocabulary")
    require(keepPieces >= 0, "keepPieces must be non-negative")
    val spark = docs.sparkSession
    graft.GraftExtensions.install(spark)
    val model = graft.expr.UnigramModel.encode(
      seedCosts.sortBy(_._1), maxPieceLen, maxWordLen, 30000000L)
    val seg = wordFreq(docs, textCol)
      .where(length(col("__w__")) <= maxWordLen)
      .select(col("__w__"), col("__f__"),
        call_function("unigram_viterbi", col("__w__"), lit(model))
          .as("__best__"),
        split(call_function("unigram_viterbi_pieces", col("__w__"), lit(model)),
          " ").as("__pp__"))
      .where(!array_contains(col("__pp__"), "[UNK]"))
    val losses = seg
      .select(col("__w__"), col("__f__"), col("__best__"),
        explode(array_distinct(expr("filter(__pp__, p -> length(p) >= 2)")))
          .as("__x__"))
      .withColumn("__alt__",
        call_function("unigram_viterbi_excl", col("__w__"), lit(model),
          col("__x__")))
      .groupBy(col("__x__"))
      .agg(sum(col("__f__") *
        (expr("__alt__ div 64") - expr("__best__ div 64"))).as("__loss__"))
      .collect() // bounded model parameter: <= multi-char inventory rows
      .map(r => (r.getString(0), r.getLong(1)))
    val keep = losses.sortBy { case (p, l) => (-l, p) }
      .take(keepPieces).map(_._1).toSet
    val prunedCosts = seedCosts.filter { case (p, _) =>
      p.length == 1 || keep(p)
    }
    emRefitWithVocab(docs, textCol, prunedCosts, PruneRecostCap,
      maxPieceLen, maxWordLen)
  }

  /** Per-document segmentation statistics through the learned vocabulary:
    * (idCol, n_pieces, cost_microbits). Words longer than `maxWordLen`
    * score as a single unk piece of `unkCostMicrobits`. */
  def segmentCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 12,
      unkCostMicrobits: Long = 30000000L,
  ): DataFrame = {
    val vocab = fitVocab(docs, textCol, vocabSize, maxPieceLen)
      .select(col("piece"), col("cost_microbits"))
      .collect() // bounded model parameter: <= vocabSize + |alphabet| rows
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    segmentCountsWithVocab(docs, idCol, textCol, vocab,
      maxPieceLen, maxWordLen, unkCostMicrobits)
  }

  /** [[segmentCounts]] through an EXPLICIT (piece, cost_microbits)
    * vocabulary — typically a persisted [[fitVocab]] frame read back
    * from parquet: tokenizer-model persistence is a plain table
    * write/read, no bespoke format (the ANN index / WordPiece-vocab
    * pattern). */
  def segmentCountsWithVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabCosts: Seq[(String, Long)],
      maxPieceLen: Int = 4,
      maxWordLen: Int = 12,
      unkCostMicrobits: Long = 30000000L,
      byteFallback: Boolean = false,
      byteCostMicrobits: Long = 5000000L,
  ): DataFrame = {
    require(vocabCosts.nonEmpty, "need a non-empty vocabulary")
    graft.GraftExtensions.install(docs.sparkSession)
    val model = graft.expr.UnigramModel.encode(
      vocabCosts.sortBy(_._1), maxPieceLen, maxWordLen, unkCostMicrobits)
    // segment once per DISTINCT word; broadcast back to documents.
    // With byteFallback an unsegmentable word (OOV character, or longer
    // than maxWordLen) contributes its UTF-8 BYTE count as pieces and
    // byteCostMicrobits per byte — the SentencePiece byte-fallback rule
    // at word granularity (the WordPiece twin's contract): vocabulary
    // words keep their exact Viterbi segmentation, nothing is ever a
    // flat unk, and the columns stay honest sums. Fallback values live
    // OUTSIDE the packed cost·64+n encoding (a long word's byte count
    // can exceed the 6-bit piece field).
    val words = docs
      .select(col(idCol), explode(normWords(textCol)).as("__w__"))
      .where(length(col("__w__")) >= 1)
    val dwBase = words.select(col("__w__")).distinct()
      .withColumn("__comp__",
        call_function("unigram_viterbi", col("__w__"), lit(model)))
    val dw =
      if (!byteFallback)
        dwBase
          .withColumn("__np__", expr("__comp__ % 64"))
          .withColumn("__cost__", expr("__comp__ div 64"))
      else {
        val nb = octet_length(col("__w__")).cast("long")
        val unk = call_function("unigram_viterbi_pieces",
          col("__w__"), lit(model)) === lit("[UNK]")
        dwBase
          .withColumn("__np__",
            when(unk, nb).otherwise(expr("__comp__ % 64")))
          .withColumn("__cost__",
            when(unk, nb * lit(byteCostMicrobits))
              .otherwise(expr("__comp__ div 64")))
      }
    words
      .join(broadcast(dw.select(col("__w__"), col("__np__"), col("__cost__"))),
        Seq("__w__"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__np__")).as("n_pieces"),
        sum(col("__cost__")).as("cost_microbits"))
  }
}
