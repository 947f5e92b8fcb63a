package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.BigramLm

/** CCNet-style language-model perplexity quality filter
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data", 2020): score every document by how surprising
  * its character sequence is under a language model trained on a trusted
  * slice of the corpus, then keep/bucket by the score. CCNet uses a
  * word-level KenLM; the engine ships the same pipeline shape with a
  * char-bigram add-α model, which is closed-form, oracle-replayable, and
  * dense (27² = 729 parameters).
  *
  * Scale anatomy (the 100 TB story):
  *   - TRAINING is one map-side-combined aggregate: a codegen'd native
  *     (`char_bigram_counts`) reduces each document to its ≤729-entry
  *     bigram histogram, so the explode+groupBy runs on vocabulary-bounded
  *     rows — never corpus characters. The model collect is ≤729 rows
  *     (model parameters, same defense as the k-means centroid pin).
  *   - SERVING is a pure per-row projection: the dense model freezes into
  *     the plan as a 5.7 KB binary literal probed by the codegen'd
  *     `lm_bits` native — zero joins, zero shuffles, composes with any
  *     downstream filter.
  *
  * Determinism contract (shared with the DuckDB oracle):
  *   - normalization: `trim(regexp_replace(lower(text), '[^a-z]+', ' '))`
  *     on both engines (ASCII corpus; byte-identical results).
  *   - each model term is round(log2((n+α)/(m+αV)), 6) with α = 0.5 —
  *     6-dp rounding absorbs the ≤1-ulp log2 divergence across engines.
  *   - a document's score folds count·term over bigrams in ascending
  *     slot order = `ORDER BY bigram` binary order; every term is
  *     strictly negative so the 0.0 seed is IEEE-identical to DuckDB's
  *     first-element-seeded `list_reduce`.
  */
object LangModel {

  /** α of the add-α smoothing; αV = 13.5 appears in the oracle SQL. */
  val Alpha = 0.5

  /** Lowercase, collapse non-letters to single spaces, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z]+", " "))

  private def normSql(textCol: String): String =
    s"trim(regexp_replace(lower($textCol), '[^a-z]+', ' '))"

  /** Train the dense bigram model on `train`'s text column: one
    * vocabulary-bounded aggregate, a ≤729-row collect, and add-α terms
    * computed with Spark's own log2 (StrictMath) + HALF_UP 6-dp round so
    * the DuckDB oracle's `round(log2(...), 6)` replays them exactly.
    * Slots never seen in training get the smoothed fallback
    * (α / (m(c1) + αV), degenerating to 1/V when c1 is unseen), so the
    * returned array is fully dense and scoring needs no backoff logic. */
  def fitBigramLm(train: DataFrame, textCol: String): Array[Double] = {
    graft.GraftExtensions.install(train.sparkSession)
    val rows = train
      .select(normText(col(textCol)).as("__t__"))
      .where(col("__t__").isNotNull)
      .select(explode(call_function("char_bigram_counts", col("__t__"))))
      .groupBy(col("key")).agg(sum("value").as("n"))
      .collect()
    val counts = new Array[Long](BigramLm.Slots)
    rows.foreach { r => counts(BigramLm.slotOf(r.getString(0))) = r.getLong(1) }
    val marg = Array.tabulate(BigramLm.V) { c1 =>
      var m = 0L; var c2 = 0
      while (c2 < BigramLm.V) { m += counts(c1 * BigramLm.V + c2); c2 += 1 }
      m
    }
    val aV = Alpha * BigramLm.V
    Array.tabulate(BigramLm.Slots) { s =>
      val p = (counts(s) + Alpha) / (marg(s / BigramLm.V) + aV)
      // Spark's Log2 evaluates via StrictMath.log (see TextEntropy) —
      // required for parity with the oracle's round(log2(x), 6)
      val t = java.lang.StrictMath.log(p) / java.lang.StrictMath.log(2.0)
      java.math.BigDecimal.valueOf(t + 0.0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }

  /** Per-row bits-per-bigram score (normalizes internally). NULL text →
    * NULL; empty/1-char normalized text → 0.0. */
  def bitsPerChar(textCol: Column, model: Array[Double]): Column =
    call_function("lm_bits", normText(textCol), lit(BigramLm.encode(model)))

  /** The shared interpolated-KN probability formula — ONE string, used
    * verbatim by the Spark lowering AND the DuckDB oracle so the IEEE
    * operation order (and therefore every compound-rounded double) is
    * literally identical on both engines. Expects columns c12 (bigram
    * count, NULL if unseen), c1/n1fw (left-word count / distinct
    * continuations, NULL if w1 unseen), n1bw (distinct left contexts of
    * w2, NULL if w2 unseen), n12 (total distinct bigrams). D = 0.75
    * fixed; c12 ≥ 1 makes max(c12−D, 0) redundant. */
  private[graft] val KnPSql: String =
    """CASE
         WHEN c12 IS NOT NULL THEN
           ((CAST(c12 AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE))
           + ((0.75 * CAST(n1fw AS DOUBLE)) / CAST(c1 AS DOUBLE))
             * (coalesce(CAST(n1bw AS DOUBLE), CAST(0 AS DOUBLE))
                / CAST(n12 AS DOUBLE))
         WHEN c1 IS NOT NULL THEN
           ((0.75 * CAST(n1fw AS DOUBLE)) / CAST(c1 AS DOUBLE))
             * (coalesce(CAST(n1bw AS DOUBLE), CAST(0 AS DOUBLE))
                / CAST(n12 AS DOUBLE))
         ELSE coalesce(CAST(n1bw AS DOUBLE), CAST(0 AS DOUBLE))
              / CAST(n12 AS DOUBLE)
       END"""

  /** Per-bigram integer micro-bits: −log₂(p)·1e6 rounded, with the
    * deterministic 30-bit OOV penalty when the continuation mass is zero
    * (unseen w2). Same literal on both engines. */
  private[graft] val KnTermSql: String =
    """CASE WHEN p <= 0 THEN 30000000
       ELSE CAST(round((-log2(p)) * 1000000) AS BIGINT) END"""

  /** Interpolated Kneser–Ney word-bigram perplexity (Kneser & Ney 1995;
    * Chen & Goodman 1998's interpolated form, fixed discount D = 0.75) —
    * the WORD-level LM quality scorer the CCNet pipeline actually runs
    * (KenLM is KN-smoothed), next to the dense char-bigram model above:
    *
    *   P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁)
    *            + (D·N1+(w₁•)/c(w₁)) · N1+(•w₂)/N1+(••)
    *
    * with the continuation distribution N1+(•w₂)/N1+(••) as the unigram
    * base (the "how many contexts" estimate that makes KN beat raw
    * counts). Unseen w₁ backs off entirely to the continuation
    * distribution; an unseen w₂ takes a flat 30-bit OOV penalty.
    * Tokenization = the shared Unicode tokenizer norm
    * ([[TextOps.letterWords]]).
    *
    * Determinism: every count is an exact integer; P is the SAME IEEE
    * double expression on both engines ([[KnPSql]], literally identical
    * operation order); each bigram's −log₂ rounds to INTEGER micro-bits
    * before the per-doc sum (order-free under any shuffle; the ~1ulp
    * cross-engine log2 divergence is absorbed, the q_lm_perplexity
    * precedent); one final 6-dp division.
    *
    * Scale anatomy: training is ONE map-side-combined bigram-count
    * aggregate over the trusted slice (the unigram/continuation tables
    * DERIVE from the Heaps-bounded bigram table — no second corpus
    * pass); scoring explodes doc bigrams once and LEFT-joins the three
    * model tables (vocabulary-bounded — AQE broadcasts them) plus a
    * 1-row total attach, then one per-doc aggregate. Short docs
    * (< 2 words) re-emit as (0, 0.0) through a thin left join.
    * Output: (idCol, n_bigrams, bits_per_bigram). */
  def knBigramScore(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      scope: CacheScope = CacheScope.global): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    def bigramsOf(df: DataFrame, cols: Column*): DataFrame = df
      .withColumn("__toks__", TextOps.letterWords(textCol))
      .where(size(col("__toks__")) >= 2 &&
        element_at(col("__toks__"), 1) =!= "")
      .select(cols :+ explode(TextOps.wordShingles("__toks__", 2)).as("bg"): _*)
    val tb = scope.cache(bigramsOf(train)
      .groupBy(col("bg")).agg(count(lit(1)).as("c12")))
    val uni = tb
      .groupBy(expr("split(bg, ' ')[0]").as("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fw"))
    val cont = tb
      .groupBy(expr("split(bg, ' ')[1]").as("w2"))
      .agg(count(lit(1)).as("n1bw"))
    val tot = tb.agg(count(lit(1)).as("n12"))
    val scored = bigramsOf(docs, col(idCol))
      .withColumn("w1", expr("split(bg, ' ')[0]"))
      .withColumn("w2", expr("split(bg, ' ')[1]"))
      .join(tb, Seq("bg"), "left")
      .join(uni, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot)) // 1-row model parameter attach
      .withColumn("p", expr(KnPSql))
      .withColumn("__mb__", expr(KnTermSql))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__mb__")).as("__s__"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__s__").cast("double") / col("n_bigrams").cast("double")
          / lit(1000000.0), 6).as("bits_per_bigram"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bits_per_bigram"), lit(0.0)).as("bits_per_bigram"))
  }

  /** Continuation-unigram probability of the trigram model's base level:
    * N1+(•w3)/N1+(••) over the distinct-(w2,w3)-with-left-context table.
    * Expects n1bw3 (NULL if w3 unseen) and nuni. */
  private[graft] val Kn3PuSql: String =
    """coalesce(CAST(n1bw3 AS DOUBLE), CAST(0 AS DOUBLE))
       / CAST(nuni AS DOUBLE)"""

  /** Middle (bigram) level of the trigram model, built from CONTINUATION
    * counts the KN way: "counts" are N1+(•w2w3) (distinct left contexts
    * of the bigram in the trigram table), the context mass is
    * N1+(•w2•) = nc2 and the interpolation weight uses
    * N1+(w2•) = n1fw2m (distinct continuations of w2 among trigram
    * middles). NULL-keyed backoff: bigram unseen → weight·pu; middle
    * word unseen → pu alone. Same fixed D = 0.75. */
  private[graft] val Kn3PbSql: String =
    """CASE
         WHEN n1bw23 IS NOT NULL THEN
           ((CAST(n1bw23 AS DOUBLE) - 0.75) / CAST(nc2 AS DOUBLE))
           + ((0.75 * CAST(n1fw2m AS DOUBLE)) / CAST(nc2 AS DOUBLE)) * pu
         WHEN nc2 IS NOT NULL THEN
           ((0.75 * CAST(n1fw2m AS DOUBLE)) / CAST(nc2 AS DOUBLE)) * pu
         ELSE pu
       END"""

  /** Top (trigram) level: raw counts c123/c12, interpolation weight
    * D·N1+(w1w2•)/c(w1w2), recursing into the already-computed middle
    * probability `pb`. Unseen context backs off to `pb` entirely. */
  private[graft] val Kn3PSql: String =
    """CASE
         WHEN c123 IS NOT NULL THEN
           ((CAST(c123 AS DOUBLE) - 0.75) / CAST(c12 AS DOUBLE))
           + ((0.75 * CAST(n1fw12 AS DOUBLE)) / CAST(c12 AS DOUBLE)) * pb
         WHEN c12 IS NOT NULL THEN
           ((0.75 * CAST(n1fw12 AS DOUBLE)) / CAST(c12 AS DOUBLE)) * pb
         ELSE pb
       END"""

  /** Interpolated Kneser–Ney word-TRIGRAM perplexity — [[knBigramScore]]
    * generalized to order 3 with the full recursive backoff (the KenLM
    * shape: Chen & Goodman 1998 interpolated KN, fixed D = 0.75):
    *
    *   P(w₃|w₁w₂) = (c(w₁w₂w₃)−D)/c(w₁w₂)
    *              + (D·N1+(w₁w₂•)/c(w₁w₂)) · P_KN(w₃|w₂)
    *   P_KN(w₃|w₂) = (N1+(•w₂w₃)−D)/N1+(•w₂•)
    *              + (D·N1+(w₂•)/N1+(•w₂•)) · N1+(•w₃)/N1+(••)
    *
    * EVERY lower-order quantity derives from the ONE trigram-count
    * table (continuation counts, the Kneser–Ney insight) — training
    * stays a single map-side-combined corpus pass; the middle/unigram
    * tables are vocabulary-bounded aggregates of it. No sentence
    * markers: a bigram occurring only at document edges has no
    * enclosing trigram and backs off (KenLM's <s> padding is a corpus
    * prep choice, not an operator one).
    *
    * Determinism: the ONE-shared-formula-string discipline of the
    * bigram op, layered — `pu`, `pb`, `p` are each computed as their
    * own column from a literal shared with the oracle ([[Kn3PuSql]] /
    * [[Kn3PbSql]] / [[Kn3PSql]]), so the IEEE op order is identical on
    * both engines; per-trigram integer micro-bits ([[KnTermSql]], flat
    * 30-bit OOV when the continuation mass is zero) make the per-doc
    * sum order-free. Short docs (< 3 words) re-emit as (0, 0.0).
    * Output: (idCol, n_trigrams, bits_per_trigram). */
  def knTrigramScore(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      scope: CacheScope = CacheScope.global): DataFrame = {
    graft.GraftExtensions.install(docs.sparkSession)
    def trigramsOf(df: DataFrame, cols: Column*): DataFrame = df
      .withColumn("__toks__", TextOps.letterWords(textCol))
      .where(size(col("__toks__")) >= 3 &&
        element_at(col("__toks__"), 1) =!= "")
      .select(cols :+ explode(TextOps.wordShingles("__toks__", 3)).as("tg"): _*)
    val tb3 = scope.cache(trigramsOf(train)
      .groupBy(col("tg")).agg(count(lit(1)).as("c123")))
    val ctx = tb3
      .groupBy(substring_index(col("tg"), " ", 2).as("bg12"))
      .agg(sum(col("c123")).as("c12"), count(lit(1)).as("n1fw12"))
    val mid = scope.cache(tb3
      .groupBy(substring_index(col("tg"), " ", -2).as("bg23"))
      .agg(count(lit(1)).as("n1bw23")))
    val midctx = mid
      .groupBy(expr("split(bg23, ' ')[0]").as("w2m"))
      .agg(sum(col("n1bw23")).as("nc2"), count(lit(1)).as("n1fw2m"))
    val uni3 = mid
      .groupBy(expr("split(bg23, ' ')[1]").as("w3"))
      .agg(count(lit(1)).as("n1bw3"))
    val tot = mid.agg(count(lit(1)).as("nuni"))
    val scored = trigramsOf(docs, col(idCol))
      .withColumn("bg12", substring_index(col("tg"), " ", 2))
      .withColumn("bg23", substring_index(col("tg"), " ", -2))
      .withColumn("w2m", expr("split(tg, ' ')[1]"))
      .withColumn("w3", expr("split(tg, ' ')[2]"))
      .join(tb3, Seq("tg"), "left")
      .join(ctx, Seq("bg12"), "left")
      .join(mid, Seq("bg23"), "left")
      .join(midctx, Seq("w2m"), "left")
      .join(uni3, Seq("w3"), "left")
      .crossJoin(broadcast(tot)) // 1-row model parameter attach
      .withColumn("pu", expr(Kn3PuSql))
      .withColumn("pb", expr(Kn3PbSql))
      .withColumn("p", expr(Kn3PSql))
      .withColumn("__mb__", expr(KnTermSql))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__mb__")).as("__s__"))
      .select(col(idCol), col("n_trigrams"),
        round(col("__s__").cast("double") / col("n_trigrams").cast("double")
          / lit(1000000.0), 6).as("bits_per_trigram"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("bits_per_trigram"), lit(0.0)).as("bits_per_trigram"))
  }

  /** Per-level interpolated-KN probability formula, GENERATED (one
    * source of truth for the Spark lowering AND the oracle): level 1 is
    * the continuation-unigram base, level k ≥ 2 interpolates its
    * (adjusted-)count estimate with the already-computed level-(k−1)
    * probability `p{k-1}`. Columns per level: cnt$k (gram count at the
    * level, NULL if unseen), tot$k / nfw$k (context mass / distinct
    * continuations, NULL if the context is unseen). Fixed D = 0.75. */
  private[graft] def knLevelPSql(k: Int): String =
    if (k == 1)
      """coalesce(CAST(cnt1 AS DOUBLE), CAST(0 AS DOUBLE))
         / CAST(tot1 AS DOUBLE)"""
    else
      s"""CASE
         WHEN cnt$k IS NOT NULL THEN
           ((CAST(cnt$k AS DOUBLE) - 0.75) / CAST(tot$k AS DOUBLE))
           + ((0.75 * CAST(nfw$k AS DOUBLE)) / CAST(tot$k AS DOUBLE))
             * p${k - 1}
         WHEN tot$k IS NOT NULL THEN
           ((0.75 * CAST(nfw$k AS DOUBLE)) / CAST(tot$k AS DOUBLE))
             * p${k - 1}
         ELSE p${k - 1}
       END"""

  /** Interpolated Kneser–Ney word N-GRAM perplexity for ANY order ≥ 2 —
    * the full KenLM shape (KenLM ships order 5): one raw N-gram-count
    * pass over the trusted slice, then EVERY lower level's
    * adjusted-count table derives recursively by the Kneser–Ney rule
    * (level-k count of gram u = number of DISTINCT left extensions of u
    * among level-(k+1) SEEN grams), contexts aggregate per level, and
    * scoring LEFT-joins the 2(N−1)+1 vocabulary-bounded model tables
    * (AQE broadcasts them) before folding the probability chain
    * p1 → … → pN with the per-level generated formula ([[knLevelPSql]],
    * shared verbatim with the oracle — the layered IEEE-order
    * discipline of the bigram/trigram ops, which this generalizes:
    * LlmSpec pins order 2 ≡ [[knBigramScore]] and order 3 ≡
    * [[knTrigramScore]] value-for-value). Integer micro-bit terms
    * ([[KnTermSql]]) keep per-doc sums order-free; short docs
    * (< order words) re-emit as (0, 0.0).
    * Output: (idCol, n_ngrams, bits_per_ngram). */
  def knNgramScore(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      order: Int = 5,
      scope: CacheScope = CacheScope.global,
      prune: Seq[Long] = Seq.empty): DataFrame = {
    val n = order
    val seen = knPruned(knLevelTables(train, textCol, order, scope), prune)
    // per-level ctx aggregates over the cached level tables, as in r17:
    // a fused all-levels ctx aggregate (union + one groupBy + cache) was
    // built and MEASURED this round — the extra InMemoryRelation encode
    // of the model-sized union cost more than the removed stages
    // (q_lm_kn5 4.3 → 5.3 s steady) and was reverted per guide §1.1
    def ctx(k: Int): DataFrame = knCtxTable(seen(k), k)
    val tot1 = seen(1).agg(sum(col("cnt1")).as("tot1"))
    knScoreFromTables(docs, idCol, textCol, n, seen(_), Some(ctx), tot1)
  }

  /** KenLM-style count PRUNING (`--prune` thresholds, one per level
    * 1..N; missing/0 = keep all): the model STORES only grams whose
    * level count exceeds the level's threshold. Thresholding happens
    * AFTER the full adjusted-count derivation (the KenLM rule — lower
    * levels derive from the unpruned level above, so pruning level k
    * never changes level k−1's counts); everything downstream of the
    * stored tables — context aggregates, the unigram total, scoring
    * joins — sees only kept grams, and a pruned gram scores through
    * backoff exactly like an unseen one. */
  private def knPruned(
      seen: Array[DataFrame], prune: Seq[Long]): Array[DataFrame] =
    if (prune.forall(_ <= 0)) seen
    else seen.zipWithIndex.map { case (df, k) =>
      val t = if (k >= 1 && k <= prune.length) prune(k - 1) else 0L
      if (df == null || t <= 0) df else df.where(col(s"cnt$k") > t)
    }

  /** Per-level STUPID BACKOFF score (Brants et al. 2007 §3, the LM
    * smoothing built FOR distributed web-scale training — no
    * discounting, no continuation counts, fixed backoff α = 0.4, scores
    * unnormalized by design): level 1 is the raw relative frequency,
    * level k ≥ 2 uses the raw count ratio when the gram is seen and
    * α·S(level k−1) otherwise. GENERATED and shared verbatim with the
    * oracle, like [[knLevelPSql]]. */
  private[graft] def sbLevelPSql(k: Int): String =
    if (k == 1)
      """coalesce(CAST(cnt1 AS DOUBLE), CAST(0 AS DOUBLE))
         / CAST(tot1 AS DOUBLE)"""
    else
      s"""CASE WHEN cnt$k IS NOT NULL THEN
           CAST(cnt$k AS DOUBLE) / CAST(tot$k AS DOUBLE)
         ELSE 0.4 * p${k - 1} END"""

  /** STUPID BACKOFF word N-gram scoring (Brants et al. 2007 — "Large
    * Language Models in Machine Translation", the Google MapReduce LM):
    * the smoothing a 100 TB corpus actually trains, because every model
    * table is a plain COUNT — one raw N-gram pass, lower levels derive
    * by SUFFIX-SUM (level-k count of gram u = Σ counts of level-(k+1)
    * grams ending in u — the sliding-window suffix definition, one
    * corpus pass total, documented deviation from per-level recounting
    * which differs only at document-boundary windows), contexts reuse
    * the same aggregate shape as KN, and the score chain is the shared
    * generated formula ([[sbLevelPSql]]). S is intentionally NOT a
    * probability (Brants: "we do not normalize"); the micro-bit fold
    * treats it as one, which is the standard bits-proxy use. Output:
    * (idCol, n_ngrams, bits_per_ngram). */
  def sbNgramScore(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      order: Int = 5,
      scope: CacheScope = CacheScope.global): DataFrame = {
    require(order >= 2 && order <= 8, "order must be in [2, 8]")
    graft.GraftExtensions.install(train.sparkSession)
    val n = order
    val topGrams = scope.cache(knGramsOf(train, textCol, n)
      .groupBy(col("tg").as("g")).agg(count(lit(1)).as("cnt")))
    // ALL lower suffix-sum levels from ONE fused aggregate (guide §2.3 —
    // the old derivation was N−1 SEQUENTIAL cached shuffles): suffix
    // sums TELESCOPE — cnt_k(u) = Σ_{(k+1)-grams v: suffix_k(v)=u}
    // cnt_{k+1}(v) = Σ_{N-grams g: suffix_k(g)=u} cnt_N(g) — so every
    // level k < N is one explode of the N-gram table into its
    // 1..(N−1)-word suffixes weighted by cnt_N and one grouped sum (a
    // key's word count is its level; levels cannot collide).
    // Sequential suffix-sum chain + per-level ctx pre-merge joins, the
    // r17 shape, deliberately: both fused alternatives were built and
    // MEASURED this round and regressed at sf0.1 — (a) telescoping the
    // suffix sums into one explode+aggregate shuffles the 4×-exploded
    // suffix set where the chain shuffles each shrinking level once, and
    // (b) collapsing the per-level seen⋈ctx joins into one window over
    // the fused level union pays a model-sized extra InMemoryRelation
    // encode (q_lm_sb5 3.7 → 3.95 s steady, cpu 28 → 37 s). Reverted per
    // guide §1.1; the family is model-table-volume bound at this scale,
    // not stage-count bound.
    val seen = new Array[DataFrame](n + 1)
    seen(n) = topGrams.withColumnRenamed("cnt", s"cnt$n")
    for (k <- (n - 1) to 1 by -1)
      seen(k) = scope.cache(seen(k + 1)
        .groupBy(substring_index(col("g"), " ", -k).as("g"))
        .agg(sum(col(s"cnt${k + 1}")).as(s"cnt$k")))
    // SB's formula reads tot_k only on gram-HIT rows, so each level's
    // context total pre-merges onto the gram rows at the model layer
    // (vocabulary-bounded join; every gram's context exists by
    // construction) and scoring probes N tables instead of 2N−1 —
    // identical values, half the broadcast builds per scored corpus.
    def seenTot(k: Int): DataFrame =
      if (k == 1) seen(1)
      else seen(k)
        .join(knCtxTable(seen(k), k),
          substring_index(col("g"), " ", k - 1) === col(s"c$k"))
        .select(col("g"), col(s"cnt$k"), col(s"tot$k"))
    val tot1 = seen(1).agg(sum(col("cnt1")).as("tot1"))
    knScoreFromTables(docs, idCol, textCol, n, seenTot, None, tot1,
      sbLevelPSql)
  }

  /** Model-size PROFILE of the order-N KN model — the artifact report a
    * pruning decision reads (rows per level ≈ parquet size per level;
    * the singleton tail this exposes is what [[knNgramScore]]'s `prune`
    * removes): one row per level with its gram count and total mass.
    * Output: (level, n_grams, total_count), level ascending. */
  def knModelProfile(
      train: DataFrame,
      textCol: String,
      order: Int = 5,
      scope: CacheScope = CacheScope.global): DataFrame = {
    val seen = knLevelTables(train, textCol, order, scope)
    (1 to order).map { k =>
      seen(k).agg(
        count(lit(1)).as("n_grams"),
        sum(col(s"cnt$k")).as("total_count"))
        .select(lit(k.toLong).as("level"), col("n_grams"),
          col("total_count"))
    }.reduce(_.unionByName(_))
  }

  /** [[knModelProfile]] read from a PERSISTED [[knNgramFit]] artifact —
    * the serve-side profile: the report a pruning/sizing decision reads
    * is a property of the STORED model, so production computes it from
    * the level tables the fit already wrote (vocabulary-bounded scans),
    * never by re-deriving the tables from the corpus. Output contract
    * identical to [[knModelProfile]] (LlmSpec pins value-parity). */
  def knModelProfileFromDir(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      order: Int = 5): DataFrame = {
    require(order >= 2 && order <= 8, "order must be in [2, 8]")
    (1 to order).map { k =>
      spark.read.parquet(s"$dir/level$k").agg(
        count(lit(1)).as("n_grams"),
        sum(col(s"cnt$k")).as("total_count"))
        .select(lit(k.toLong).as("level"), col("n_grams"),
          col("total_count"))
    }.reduce(_.unionByName(_))
  }

  /** INCREMENTAL maintenance of a persisted UNPRUNED [[knNgramFit]]
    * model — the 100 TB production shape: adding a crawl shard must not
    * refit over yesterday's petabytes. The only corpus pass is over the
    * DELTA shard (its raw order-N gram counts); the stored level-N
    * table merges by count addition (raw window counts are exactly
    * additive across a document-disjoint shard union — grams never
    * cross document boundaries), and every lower adjusted-count level
    * re-derives from the merged level-N table by the same Kneser–Ney
    * rule the full fit uses — a gram-table-sized (Heaps-bounded)
    * aggregation chain, not a corpus pass. Writes the updated model to
    * `dstDir` (versioned-artifact update — never in-place, so a crash
    * mid-write cannot corrupt the serving model and readers of `srcDir`
    * are undisturbed). The result is bit-identical to a full refit on
    * the combined corpus (spec-pinned). NOT valid on a count-pruned
    * model: pruning discards the singleton tail the merge needs. */
  def knNgramFitDelta(
      newDocs: DataFrame,
      textCol: String,
      srcDir: String,
      dstDir: String,
      order: Int = 5): Unit = {
    require(order >= 2 && order <= 8, "order must be in [2, 8]")
    require(srcDir != dstDir,
      "delta fit writes a new model version; srcDir must differ from dstDir")
    graft.GraftExtensions.install(newDocs.sparkSession)
    val spark = newDocs.sparkSession
    readPruneMarker(spark, srcDir) match {
      case Some("none") => // unpruned: the additive level-N merge is sound
      case Some(spec) => throw new IllegalArgumentException(
        s"knNgramFitDelta requires an UNPRUNED source model, but $srcDir " +
          s"was fit with prune=[$spec]: pruning discards the singleton " +
          "tail the additive level-N merge needs. Refit unpruned, or " +
          "apply pruning at score time via knNgramScore(prune=...).")
      case None => throw new IllegalArgumentException(
        s"$srcDir carries no _prune_spec marker (predates it, or is not " +
          "a knNgramFit artifact); refit with knNgramFit to enable delta " +
          "maintenance.")
    }
    val n = order
    val deltaN = knGramsOf(newDocs, textCol, n)
      .groupBy(col("tg").as("g")).agg(count(lit(1)).as(s"cnt$n"))
    val seen = new Array[DataFrame](n + 1)
    seen(n) = spark.read.parquet(s"$srcDir/level$n")
      .unionByName(deltaN)
      .groupBy(col("g")).agg(sum(col(s"cnt$n")).as(s"cnt$n"))
    seen(n).write.mode("overwrite").parquet(s"$dstDir/level$n")
    for (k <- (n - 1) to 1 by -1) {
      // derive from the WRITTEN upper level (read back) so the lineage
      // per level is one scan + one aggregate, not a re-derivation chain
      seen(k) = spark.read.parquet(s"$dstDir/level${k + 1}")
        .groupBy(substring_index(col("g"), " ", -k).as("g"))
        .agg(count(lit(1)).as(s"cnt$k"))
      seen(k).write.mode("overwrite").parquet(s"$dstDir/level$k")
    }
    spark.read.parquet(s"$dstDir/level1")
      .agg(sum(col("cnt1")).as("tot1"))
      .write.mode("overwrite").parquet(s"$dstDir/tot1")
    // ctx tables are deliberately NOT materialized here: the serve path
    // derives them on the fly when absent (value-identical), and
    // measurement showed the 4 extra aggregate+write jobs cost the
    // maintenance op ~1.3 s at sf0.1 — serve-side amortization belongs
    // to the fit/promote step, not the delta critical path.
    // the merged model is itself unpruned — mark it so deltas chain
    writePruneMarker(spark, dstDir, Seq.empty)
  }

  /** The order-N model's level tables: seen(k) = one row per SEEN k-gram
    * with its level-k count — raw at k = N, adjusted (distinct left
    * extensions among level-(k+1) seen grams) below. Index 1..N. */
  private def knLevelTables(
      train: DataFrame,
      textCol: String,
      order: Int,
      scope: CacheScope): Array[DataFrame] = {
    require(order >= 2 && order <= 8, "order must be in [2, 8]")
    graft.GraftExtensions.install(train.sparkSession)
    val n = order
    val seen = new Array[DataFrame](n + 1)
    // Sequential suffix-count chain, deliberately: a fused
    // one-aggregate derivation (explode every N-gram into its 2..N-word
    // suffixes + distinct + grouped count) was built and MEASURED this
    // round — it halves the stage count but shuffles the 4×-exploded
    // suffix set TWICE (distinct, then count) where the chain shuffles
    // each shrinking level once; q_lm_kn5 regressed 4.3 → 5.8 s wall /
    // 28 → 42 s cpu at sf0.1 and the rewrite was reverted per guide
    // §1.1. (The fused CONTEXT aggregate below survived measurement —
    // it shuffles each level exactly once.)
    seen(n) = scope.cache(knGramsOf(train, textCol, n)
      .groupBy(col("tg").as("g")).agg(count(lit(1)).as(s"cnt$n")))
    for (k <- (n - 1) to 1 by -1)
      seen(k) = scope.cache(seen(k + 1)
        .groupBy(substring_index(col("g"), " ", -k).as("g"))
        .agg(count(lit(1)).as(s"cnt$k")))
    seen
  }

  /** Level-k context aggregate (first k−1 words): mass + distinct
    * continuations. */
  private def knCtxTable(seenK: DataFrame, k: Int): DataFrame = seenK
    .groupBy(substring_index(col("g"), " ", k - 1).as(s"c$k"))
    .agg(sum(col(s"cnt$k")).as(s"tot$k"), count(lit(1)).as(s"nfw$k"))

  /** ALL levels' context aggregates (k = 2..N) in ONE fused aggregate —
    * [[knCtxTable]] per level was N−1 separate shuffles re-run inside
    * every serve. A context key's word count is k−1, so levels cannot
    * collide and one groupBy over the tagged level union computes every
    * table; [[knCtxOfAll]] filters the cached result per level. Runs on
    * the (possibly pruned) seen tables, exactly like the per-level
    * formulation. */
  private def knGramsOf(
      df: DataFrame, textCol: String, n: Int, cols: Column*): DataFrame = df
    .withColumn("__toks__", TextOps.letterWords(textCol))
    .where(size(col("__toks__")) >= n &&
      element_at(col("__toks__"), 1) =!= "")
    .select(cols :+ explode(TextOps.wordShingles("__toks__", n)).as("tg"): _*)

  /** PERSIST the order-N KN model — the train-once / score-many shape a
    * production LM filter runs (KenLM serializes its model the same
    * way, as a probing table per level): the N seen-gram level tables
    * and the 1-row total written as plain parquet under `dir`
    * (`level<k>/`, `tot1/`). Every table is vocabulary-bounded
    * (Heaps-law gram counts), so the artifact is small relative to the
    * corpus and re-reading it is a scan, not a recount. */
  def knNgramFit(
      train: DataFrame,
      textCol: String,
      dir: String,
      order: Int = 5,
      scope: CacheScope = CacheScope.global,
      prune: Seq[Long] = Seq.empty): Unit = {
    val seen = knPruned(knLevelTables(train, textCol, order, scope), prune)
    for (k <- 1 to order)
      seen(k).write.mode("overwrite").parquet(s"$dir/level$k")
    seen(1).agg(sum(col("cnt1")).as("tot1"))
      .write.mode("overwrite").parquet(s"$dir/tot1")
    // persist the context aggregates (post-prune, exactly what scoring
    // probes) so serves are pure scans — the KenLM stored-backoff shape
    for (k <- 2 to order)
      knCtxTable(seen(k), k).write.mode("overwrite").parquet(s"$dir/ctx$k")
    writePruneMarker(train.sparkSession, dir, prune)
  }

  /** Prune-spec marker written next to the level tables: delta
    * maintenance ([[knNgramFitDelta]]) is only sound on UNPRUNED models
    * (pruning drops the singleton tail the additive level-N merge
    * needs), so the artifact records how it was fit and the delta op
    * refuses anything else — misuse fails loudly instead of silently
    * producing a corrupted merged model. Hadoop FS API so the marker
    * travels with the artifact on any storage the model lives on. */
  private def writePruneMarker(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      prune: Seq[Long]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_prune_spec")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((if (prune.forall(_ <= 0)) "none"
                   else prune.mkString(",")).getBytes("UTF-8"))
    finally out.close()
  }

  private def readPruneMarker(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_prune_spec")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Score through a PERSISTED [[knNgramFit]] model — no retraining,
    * no corpus pass over the trusted slice: the level tables read back
    * as-is and the identical scoring join + generated formula chain
    * runs (LlmSpec pins value-identity with [[knNgramScore]]). */
  def knNgramScoreWithModel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      order: Int = 5): DataFrame = {
    require(order >= 2 && order <= 8, "order must be in [2, 8]")
    graft.GraftExtensions.install(docs.sparkSession)
    val spark = docs.sparkSession
    def seen(k: Int): DataFrame = spark.read.parquet(s"$dir/level$k")
    // the fit persists the context aggregates next to the level tables
    // (KenLM stores its backoff tables the same way) so every serve is
    // pure scans — re-aggregating them per serve was N−1 shuffles per
    // score run. Older artifacts without ctx dirs derive on the fly.
    val ctxPersisted = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/ctx2")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    def ctx(k: Int): DataFrame =
      if (ctxPersisted) spark.read.parquet(s"$dir/ctx$k")
      else knCtxTable(seen(k), k)
    // re-aggregate the 1-row artifact so the cross join's build side is
    // PROVABLY single-row in the plan (a bare file scan is not — the
    // whole-suite BNLJ lint rejects it), at the cost of nothing: the
    // file holds exactly one row, max = the value
    val tot1 = spark.read.parquet(s"$dir/tot1")
      .agg(max(col("tot1")).as("tot1"))
    knScoreFromTables(docs, idCol, textCol, order, seen, Some(ctx), tot1)
  }

  /** The shared scoring half: explode doc N-grams, LEFT-join the level
    * and context tables, fold the generated per-level probability
    * chain.
    *
    * `ctx = None` means the level tables already CARRY their context
    * aggregates (the Stupid-Backoff merge: its formula reads tot_k only
    * when cnt_k hit, so seen⋈ctx pre-merges at the vocabulary-bounded
    * model layer and scoring probes N tables instead of 2N−1 — half the
    * broadcast builds shipped to every executor. KN cannot merge: its
    * backoff branch reads tot_k/nfw_k on gram-MISS rows).
    *
    * DISTINCT-GRAM gate (guide §2.3 "aggregate before you shuffle", the
    * 100 TB variant recorded in round 17): when the level-N model table
    * is estimated to EXCEED the session's broadcast threshold, the model
    * joins will shuffle the doc-gram frame 2N−1 times — so instead each
    * distinct gram text scores ONCE through the chain and per-doc
    * occurrence counts re-attach after (integer micro-bits make
    * Σ_occ mb ≡ Σ_distinct occ·mb bit-identical). Below the threshold
    * the chain is all broadcast probes and the two occurrence-scale
    * shuffles the rewrite adds are a measured local REGRESSION (r17) —
    * so the gate follows the join strategy the planner will pick.
    * `spark.graft.lm.scoreDistinctGrams` ∈ {auto, always, never}
    * overrides (the value-parity spec pins `always` ≡ `never`). */
  private def knScoreFromTables(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      seen: Int => DataFrame,
      ctx: Option[Int => DataFrame],
      tot1: DataFrame,
      pSql: Int => String = knLevelPSql): DataFrame = {
    // attach the model to a frame carrying gram texts in `tg` and fold
    // the probability chain into integer micro-bits (`__mb__`)
    def attachModel(grams: DataFrame): DataFrame = {
      var scored = grams
      for (k <- n to 1 by -1) {
        val gk = if (k == n) col("tg") else substring_index(col("tg"), " ", -k)
        scored = scored
          .join(seen(k).withColumnRenamed("g", s"__g$k"),
            gk === col(s"__g$k"), "left")
          .drop(s"__g$k")
        ctx match {
          case Some(c) if k >= 2 =>
            scored = scored
              .join(c(k), substring_index(gk, " ", k - 1) === col(s"c$k"),
                "left")
              .drop(s"c$k")
          case _ =>
        }
      }
      scored = scored.crossJoin(broadcast(tot1)) // 1-row model attach
      for (k <- 1 to n)
        scored = scored.withColumn(s"p$k", expr(pSql(k)))
      scored
        .withColumn("p", col(s"p$n"))
        .withColumn("__mb__", expr(KnTermSql))
    }
    val spark = docs.sparkSession
    val mode = spark.conf.get("spark.graft.lm.scoreDistinctGrams", "auto")
    val distinctGrams = mode match {
      case "always" => true
      case "never"  => false
      case _ =>
        val thresh =
          try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
          catch { case _: Throwable => 10L << 20 }
        // threshold < 0 disables auto-broadcast: the model joins shuffle
        // either way, so the distinct-gram probe-side cut always pays
        thresh < 0 ||
          seen(n).queryExecution.optimizedPlan.stats.sizeInBytes
            .toDouble > thresh.toDouble
    }
    val agg0 =
      if (!distinctGrams)
        attachModel(knGramsOf(docs, textCol, n, col(idCol)))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_ngrams"), sum(col("__mb__")).as("__s__"))
      else {
        val perDoc = knGramsOf(docs, textCol, n, col(idCol))
          .groupBy(col(idCol), col("tg")).agg(count(lit(1)).as("__occ__"))
        val gramBits = attachModel(perDoc.select(col("tg")).distinct())
          .select(col("tg").as("__tg__"), col("__mb__"))
        perDoc.join(gramBits, col("tg") === col("__tg__"))
          .groupBy(col(idCol))
          .agg(sum(col("__occ__")).as("n_ngrams"),
            sum(col("__occ__") * col("__mb__")).as("__s__"))
      }
    val agg = agg0
      .select(col(idCol), col("n_ngrams"),
        round(col("__s__").cast("double") / col("n_ngrams").cast("double")
          / lit(1000000.0), 6).as("bits_per_ngram"))
    docs.select(col(idCol)).distinct()
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("bits_per_ngram"), lit(0.0)).as("bits_per_ngram"))
  }

  /** Interpreted HOF formulation of [[bitsPerChar]] over an inline
    * map<bigram,double> literal — the cross-engine semantic definition
    * the LangModelSpec pins the native against (the same native≡HOF
    * anchor pattern as TextOps.charEntropyHof), not the production path.
    * `textCol` is a column NAME (expr-string formulation, as the HOF
    * lambdas and the 729-entry map literal only compose in SQL text). */
  private[graft] def bitsPerCharHof(textCol: String, model: Array[Double]): Column = {
    val mapLit = model.zipWithIndex
      .map { case (v, slot) => s"'${BigramLm.bigramOf(slot)}', ${"%.6f".format(v)}D" }
      .mkString("map(", ", ", ")")
    val t = normSql(textCol)
    val grams = s"transform(sequence(1, length($t) - 1), i -> substring($t, i, 2))"
    expr(s"""CASE WHEN $textCol IS NULL THEN CAST(NULL AS DOUBLE)
        WHEN length($t) < 2 THEN 0.0D ELSE
        round(-(aggregate(array_sort(array_distinct($grams)), 0D,
          (acc, b) -> acc + CAST(size(filter($grams, x -> x = b)) AS DOUBLE)
                            * element_at($mapLit, b)))
          / CAST(length($t) - 1 AS DOUBLE) + 0D, 6) END""")
  }
}
