package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed n-gram importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): score every raw-corpus document by how
  * much more likely its hashed word-gram bag is under a TARGET
  * distribution (a trusted slice — here a language/domain predicate)
  * than under the RAW crawl distribution, then keep the highest-weight
  * documents. This is the published, principled generalization of
  * fastText-classifier filtering (GPT-3/PaLM style): the "model" is two
  * unigram distributions over hash buckets — closed-form, training-free,
  * and cheap enough to refit per snapshot.
  *
  * Feature space (paper §3): word unigrams AND bigrams, hashed into
  * `dims` buckets — the same md5-mod trick as `Search.hashedTfVectors`,
  * gram hashing via the codegen'd `word_kgram_md5s` native.
  *
  * Scale anatomy (the 100 TB story):
  *   - FIT is one corpus-linear explode + map-side-combined count
  *     aggregate per corpus, shuffling ≤`dims` rows each; the model
  *     collect is ≤2·dims rows of model parameters (the k-means-centroid
  *     defense). The target slice is typically tiny; the raw pass is one
  *     scan it shares with any other per-doc statistic.
  *   - SERVING is a pure per-row projection: the `dims`-entry log-ratio
  *     table freezes into the plan as an array literal (the `lm_bits`
  *     model-literal pattern) — zero joins, zero shuffles, composes with
  *     any downstream filter. Per-gram md5s come from the codegen'd
  *     native; only the bucket-probe fold is a lambda.
  *   - SELECTION is sort+limit — Spark plans TakeOrdered (per-partition
  *     top-k, never a global sort shuffle); the rank window runs on the
  *     k-row result, bounded by the parameter.
  *
  * Determinism contract (shared with the DuckDB oracle): tokens =
  * `split(trim(text), '\s+')`; bucket = first-8-hex-digits of md5 mod
  * dims; each bucket's log2-probability (add-α, α = 0.5) rounds 6-dp
  * (absorbing the ≤1-ulp cross-engine log divergence) and converts to
  * exact integer MICRO-BITS via floor(x·10⁶ + 0.5); a document's weight
  * is the INTEGER sum of its grams' micro-bit ratios — order-independent
  * under any shuffle, so the weights and the kept set replay
  * bit-for-bit. (The paper resamples with Gumbel noise; the engine ranks
  * deterministically by weight — same ordering statistic, reproducible
  * corpus.)
  */
object Dsir {

  /** α of the add-α smoothing over hash buckets; α·dims appears in the
    * oracle SQL (128.0 at the default dims = 256). */
  val Alpha = 0.5

  /** md5 hexes of the document's word unigrams ++ bigrams (the DSIR
    * feature space), via the codegen'd positional-gram native. */
  private def gramMd5s(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    concat(call_function("word_kgram_md5s", toks, lit(1)),
      call_function("word_kgram_md5s", toks, lit(2)))
  }

  /** Gram count of a document (unigrams + bigrams), for budgeting. */
  def nGrams(text: Column): Column = size(gramMd5s(text))

  /** The document's hashed gram BUCKETS (array<bigint>) — the shared
    * feature projection: computing this ONCE and caching it serves the
    * fit's count pass AND the serving fold, so the md5 work (the
    * dominant cost) is paid once however many passes consume it. */
  def gramBuckets(text: Column, dims: Int): Column =
    transform(gramMd5s(text), m => bucketOf(m, dims))

  private def bucketOf(md5Hex: Column, dims: Int): Column =
    conv(substring(md5Hex, 1, 8), 16, 10).cast("bigint") % dims

  /** One corpus's per-bucket gram-occurrence counts from a precomputed
    * buckets column: explode + one map-side-combined count aggregate +
    * a ≤dims-row collect. */
  private def bucketCountsOf(docs: DataFrame, bucketsCol: String,
      dims: Int): Array[Long] = {
    val rows = docs
      .select(explode(col(bucketsCol)).as("__b__"))
      .groupBy(col("__b__")).agg(count(lit(1)).as("__n__"))
      .collect()
    val arr = new Array[Long](dims)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  private def bucketCounts(docs: DataFrame, textCol: String,
      dims: Int): Array[Long] =
    bucketCountsOf(docs
      .where(col(textCol).isNotNull)
      .select(gramBuckets(col(textCol), dims).as("__b__")), "__b__", dims)

  /** Fit the per-bucket importance table: micro-bits of
    * log2 p_target(b) − log2 p_raw(b) under add-α smoothing, each side
    * 6-dp-rounded then scaled to an EXACT integer — the whole
    * cross-engine float discipline lives here, so everything downstream
    * is integer arithmetic. Returns a dims-sized array (the model). */
  def fitLlrMicro(target: DataFrame, raw: DataFrame, textCol: String,
      dims: Int = 256): Array[Long] = {
    require(dims > 0, "dims must be positive")
    graft.GraftExtensions.install(target.sparkSession)
    llrFromCounts(bucketCounts(target, textCol, dims),
      bucketCounts(raw, textCol, dims), dims)
  }

  private def llrFromCounts(tc: Array[Long], rc: Array[Long],
      dims: Int): Array[Long] = {
    val tTot = tc.sum
    val rTot = rc.sum
    def microBits(n: Long, tot: Long): Long = {
      val p = (n + Alpha) / (tot + Alpha * dims)
      // Spark's Log2 evaluates via StrictMath.log (LangModel precedent);
      // 6-dp HALF_UP round = the oracle's round(log2(x), 6)
      val t = java.lang.StrictMath.log(p) / java.lang.StrictMath.log(2.0)
      val r6 = java.math.BigDecimal.valueOf(t + 0.0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      math.floor(r6 * 1e6 + 0.5).toLong
    }
    Array.tabulate(dims)(b => microBits(tc(b), tTot) - microBits(rc(b), rTot))
  }

  /** Per-row integer importance weight: Σ over the document's grams of
    * their bucket's micro-bit log ratio, probing the model frozen into
    * the plan as an array literal — zero joins at serve time. */
  def weightMicro(text: Column, llrMicro: Array[Long]): Column =
    weightMicroOf(gramBuckets(text, llrMicro.length), llrMicro)

  /** [[weightMicro]] over a precomputed buckets column (the cached
    * feature-sharing path — no per-pass re-hashing). */
  def weightMicroOf(buckets: Column, llrMicro: Array[Long]): Column = {
    val llrLit = array(llrMicro.map(lit(_)): _*)
    aggregate(buckets, lit(0L),
      (acc, b) => acc + element_at(llrLit, (b + 1).cast("int")))
  }

  /** [[fitLlrMicro]] over precomputed bucket frames (feature-sharing
    * path): `target` and `raw` each expose `bucketsCol`. */
  def fitLlrMicroOf(target: DataFrame, raw: DataFrame, bucketsCol: String,
      dims: Int): Array[Long] = {
    val tc = bucketCountsOf(target, bucketsCol, dims)
    val rc = bucketCountsOf(raw, bucketsCol, dims)
    llrFromCounts(tc, rc, dims)
  }

  /** Keep the `k` highest-importance documents, deterministically ranked
    * by (weight desc, id): sort+limit (TakeOrdered — no global sort
    * shuffle), then a rank window over only the k-row result. */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
      llrMicro: Array[Long], k: Int): DataFrame =
    rankCut(docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        weightMicro(col(textCol), llrMicro).as("weight_micro")), idCol, k)

  /** [[selectTopK]] over a precomputed buckets column. */
  def selectTopKOf(docs: DataFrame, idCol: String, bucketsCol: String,
      llrMicro: Array[Long], k: Int): DataFrame =
    rankCut(docs.select(col(idCol),
      weightMicroOf(col(bucketsCol), llrMicro).as("weight_micro")), idCol, k)

  private def rankCut(weighted: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    weighted
      .sort(col("weight_micro").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("weight_micro").desc, col(idCol))).cast("long"))
  }
}
