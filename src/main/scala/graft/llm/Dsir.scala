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

  private def bucketOf(md5Hex: Column, dims: Int): Column =
    conv(substring(md5Hex, 1, 8), 16, 10).cast("bigint") % dims

  /** One corpus's per-bucket gram-occurrence counts: explode + one
    * map-side-combined count aggregate + a ≤dims-row collect. */
  private def bucketCounts(docs: DataFrame, textCol: String,
      dims: Int): Array[Long] = {
    val rows = docs
      .where(col(textCol).isNotNull)
      .select(explode(gramMd5s(col(textCol))).as("__m__"))
      .select(bucketOf(col("__m__"), dims).as("__b__"))
      .groupBy(col("__b__")).agg(count(lit(1)).as("__n__"))
      .collect()
    val arr = new Array[Long](dims)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Fit the per-bucket importance table: micro-bits of
    * log2 p_target(b) − log2 p_raw(b) under add-α smoothing, each side
    * 6-dp-rounded then scaled to an EXACT integer — the whole
    * cross-engine float discipline lives here, so everything downstream
    * is integer arithmetic. Returns a dims-sized array (the model). */
  def fitLlrMicro(target: DataFrame, raw: DataFrame, textCol: String,
      dims: Int = 256): Array[Long] = {
    require(dims > 0, "dims must be positive")
    graft.GraftExtensions.install(target.sparkSession)
    val tc = bucketCounts(target, textCol, dims)
    val rc = bucketCounts(raw, textCol, dims)
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
  def weightMicro(text: Column, llrMicro: Array[Long]): Column = {
    val dims = llrMicro.length
    val llrLit = array(llrMicro.map(lit(_)): _*)
    val buckets = transform(gramMd5s(text), m => bucketOf(m, dims))
    aggregate(buckets, lit(0L),
      (acc, b) => acc + element_at(llrLit, (b + 1).cast("int")))
  }

  /** Keep the `k` highest-importance documents, deterministically ranked
    * by (weight desc, id): sort+limit (TakeOrdered — no global sort
    * shuffle), then a rank window over only the k-row result. */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
      llrMicro: Array[Long], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val top = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), weightMicro(col(textCol), llrMicro).as("weight_micro"))
      .sort(col("weight_micro").desc, col(idCol))
      .limit(k)
    top.withColumn("rank",
      row_number().over(
        Window.orderBy(col("weight_micro").desc, col(idCol))).cast("long"))
  }
}
