package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style linear text classifier (Joulin et al. 2016): logistic
  * regression over bag-of-words indicator features, trained by full-batch
  * gradient descent. The pipeline shape is the production one — a cheap
  * linear scorer distilling or routing on top of token presence — while
  * every training step is deterministic and DuckDB-replayable:
  *
  *   - features are word-presence INDICATORS (0/1 integers), so the
  *     logit `w·x` is exact IEEE arithmetic over 6-dp weights folded in
  *     fixed feature order on both engines;
  *   - the sigmoid is rounded to 6 dp (absorbs the ≤1-ulp cross-engine
  *     `exp` divergence — the pow/log2 discipline);
  *   - the gradient accumulates as exact INTEGER micro-units
  *     (`floor((σ−y)·x·1e6 + 0.5)` per doc, summed as BIGINT) — the
  *     integer-cents trick, so the sum is order-independent and shuffles
  *     can't perturb it;
  *   - weights re-round to 6 dp after each step (BigDecimal HALF_UP =
  *     DuckDB `round`).
  *
  * Scale anatomy: each iteration is ONE map-side-combined aggregate over
  * the cached feature frame (indicator projection — no shuffle beyond the
  * 1-row gradient reduce) + an O(features) driver update (model
  * parameters, the k-means-centroid-pin defense). Serving would freeze
  * the weights into a per-row predicate exactly like the LM model
  * literal. */
object Classifier {

  /** Train `iters` full-batch GD steps (η = 1) of
    * P(label-word present | other-word indicators) and return the learned
    * weights, one row per (`feature`, `weight`) with `bias` first. */
  def fitLogistic(
      docs: DataFrame,
      textCol: String,
      labelWord: String,
      featureWords: Seq[String],
      iters: Int,
      scope: CacheScope = CacheScope.global): DataFrame = {
    val spark = docs.sparkSession
    val w = fitWeights(docs, textCol, labelWord, featureWords, iters, scope)
    import spark.implicits._
    (("bias", w(0)) +: featureWords.zipWithIndex.map { case (word, j) =>
      (word, w(j + 1))
    }).toDF("feature", "weight")
  }

  /** SERVING: per-row predicted probability under trained `weights`
    * (bias-first, as [[fitWeights]] returns them) — the weights freeze
    * into the plan as literals folded in the same fixed feature order,
    * so scoring is a pure projection that rides the scan with zero
    * joins (the LM-model-literal pattern). */
  def scoreLogistic(
      textCol: Column,
      featureWords: Seq[String],
      weights: Array[Double]): Column = {
    require(weights.length == featureWords.length + 1)
    val toks = TextOps.tokens(textCol)
    val z = featureWords.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (word, j)) =>
        acc + lit(weights(j + 1)) * array_contains(toks, word).cast("int")
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** The training loop behind [[fitLogistic]]; returns bias-first raw
    * weights for [[scoreLogistic]] to serve. */
  def fitWeights(
      docs: DataFrame,
      textCol: String,
      labelWord: String,
      featureWords: Seq[String],
      iters: Int,
      scope: CacheScope = CacheScope.global): Array[Double] = {
    require(featureWords.nonEmpty && !featureWords.contains(labelWord))
    val toks = TextOps.tokens(col(textCol))
    val featCols = featureWords.zipWithIndex.map { case (w, j) =>
      array_contains(toks, w).cast("int").as(s"__x$j")
    }
    val feats = scope.cache(docs.select(
      array_contains(toks, labelWord).cast("int").as("__y") +: featCols: _*))

    val nFeat = featureWords.length
    val w = new Array[Double](nFeat + 1) // w(0) = bias, features follow
    def round6(v: Double): Double =
      java.math.BigDecimal.valueOf(v + 0.0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    for (_ <- 1 to iters) {
      // logit folded in fixed feature order (bias + x0·w1 + x1·w2 + …)
      val z = (0 until nFeat).foldLeft(lit(w(0)): Column) { (acc, j) =>
        acc + lit(w(j + 1)) * col(s"__x$j")
      }
      val sig = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
      val err = sig - col("__y")
      val gradCols = sum(expr_floorMicro(err)).as("__g_bias") +:
        (0 until nFeat).map(j =>
          sum(expr_floorMicro(err * col(s"__x$j"))).as(s"__g$j"))
      val row = feats.agg(count(lit(1)).as("__n"), gradCols: _*).collect()(0)
      val n = row.getLong(0)
      // degenerate input fails loudly, not with an opaque NPE / div-by-0:
      // an empty frame makes n = 0, and all-NULL features make the
      // gradient sums NULL (sum over zero non-null rows)
      require(n > 0, "fitLogistic: empty training frame (no rows to fit)")
      def grad(i: Int): Double =
        if (row.isNullAt(i)) 0.0 else row.getLong(i).toDouble / 1e6
      w(0) = round6(w(0) - grad(1) / n)
      for (j <- 0 until nFeat)
        w(j + 1) = round6(w(j + 1) - grad(2 + j) / n)
    }
    w
  }

  /** Exact integer micro-gradient: floor(v·1e6 + 0.5) as BIGINT. */
  private def expr_floorMicro(v: Column): Column =
    floor(v * lit(1000000.0) + lit(0.5)).cast("long")

  /** Exact ROC AUC of a score column against a boolean label — the
    * Mann–Whitney statistic with standard tie handling
    * (P[s⁺ > s⁻] + ½·P[s⁺ = s⁻]), the calibration metric every
    * quality-classifier gate is tuned by. One row:
    * (auc, n_pos, n_neg); NULL auc when a class is absent.
    *
    * Scale anatomy: the corpus reduces by ONE map-side-combined
    * aggregate to per-DISTINCT-SCORE (n_pos, n_neg) counts — the score
    * is 6-dp-rounded INSIDE the operator (a no-op for the already-
    * rounded scores our classifiers emit, a tie-coarsening on raw
    * doubles), so the distinct-score frame is bounded-domain by
    * construction (≤ 10⁶ rows per unit of score range, the
    * q_lm_ppl_buckets defense) and the running-negatives window runs
    * over IT, never a corpus-wide row_number/sort — even when a caller
    * hands in raw unrounded scores. The AUC numerator is an exact
    * INTEGER (2·Σ n_pos·cum_neg + Σ n_pos·n_neg — order-free under any
    * shuffle); the single division rounds to 6 dp. */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = scored
      // + 0.0 canonicalizes -0.0 so a raw -0.0 and 0.0 score collapse
      .groupBy(round(col(scoreCol).cast("double") + lit(0.0), 6).as("__s__"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__p__"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__n__"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s__"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("__cumneg__", coalesce(sum(col("__n__")).over(w), lit(0L)))
      .agg(
        sum(col("__p__") * col("__cumneg__") * 2 + col("__p__") * col("__n__"))
          .as("__num__"),
        sum(col("__p__")).as("n_pos"),
        sum(col("__n__")).as("n_neg"))
      .select(
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(round(col("__num__").cast("double")
            / (col("n_pos") * col("n_neg") * lit(2L)), 6)).as("auc"),
        col("n_pos"), col("n_neg"))
  }
}
