package graft

import org.apache.spark.sql.functions.{col => sc}

import graft.expr.BigramLm
import graft.llm.LangModel

/** CCNet-style char-bigram perplexity filter: model math against an
  * independent re-derivation, native ≡ HOF value identity (the anchor
  * that keeps the DuckDB oracle valid), and the edge/NULL contract. */
class LangModelSpec extends GraftSuite {

  private def trainDf = {
    val s = spark
    import s.implicits._
    Seq("ab ab", "the cat sat", "the bat").toDF("text")
  }

  /** Independent re-derivation of the model definition (no BigramLm
    * calls): count bigrams of the normalized training text, add-0.5
    * smooth against the first-char marginal, round log2 to 6 dp. */
  private def expectedTerm(bigram: String): Double = {
    val text = Seq("ab ab", "the cat sat", "the bat")
    val grams = text.flatMap(t => t.sliding(2))
    val n = grams.count(_ == bigram)
    val m = grams.count(_.startsWith(bigram.take(1)))
    val t = StrictMath.log((n + 0.5) / (m + 13.5)) / StrictMath.log(2.0)
    java.math.BigDecimal.valueOf(t + 0.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("fitBigramLm matches the closed-form definition, dense fallbacks included") {
    val model = LangModel.fitBigramLm(trainDf, "text")
    assert(model.length === BigramLm.Slots)
    // seen bigrams
    for (b <- Seq("ab", "b ", " a", "th", "at"))
      assert(model(BigramLm.slotOf(b)) === expectedTerm(b), s"bigram '$b'")
    // unseen bigram with a seen first char falls back to alpha/(m + 13.5)
    assert(model(BigramLm.slotOf("az")) === expectedTerm("az"))
    // fully unseen first char degenerates to log2(1/27)
    val unseen = java.math.BigDecimal
      .valueOf(StrictMath.log(0.5 / 13.5) / StrictMath.log(2.0))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(model(BigramLm.slotOf("qq")) === unseen)
    // a seen bigram is always more probable than its unseen sibling
    assert(model(BigramLm.slotOf("th")) > model(BigramLm.slotOf("tz")))
  }

  test("bitsPerChar scoring: manual fold, edges, and NULL contract") {
    val s = spark
    import s.implicits._
    val model = LangModel.fitBigramLm(trainDf, "text")
    val rows = Seq(
      (0L, "ab"), // single bigram: bits = -term(ab)
      (1L, ""), // no bigram → 0.0
      (2L, "x"), // one char → 0.0
      (3L, "123 456"), // normalizes to empty → 0.0
      (4L, null.asInstanceOf[String]), // NULL → NULL
      (5L, "AB!ab"), // normalizes to "ab ab"
    ).toDF("doc_id", "text")
    val out = rows
      .select(sc("doc_id"), LangModel.bitsPerChar(sc("text"), model).as("bits"))
      .orderBy(sc("doc_id")).collect()
    def bits(i: Int): Any = out(i).get(1)
    val tAb = model(BigramLm.slotOf("ab"))
    assert(bits(0) === java.math.BigDecimal.valueOf(-tAb + 0.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    assert(bits(1) === 0.0)
    assert(bits(2) === 0.0)
    assert(bits(3) === 0.0)
    assert(out(4).isNullAt(1))
    // "ab ab": counts ab=2, 'b '=1, ' a'=1 folded in slot order over 4 bigrams
    val manual = {
      val terms = Seq(" a" -> 1, "ab" -> 2, "b " -> 1) // ascending bigram order
      val acc = terms.foldLeft(0.0) { case (a, (b, n)) =>
        a + n * model(BigramLm.slotOf(b))
      }
      java.math.BigDecimal.valueOf(-acc / 4 + 0.0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(bits(5) === manual)
  }

  test("native lm_bits is value-identical to the oracle HOF formulation") {
    val s = spark
    import s.implicits._
    val corpus = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = LangModel.fitBigramLm(corpus.where(sc("doc_id") % 10 < 8), "text")
    val edges = Seq("zzzzzz", "a b a b ", "héllo wörld", "0123456789",
      "x", "  ", "the the the", "qzx wvk jjj").toDF("text")
    for (df <- Seq(corpus.select(sc("text")), edges)) {
      val mismatches = df
        .select(LangModel.bitsPerChar(sc("text"), model).as("nat"),
          LangModel.bitsPerCharHof("text", model).as("hof"))
        .where(sc("nat") =!= sc("hof"))
        .count()
      assert(mismatches === 0L)
    }
  }

  test("fitLogistic matches an independent plain-Scala GD re-derivation") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "spark sql query fast", // y=1, sql+query
      "spark sql join",       // y=1, sql+join
      "spark hash agg",       // y=1, hash
      "table vector stream",  // y=0
      "sql table batch",      // y=0, sql+table
      "vector stream column") // y=0
    val words = Seq("sql", "query", "join", "hash", "table", "vector", "stream")
    val out = graft.llm.Classifier
      .fitLogistic(texts.toDF("text"), "text", "spark", words, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // independent re-derivation: no Spark, same math definition
    def round6(v: Double) = java.math.BigDecimal.valueOf(v + 0.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val docs = texts.map(_.split(" ").toSet)
    val y = docs.map(d => if (d("spark")) 1 else 0)
    val x = docs.map(d => words.map(w => if (d(w)) 1 else 0))
    val w = Array.fill(words.length + 1)(0.0)
    for (_ <- 1 to 3) {
      val micro = Array.fill(words.length + 1)(0L)
      for (i <- docs.indices) {
        val z = x(i).zipWithIndex.foldLeft(w(0)) { case (a, (xi, j)) =>
          a + w(j + 1) * xi
        }
        val sig = round6(1.0 / (1.0 + StrictMath.exp(-z)))
        val err = sig - y(i)
        micro(0) += math.floor(err * 1000000.0 + 0.5).toLong
        for (j <- words.indices)
          micro(j + 1) += math.floor(err * x(i)(j) * 1000000.0 + 0.5).toLong
      }
      for (j <- w.indices)
        w(j) = round6(w(j) - (micro(j).toDouble / 1e6) / docs.length)
    }
    assert(out("bias") === w(0))
    for ((word, j) <- words.zipWithIndex)
      assert(out(word) === w(j + 1), s"weight for '$word'")
    // co-occurring feature learned a larger weight than the anti-feature
    assert(out("sql") > out("vector"))
  }

  test("fitWeights fails loudly on degenerate input") {
    val s = spark
    import s.implicits._
    // empty frame: clear require message, not a div-by-zero / NPE
    val ex = intercept[IllegalArgumentException] {
      graft.llm.Classifier.fitWeights(
        Seq.empty[String].toDF("text"), "text", "spark", Seq("sql"), iters = 1)
    }
    assert(ex.getMessage.contains("empty training frame"))
    // all-NULL text: NULL gradient sums read as 0, weights stay finite
    val w = graft.llm.Classifier.fitWeights(
      Seq[String](null, null).toDF("text"), "text", "spark", Seq("sql"),
      iters = 2)
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("in-distribution text scores fewer bits than gibberish") {
    val s = spark
    import s.implicits._
    val corpus = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = LangModel.fitBigramLm(corpus, "text")
    val out = Seq(
      (0L, "spark query engine filter join table"),
      (1L, "zqx jwv kqz xqj wzq vkx"),
    ).toDF("doc_id", "text")
      .select(sc("doc_id"), LangModel.bitsPerChar(sc("text"), model).as("bits"))
      .orderBy(sc("doc_id")).collect().map(_.getDouble(1))
    assert(out(0) < out(1))
    assert(out(0) > 0.0)
  }
}
