package graft

import graft.llm.Dedup

/** Exact Jaccard-threshold join (prefix filtering): value parity with a
  * literal all-pairs brute force — the completeness claim IS the test. */
class JaccardJoinSpec extends GraftSuite {

  private val Shingle = 3

  /** Literal definition: distinct word-trigram sets, Jaccard, 6dp
    * HALF_UP round (Spark `round` semantics), pairs with id< ordering. */
  private def brute(docs: Seq[(Long, String)], threshold: Double)
      : Set[(Long, Long, Double)] = {
    def gramSet(t: String): Set[String] = {
      val w = t.trim.split("\\s+")
      if (w.length < Shingle) Set.empty
      else w.sliding(Shingle).map(_.mkString(" ")).toSet
    }
    val gs = docs.map { case (id, t) => (id, gramSet(t)) }
      .filter(_._2.nonEmpty)
    for {
      (a, ga) <- gs.toSet[(Long, Set[String])]
      (b, gb) <- gs if a < b
      j = {
        val inter = ga.intersect(gb).size
        val union = ga.size + gb.size - inter
        BigDecimal(inter.toDouble / union)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      if j >= threshold
    } yield (a, b, j)
  }

  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(23)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    def sent(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = (0 until 30).map(i => (i.toLong, sent(12 + rnd.nextInt(20))))
    // planted near-dups: identical, one-word edit, truncated, shuffled-ish
    val dups = bases.take(12).flatMap { case (id, t) =>
      val w = t.split(" ")
      Seq(
        (100L + id, t),
        (200L + id, (w.updated(w.length / 2, "omega")).mkString(" ")),
        (300L + id, w.dropRight(2).mkString(" ")))
    }
    bases ++ dups ++ Seq((900L, "tiny doc"), (901L, ""))
  }

  test("parity with the all-pairs definition across thresholds") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    for (tau <- Seq(0.5, 0.8, 1.0)) {
      val got = Dedup.jaccardJoinExact(df, "doc_id", "text", Shingle, tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = brute(corpus, tau)
      assert(got === want, s"tau=$tau: got ${got.size}, want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      if (tau == 0.8) assert(want.size >= 12) // the plant actually bites
    }
  }

  test("containment join: parity with the all-pairs definition") {
    val s = spark
    import s.implicits._
    def gramSet(t: String): Set[String] = {
      val w = t.trim.split("\\s+")
      if (w.length < Shingle) Set.empty
      else w.sliding(Shingle).map(_.mkString(" ")).toSet
    }
    // planted truncations: short docs fully inside long ones — Jaccard
    // would score these ~len_short/len_long, containment ≈ 1
    val docs = corpus ++ corpus.take(10).map { case (id, t) =>
      (500L + id, t.split(" ").take(8).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (tau <- Seq(0.7, 0.9)) {
      val got = Dedup.containmentJoinExact(df, "doc_id", "text", Shingle, tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val gs = docs.map { case (id, t) => (id, gramSet(t)) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (a, ga) <- gs; (b, gb) <- gs if a != b
        c = BigDecimal(ga.intersect(gb).size.toDouble / ga.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= tau
      } yield (a, b, c)).toSet
      assert(got === want, s"tau=$tau: got ${got.size}, want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      if (tau == 0.9) {
        assert(want.nonEmpty)
        // the Jaccard-blind case is really present: some containment pair
        // is NOT a Jaccard-0.9 pair
        val jac = brute(docs, 0.9).map(p => (p._1, p._2)).toSet
        assert(want.exists(p => !jac.contains((p._1 min p._2, p._1 max p._2))))
      }
    }
  }

  test("token order does not matter: equal gram sets are found at tau=1") {
    val s = spark
    import s.implicits._
    // same trigram set via a rotation that preserves wrap-free trigrams?
    // simplest guaranteed case: exact duplicates with differing leading /
    // trailing whitespace (tokens() trims)
    val docs = Seq((1L, "a b c d e f g"), (2L, "  a b c d e f g  "),
      (3L, "a b c d e f h")).toDF("doc_id", "text")
    val got = Dedup.jaccardJoinExact(docs, "doc_id", "text", Shingle, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }
}
