package graft

import org.apache.spark.sql.functions.{col => sc}

import graft.funcs._
import graft.llm.{Embeddings, Search}
import graft.model.Model

/** Corpus search / retrieval-prep operators (graft.llm.Search) + the
  * jsonGet scalar through the Model API. */
class SearchSpec extends GraftSuite {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "spark engine spark runs fast"),
      (1L, "spark engine runs ok today"),
      (2L, "flink pipeline streams events quickly"),
      (3L, "rare unique tokens here only"),
    ).toDF("doc_id", "text")
  }

  test("bm25: higher tf wins at equal length; non-matching docs dropped") {
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect()
    // docs 2 and 3 contain no query term → excluded
    assert(out.map(_.getLong(0)).toSet === Set(0L, 1L))
    // doc 0 has tf=2 at the same length 5 → strictly higher score, rank 1
    assert(out.head.getLong(0) === 0L)
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("cdc_starts native is value-identical to the HOF formulation") {
    val s = spark
    import s.implicits._
    graft.GraftExtensions.install(s)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again and again",
      "a b c",                    // fewer than k tokens → single chunk
      "one two three four",      // exactly k
      (1 to 200).map(i => s"w${i % 23}").mkString(" "), // long, repetitive
      "",
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = docs
      .selectExpr("doc_id",
        "word_kgram_md5s(split(trim(text), '\\\\s+'), 4) AS g")
      .selectExpr("doc_id",
        "cdc_starts(g, 16) AS native",
        """concat(array(1),
             filter(transform(g, (h, i) ->
               IF(i >= 1 AND CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT) % 16 = 0,
                  i + 1, CAST(NULL AS INT))),
               x -> x IS NOT NULL)) AS hof""")
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"doc ${r.getLong(0)}")
    }
  }

  test("cdcChunks: chunk spans tile the document exactly; expected-length sane") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, (1 to 500).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Search.cdcChunks(docs, "doc_id", "text", k = 4, modulus = 16)
      .orderBy(sc("chunk_ix")).collect()
    // spans are contiguous from word 1 through n with no gaps/overlap
    assert(out.head.getLong(2) === 1L)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) + a.getLong(3) === b.getLong(2), "contiguous")
      case _ =>
    }
    assert(out.map(_.getLong(3)).sum === 500L)
    // boundary rate 1/16 → plausible chunk count for 500 words
    assert(out.length >= 8 && out.length <= 90)
  }

  test("heavyHitters: equals exact top-k on a skewed corpus with tiny width") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 40 docs: 'hot' in every doc 3x, 'warm' in half, long tail of unique
    // tokens — width 8 forces real MG decrement sweeps and merge trims.
    val docs = (0 until 40).map { i =>
      val tail = s"u${i}a u${i}b u${i}c"
      val warm = if (i % 2 == 0) " warm warm" else ""
      (i.toLong, s"hot hot hot$warm $tail")
    }.toDF("doc_id", "text")
    val got = Search.heavyHitters(docs, "text", k = 2, width = 8).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("hot", 120L), ("warm", 40L)))
  }

  test("heavyHitters: ties cut deterministically by (n desc, token asc)") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "bb aa bb aa cc")).toDF("doc_id", "text")
    val got = Search.heavyHitters(docs, "text", k = 2, width = 8).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("aa", "bb"))
  }

  test("bm25: multi-term scores are the sum of per-term contributions") {
    val both = Search.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "flink"), k = 10).collect()
    // flink appears only in doc 2: rarest term → doc 2 must be present
    assert(both.map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
  }

  test("tfidf: a doc's rarest term outranks corpus-wide common terms") {
    val out = Search.tfidfTopTerms(docs, "doc_id", "text",
      sc("doc_id") === 0L, k = 2).collect()
    assert(out.length === 2)
    // 'spark' appears in 2/4 docs but twice in doc 0; 'engine' also in 2
    // docs but once here; 'fast'/'runs' are rarer/equal — top term must
    // have strictly maximal tfidf, and ranks are 1,2
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
    assert(out(0).getAs[Double]("tfidf") >= out(1).getAs[Double]("tfidf"))
  }

  test("top n-grams: exact bigram counts with deterministic ties") {
    val out = Search.topNgrams(docs, "text", n = 2, k = 3).collect()
    // 'spark engine' occurs in docs 0 and 1 → count 2; everything else 1
    assert(out(0).getString(0) === "spark engine")
    assert(out(0).getLong(1) === 2L)
    // remaining rows tie at 1 → lexicographic gram order
    assert(out(1).getString(0) < out(2).getString(0))
  }

  test("chunkWords: coverage, overlap, and tail-chunk shape") {
    val s = spark
    import s.implicits._
    val one = Seq((7L, "t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val out = Search.chunkWords(one, "doc_id", "text", chunkSize = 3, stride = 2)
      .orderBy(sc("chunk_ix")).collect()
    assert(out.map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq ===
      Seq((0, "t1 t2 t3", 3), (1, "t3 t4 t5", 3)))
    // exact-fit doc → single chunk
    val fit = Search.chunkWords(one, "doc_id", "text", chunkSize = 5, stride = 5)
      .collect()
    assert(fit.length === 1 && fit.head.getString(2) === "t1 t2 t3 t4 t5")
  }

  test("chunkWords: every token is covered at stride < chunkSize") {
    val out = Search.chunkWords(docs, "doc_id", "text", chunkSize = 3, stride = 2)
    val back = out.groupBy(sc("doc_id"))
      .agg(org.apache.spark.sql.functions.sum(sc("n_tokens")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each doc has 5 tokens → chunks of 3 with stride 2 cover 3 + 3 = 6
    // token slots (one overlap column duplicated)
    assert(back.values.toSet === Set(6L))
  }

  test("labelCentroids: exact means at (label, dim) grain") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 3.0f), 0),
      (2L, Seq(3.0f, 5.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Embeddings.labelCentroids(emb, "label", "embedding")
      .orderBy(sc("label"), sc("dim")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0, 1, 2L, 2.0), (0, 2, 2L, 4.0), (1, 1, 1L, 10.0), (1, 2, 1L, 20.0)))
  }

  test("blockDedup strips corpus-repeated blocks, keeps document order") {
    val s = spark
    import s.implicits._
    val boiler = "cookie banner accept all terms"  // 5-token repeated block
    val d = Seq(
      (0L, s"$boiler unique alpha beta gamma delta"),
      (1L, s"$boiler unique epsilon zeta eta theta"),
      (2L, s"$boiler unique iota kappa lambda mu"),
      (3L, "completely original text with no repeats"),
    ).toDF("doc_id", "text")
    val out = graft.llm.Dedup.blockDedup(d, "doc_id", "text",
      blockSize = 5, maxCopies = 2)
      .orderBy(sc("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // the boiler block appears 3 > maxCopies times → dropped everywhere;
    // each doc keeps its unique tail block (and doc 3 is untouched)
    assert(out.toSeq === Seq(
      (0L, 2L, 1L, "unique alpha beta gamma delta"),
      (1L, 2L, 1L, "unique epsilon zeta eta theta"),
      (2L, 2L, 1L, "unique iota kappa lambda mu"),
      (3L, 2L, 0L, "completely original text with no repeats")))
  }

  test("jsonGet extracts fields through the Model API; NULL on miss") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", """{"k": 3, "tag": "x"}"""),
      ("a", """{"k": 4}"""),
      ("b", """not json"""),
    ).toDF("g", "props")
    val out = Model.fromDF(df)
      .aggregate(
        groups = Seq(col("g")),
        measures = Seq(
          sum(cast(jsonGet(col("props"), "$.k"), "bigint")).named("sum_k"),
          count(jsonGet(col("props"), "$.tag")).named("n_tag")))
      .sort(col("g"))
      .run(s).collect()
    assert(out.map(r => (r.getString(0), Option(r.get(1)), r.getLong(2))).toSeq
      === Seq(("a", Some(7L), 1L), ("b", None, 0L)))
  }
}
