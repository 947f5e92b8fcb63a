package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup hot loops.
  *
  * The built-in formulations (`transform(sequence(...), i -> md5(...))`,
  * nested `array_min(transform(...))`) are higher-order functions —
  * CodegenFallback in Spark, so every window/shingle pays an interpreted
  * lambda dispatch plus expression-tree evaluation. At millions of md5
  * calls per partition that overhead dominates. These expressions evaluate
  * the same loops in plain JVM code (thread-local MessageDigest, no
  * per-element expression dispatch) and codegen to a static call.
  *
  * Hex output is identical to Spark's and DuckDB's `md5`, so the DuckDB
  * oracles that replay the HOF formulations keep hash-matching exactly.
  */
object TextHash {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private[expr] def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 8 hex digits of md5 (the portable 32-bit token hash). */
  def md5Hex8(s: String): String = md5Hex(s).substring(0, 8)

  /** Min md5-hex over all character n-gram windows (whole-text md5 when
    * shorter than n) — the winnowing fingerprint. */
  def charNgramMin(text: UTF8String, n: Int): UTF8String = {
    if (text == null) return null
    val s = text.toString
    if (s.length < n) return UTF8String.fromString(md5Hex(s))
    var min: String = null
    var i = 0
    val last = s.length - n
    while (i <= last) {
      val h = md5Hex(s.substring(i, i + n))
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  /** MinHash signature via ONE md5 per shingle + a universal-hash family:
    * x = first 8 md5-hex digits parsed as a long (32-bit), then
    * h_k(x) = ((2k+1)·x + 1000000007·k) mod 2147483647 for k = 1..H;
    * signature element k is the min over shingles. The round-2
    * formulation paid H full md5s PER SHINGLE (md5(k || ':' || s)); this
    * pays one, and the (2k+1) odd multipliers give H distinct affine
    * permutations of the same 32-bit hash — the standard one-hash MinHash
    * construction. Every intermediate stays below 2^40, so the identical
    * values replay in DuckDB's checked BIGINT arithmetic (and even in
    * doubles) with zero overflow risk. */
  def minhashHash(k: Int, x: Long): Long =
    ((2L * k + 1L) * x + 1000000007L * k) % 2147483647L

  def minhashSignature(shingles: ArrayData, numHashes: Int): ArrayData = {
    if (shingles == null) return null
    val n = shingles.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i)
      if (sh != null) {
        val x = java.lang.Long.parseLong(md5Hex(sh.toString).substring(0, 8), 16)
        var k = 1
        while (k <= numHashes) {
          val v = minhashHash(k, x)
          if (v < mins(k - 1)) mins(k - 1) = v
          k += 1
        }
      }
      i += 1
    }
    val sig = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      sig(k) = if (mins(k) == Long.MaxValue) null else java.lang.Long.valueOf(mins(k))
      k += 1
    }
    new GenericArrayData(sig)
  }
}

object TextHashMore {
  /** Jaccard similarity of the distinct character n-gram sets of two
    * strings (same sets as TextOps.charShingles → array_intersect /
    * array_union, computed directly from the strings so the pipeline never
    * materializes shingle arrays). */
  def charNgramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    def grams(u: UTF8String): java.util.HashSet[String] = {
      val s = u.toString
      val set = new java.util.HashSet[String]()
      if (s.length < n) { set.add(s); set }
      else {
        var i = 0
        val last = s.length - n
        while (i <= last) { set.add(s.substring(i, i + n)); i += 1 }
        set
      }
    }
    val ga = grams(a)
    val gb = grams(b)
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    val union = ga.size + gb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  private def wordShingleSet(
      toks: ArrayData, n: Int): java.util.LinkedHashSet[String] = {
    val set = new java.util.LinkedHashSet[String]()
    val cnt = toks.numElements()
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i + n <= cnt) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  /** Space-joined word n-grams in position order — the codegen'd form of
    * `TextOps.wordShingles` (value-identical to the spec-pinned HOF
    * anchor, INCLUDING null tokens: `concat_ws` skips NULLs within each
    * window, so a null token joins as if absent — and the output array
    * therefore really is null-free, as the declared
    * `containsNull = false` promises): one UTF8String byte-concat per
    * gram instead of a CodegenFallback transform+slice+concat_ws lambda
    * chain per position. Empty array below n tokens, matching the HOF
    * guard. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    if (toks == null) return null
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(new Array[Any](0))
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](cnt - n + 1)
    var i = 0
    while (i + n <= cnt) {
      val parts = new Array[UTF8String](2 * n - 1)
      var m = 0
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        if (t != null) { // concat_ws semantics: null tokens join as absent
          if (m > 0) { parts(m) = sep; m += 1 }
          parts(m) = t
          m += 1
        }
        j += 1
      }
      out(i) = UTF8String.concat(java.util.Arrays.copyOf(parts, m): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5-hex of EVERY word k-gram window, in position order — the
    * POSITIONAL (non-distinct) complement of [[wordShingleSet]], fusing
    * wordShingles + per-gram md5 into one pass. Substring-span dedup
    * explodes this with positions, so duplicates and order must survive
    * (a distinct fold would destroy the island structure). Empty array
    * when the doc has fewer than k tokens — matching the HOF guard. */
  def wordKgramMd5s(toks: ArrayData, k: Int): ArrayData = {
    if (toks == null) return null
    val cnt = toks.numElements()
    if (cnt < k) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](cnt - k + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= cnt) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(TextHash.md5Hex(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunk START positions (1-based word positions) from a
    * positional gram-md5 array ([[wordKgramMd5s]] output): position 1,
    * plus every gram position i >= 2 whose md5's first-8-hex value is
    * ≡ 0 (mod `modulus`). The hash-boundary rule is the word-level analog
    * of Rabin/gear CDC (LBFS, Muthitacharoen et al. SOSP'01): boundaries
    * depend only on LOCAL content, so an insertion early in a document
    * shifts chunk hashes only until the next boundary — unlike fixed-size
    * chunking, where everything downstream changes. Expected chunk length
    * is `modulus` words. DuckDB replays the rule verbatim
    * (`concat('0x', substr(md5(gram), 1, 8))::BIGINT % modulus`). */
  def cdcStarts(grams: ArrayData, modulus: Int): ArrayData = {
    if (grams == null) return null
    val n = grams.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Any](8)
    buf += 1
    var i = 1
    while (i < n) {
      val h = grams.getUTF8String(i).toString
      if (java.lang.Long.parseLong(h.substring(0, 8), 16) % modulus == 0)
        buf += i + 1
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** MinHash signature over the distinct word n-gram shingles of a token
    * array — fuses wordShingles + array_distinct + minhashSignature into
    * one pass (identical values: min is order-insensitive). Same one-md5
    * universal-hash construction as [[TextHash.minhashSignature]]. */
  def minhashSigWords(toks: ArrayData, n: Int, numHashes: Int): ArrayData = {
    if (toks == null) return null
    val shingles = wordShingleSet(toks, n)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val x = java.lang.Long.parseLong(
        TextHash.md5Hex(it.next()).substring(0, 8), 16)
      var k = 1
      while (k <= numHashes) {
        val v = TextHash.minhashHash(k, x)
        if (v < mins(k - 1)) mins(k - 1) = v
        k += 1
      }
    }
    val sig = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      sig(k) = if (mins(k) == Long.MaxValue) null else java.lang.Long.valueOf(mins(k))
      k += 1
    }
    new GenericArrayData(sig)
  }

  /** Jaccard similarity of the distinct word n-gram shingle sets of two
    * token arrays (same sets as wordShingles + array_distinct, same ratio
    * as array_intersect/array_union sizes). */
  def wordNgramJaccard(a: ArrayData, b: ArrayData, n: Int): Double = {
    val ga = wordShingleSet(a, n)
    val gb = wordShingleSet(b, n)
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    val union = ga.size + gb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** k smallest DISTINCT md5-hex hashes over all character n-gram
    * windows, ascending — the bottom-k winnowing sketch. Value-identical
    * to `slice(array_sort(array_distinct(transform(sequence(1,
    * length(t)-n+1), i -> md5(substring(t, i, n))))), 1, k)` (whole-text
    * md5 when shorter than n), but ONE pass with a bounded k-element
    * ordered buffer instead of materializing and sorting every window
    * hash. */
  def charNgramBottomK(text: UTF8String, n: Int, k: Int): ArrayData = {
    if (text == null) return null
    val s = text.toString
    if (s.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(TextHash.md5Hex(s))))
    val set = new java.util.TreeSet[String]()
    var i = 0
    val last = s.length - n
    while (i <= last) {
      val h = TextHash.md5Hex(s.substring(i, i + n))
      if (set.size < k) set.add(h)
      else if (h.compareTo(set.last) < 0 && set.add(h)) set.pollLast()
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over the DISTINCT word bigrams of a token array —
    * fuses TextOps.wordShingles(2) + array_distinct + hashedTokens +
    * simhash32 into one pass. Hash per bigram = first 8 md5-hex digits
    * parsed as a long (identical to the CAST(conv(substring(md5(..),1,8),
    * 16,10) AS bigint) formulation); bit b of the fingerprint is the
    * majority vote (ties → 0). */
  def simhashBigrams(toks: ArrayData): Long = {
    if (toks == null) return 0L
    val n = toks.numElements()
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n - 1) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      if (a != null && b != null) {
        val bigram = a.toString + " " + b.toString
        if (seen.add(bigram)) {
          val h = java.lang.Long.parseLong(TextHash.md5Hex8(bigram), 16)
          var bit = 0
          while (bit < 32) {
            if (((h >> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 32) {
      if (counts(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }
}

/** `char_ngram_min(text, n)` — see [[TextHash.charNgramMin]]. */
case class CharNgramMin(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_min expects (string, n>0), got ${child.dataType.simpleString}, n=$n")
  override def dataType: DataType = StringType
  override def prettyName: String = "char_ngram_min"

  override def nullSafeEval(input: Any): Any =
    TextHash.charNgramMin(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.TextHash.charNgramMin($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramMin =
    copy(child = newChild)
}

/** `char_ngram_bottomk(text, n, k)` — see [[TextHashMore.charNgramBottomK]]. */
case class CharNgramBottomK(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0 && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_bottomk expects (string, n>0, k>0), got " +
        s"${child.dataType.simpleString}, n=$n, k=$k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngram_bottomk"

  override def nullSafeEval(input: Any): Any =
    TextHashMore.charNgramBottomK(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.TextHashMore.charNgramBottomK($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramBottomK =
    copy(child = newChild)
}

/** `char_ngram_jaccard(a, b, n)` — see [[TextHashMore.charNgramJaccard]]. */
case class CharNgramJaccard(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && n > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_jaccard expects (string, string, n>0)")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_ngram_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashMore.charNgramJaccard(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.TextHashMore.charNgramJaccard($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgramJaccard =
    copy(left = newLeft, right = newRight)
}

/** `minhash_sig_words(tokens, shingleSize, numHashes)` —
  * see [[TextHashMore.minhashSigWords]]. */
case class MinHashSigWords(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 && numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_words expects (array<string>, n>0, h>0), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig_words"

  override def nullSafeEval(input: Any): Any =
    TextHashMore.minhashSigWords(input.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.TextHashMore.minhashSigWords($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigWords =
    copy(child = newChild)
}

/** `word_kgram_md5s(toks, k)` — see [[TextHashMore.wordKgramMd5s]]. */
/** `word_ngrams(toks, n)` — see [[TextHashMore.wordNgrams]]. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects (array<string>, n>0), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextHashMore.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashMore.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

case class WordKgramMd5s(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_kgram_md5s expects (array<string>, k>0), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_kgram_md5s"

  override def nullSafeEval(input: Any): Any =
    TextHashMore.wordKgramMd5s(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashMore.wordKgramMd5s($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordKgramMd5s =
    copy(child = newChild)
}

/** `cdc_starts(grams, modulus)` — see [[TextHashMore.cdcStarts]]. */
case class CdcStarts(child: Expression, modulus: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if modulus > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_starts expects (array<string>, modulus>0), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_starts"

  override def nullSafeEval(input: Any): Any =
    TextHashMore.cdcStarts(input.asInstanceOf[ArrayData], modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashMore.cdcStarts($c, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): CdcStarts =
    copy(child = newChild)
}

/** `word_ngram_jaccard(aToks, bToks, n)` —
  * see [[TextHashMore.wordNgramJaccard]]. */
case class WordNgramJaccard(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if n > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngram_jaccard expects (array<string>, array<string>, n>0), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "word_ngram_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashMore.wordNgramJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.TextHashMore.wordNgramJaccard($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgramJaccard =
    copy(left = newLeft, right = newRight)
}

/** `simhash_bigrams(tokens)` — see [[TextHashMore.simhashBigrams]]. */
case class SimhashBigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bigrams expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bigrams"

  override def nullSafeEval(input: Any): Any =
    TextHashMore.simhashBigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashMore.simhashBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBigrams =
    copy(child = newChild)
}

/** `minhash_sig(shingles, numHashes)` — see [[TextHash.minhashSignature]]. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<string>, n>0), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextHash.minhashSignature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.TextHash.minhashSignature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Character-distribution Shannon entropy, bit-for-bit identical to the
  * HOF formulation in TextOps.charEntropyHof (which the DuckDB oracle
  * replays): counts by code point, folds -(p·log2 p) terms in ASCENDING
  * code-point order (= binary order of single-char strings, = the HOF's
  * array_sort order), seeds at exact 0.0, canonicalizes -0.0 with +0.0,
  * and applies the same HALF_UP 6-dp round Spark's `round` uses. The HOF
  * version re-scans the text once per distinct character through
  * interpreted lambdas (measured ~2.9 s over sf0.1 documents); this is
  * one codegen'd pass plus an alphabet-sized fold (~100 ms). */
object TextEntropy {
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    var n = 0L
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = counts.get(cp)
      counts.put(cp, if (c == null) 1 else c.intValue() + 1)
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val nd = n.toDouble
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().intValue() / nd
      // Spark's Log2 expression evaluates via java.lang.StrictMath.log
      // (spark-catalyst 4.1.2, both interpreted and codegen paths). Math.log
      // is a HotSpot intrinsic allowed to differ by 1 ulp, so StrictMath is
      // required for the bit-for-bit native==HOF value identity the spec and
      // oracle assert.
      acc -= p * (java.lang.StrictMath.log(p) / java.lang.StrictMath.log(2.0))
    }
    java.math.BigDecimal.valueOf(acc + 0.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** `char_entropy(text)` — see [[TextEntropy.charEntropy]]. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    TextEntropy.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextEntropy.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
