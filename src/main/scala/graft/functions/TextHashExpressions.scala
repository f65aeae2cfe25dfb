package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-hashing expressions for the dedup hot paths.
  *
  * The column-level formulations (`split` + `transform(_, xxhash64)` +
  * per-band `array_min` lambdas) evaluate higher-order functions
  * interpreted — once per element per hash seed — which made the MinHash /
  * SimHash pipelines the two most environment-sensitive queries in the
  * benchmark (cold JIT + three eager localCheckpoints per call). Each
  * expression here makes ONE pass in JVM code and participates in
  * whole-stage codegen (and its common-subexpression elimination), so the
  * dedup pipelines need no materialization barriers at all.
  *
  * Hash family compatibility: all hashing goes through Spark's own
  * [[XXH64]] with the same seeding as the built-in `xxhash64` expression
  * (seed 42, fold left over arguments), so fingerprints are bit-identical
  * to the column formulations in [[graft.dedup.Dedup]].
  */
object TextHash {

  /** Same token semantics as [[graft.text.TextAnalysis.tokens]]:
    * split on whitespace/punctuation runs, drop empties. */
  private val Sep = Pattern.compile("[\\s\\p{Punct}]+")

  private[functions] def splitTokens(text: UTF8String): Array[String] =
    Sep.split(text.toString, -1).filter(_.nonEmpty)

  /** xxhash64(token) for each token of `text`, one pass. */
  def tokenHashes(text: UTF8String): ArrayData = {
    val toks = splitTokens(text)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word-k-shingles, matching
    * [[graft.text.TextAnalysis.wordShinglesFromTokens]] exactly:
    * indices 0..max(n-k, 0), space-joined windows (shorter at the tail),
    * empties dropped, first-occurrence order kept. */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = splitTokens(text)
    val n = toks.length
    val last = math.max(n - k, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      if (end > i) {
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        if (sb.length > 0) seen.add(sb.toString)
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** Distinct 64-bit hashes of each word-k-window — the same window set
    * as [[wordShingles]] (indices 0..max(n-k, 0), shorter at the tail,
    * first-occurrence distinct) but the window NEVER exists as a string:
    * per-token xxhash64 values are folded positionally (rotate-xor-mult
    * chain, so "a b" and "b a" differ), one pass, longs only. Two
    * windows collide iff the 64-bit folds collide (~(#windows)^2/2^64,
    * the same class as hashing the joined string), which is the
    * documented contract of the span-dedup hashWindows path. */
  def wordWindowHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = splitTokens(text)
    val n = toks.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val last = math.max(n - k, 0)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      var h = 0x27d4eb2f165667c5L
      var j = i
      while (j < end) {
        h = java.lang.Long.rotateLeft(h ^ th(j), 27) * -7046029254386353131L +
          0x165667b19e3779f9L
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection, one pass per document: k-shingle
    * xxhash64 values, sliding-window minimum over w via a monotonic
    * deque (O(len) total), distinct in first-occurrence order. Same
    * selection as the column fast path (numeric min over xxhash64 of
    * the joined shingle, complete windows only) with NO row explosion
    * and NO doc-partition sort — the winnowing pass stays narrow. */
  def winnowHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = splitTokens(text)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val H = n - k + 1
    if (H < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](H)
    var i = 0
    while (i < H) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      hs(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < H) {
      while (!deque.isEmpty && deque.peekFirst <= i - w) deque.pollFirst()
      while (!deque.isEmpty && hs(deque.peekLast) >= hs(i)) deque.pollLast()
      deque.addLast(i)
      if (i >= w - 1) seen.add(hs(deque.peekFirst))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }

  /** Hashed bag-of-words linear score, one pass: bias + Σ
    * weights[pmod(xxhash64(token), B)]. Left-fold in token order, so the
    * double result is bit-identical to the column
    * transform+aggregate formulation. */
  def linearScore(text: UTF8String, weights: Array[Double], bias: Double): Double = {
    val toks = splitTokens(text)
    val b = weights.length.toLong
    var acc = bias
    var i = 0
    while (i < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      val m = ((h % b) + b) % b
      acc += weights(m.toInt)
      i += 1
    }
    acc
  }

  /** SimHash combinatorial blocking keys (see
    * [[graft.dedup.Dedup.simhashPairs]]): one xxhash64-chained key per
    * (chunks - maxHamming)-subset of fingerprint chunks, bit-identical to
    * the column formulation `xxhash64(chunkVal(m0), chunkVal(m1), ...)`
    * (seed 42, fold `hashLong` left over the chunk values — exactly what
    * Spark's multi-argument `xxhash64` does for long inputs).
    *
    * The flattened (offsets, masks, starts) encoding keeps the generated
    * code ONE method call regardless of the combo count — the inline
    * column formulation at the 10-chunk tier emits 120 xxhash64 calls and
    * blows janino's 64 KB method limit, silently dropping the whole
    * projection out of whole-stage codegen exactly on the >500 M-doc path
    * the tier exists for. */
  def simhashComboKeys(fp: Long, offsets: Array[Int], masks: Array[Long],
      starts: Array[Int]): ArrayData = {
    val nCombos = starts.length - 1
    val out = new Array[Any](nCombos)
    var c = 0
    while (c < nCombos) {
      var h = 42L
      var i = starts(c)
      val end = starts(c + 1)
      while (i < end) {
        h = XXH64.hashLong((fp >>> offsets(i)) & masks(i), h)
        i += 1
      }
      out(c) = h
      c += 1
    }
    new GenericArrayData(out)
  }

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-family SimHash of the token multiset — the
    * oracle-statable fingerprint behind
    * [[graft.dedup.Dedup.simhashPairsMd5]]. Per token the hash is the top
    * 60 bits of md5 (big-endian first 8 digest bytes >>> 4 == the first
    * 15 hex chars == `conv(substr(md5(tok), 1, 15), 16, 10)`), votes as
    * in [[graft.dedup.Dedup.simhashFromHashes]]; bits 60-63 stay 0. */
  def md5SimHash(text: UTF8String): Long = {
    val toks = splitTokens(text)
    val votes = new Array[Int](60)
    val md = Md5.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val dig = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = h >>> 4
      var bit = 0
      while (bit < 60) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 60) { if (votes(bit) > 0) fp |= 1L << bit; bit += 1 }
    fp
  }

  /** MinHash signature over a shingle array: sig(j) = min over shingles of
    * xxhash64(j, shingle) — bit-identical to
    * [[graft.dedup.Dedup.minhashSignature]] (seed chain
    * `hashInt(j, 42)` then `hashUTF8String(s, seed)`). */
  def minhashSigs(shingles: ArrayData, numHashes: Int): ArrayData = {
    val seeds = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) { seeds(j) = XXH64.hashInt(j, 42L); j += 1 }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUTF8String(s, seeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var p = 0
    while (p < numHashes) { out(p) = sig(p); p += 1 }
    new GenericArrayData(out)
  }

  /** Gopher repetition profile in one tokenize pass (see
    * [[RepetitionProfile]]): (n_2grams, top_2gram_n, dup_3gram_excess).
    * Gram identity is the exact space-joined token string — the same
    * grams the column formulation builds — so the profile is
    * collision-free by construction. */
  def repetitionProfile(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = splitTokens(text)
    val n = toks.length
    var n2 = 0L
    var top2 = 0L
    var ex3 = 0L
    if (n >= 2) {
      n2 = (n - 1).toLong
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i <= n - 2) {
        val g = toks(i) + " " + toks(i + 1)
        val prev = counts.get(g)
        val c = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(g, c)
        if (c > top2) top2 = c
        i += 1
      }
    }
    if (n >= 3) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i <= n - 3) {
        if (!seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))) ex3 += 1
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(n2, top2, ex3)
  }
}

/** `xxhash64_tokens(text)` → array<bigint>: tokenize + hash in one pass. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"xxhash64_tokens needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_shingles(text, k)` → array<string>: distinct word-k-shingles. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_window_hashes(text, k)` → array<bigint>: distinct positional
  * hashes of each word-k-window, no window-string materialization. */
case class WordWindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"window size must be >= 1, got $k")
  override def prettyName: String = "word_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_window_hashes needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordWindowHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordWindowHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_md5(text)` → bigint: one-pass 60-bit md5-family SimHash
  * (tokenize + digest + vote in JVM code; the column formulation walks
  * the token array 64 times through interpreted HOF aggregates). */
case class Md5SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5 needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.md5SimHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.md5SimHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_combo_keys(fp, chunks, maxHamming)` → array<bigint>: every
  * (chunks - maxHamming)-subset blocking key of the fingerprint, one
  * compact generated call (combo table passed as reference objects, never
  * inlined into the generated source). */
case class SimHashComboKeys(child: Expression, chunks: Int, maxHamming: Int)
    extends UnaryExpression {
  require(chunks > maxHamming && chunks <= 64,
    s"need 64 >= chunks ($chunks) > maxHamming ($maxHamming)")

  // flattened combo table: combo c covers flat positions
  // starts(c) until starts(c+1), each an (offset, mask) chunk extraction
  private val (flatOffsets, flatMasks, comboStarts) = {
    val bounds = graft.dedup.Dedup.chunkBounds(chunks)
    val combos = (0 until chunks).combinations(chunks - maxHamming).toArray
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    val masks = scala.collection.mutable.ArrayBuffer[Long]()
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    combos.foreach { m =>
      m.foreach { i =>
        val (off, w) = bounds(i)
        offs += off
        masks += (if (w == 64) -1L else (1L << w) - 1)
      }
      starts += offs.length
    }
    (offs.toArray, masks.toArray, starts.toArray)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_combo_keys needs bigint, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhashComboKeys(input.asInstanceOf[Long], flatOffsets, flatMasks,
      comboStarts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offs = ctx.addReferenceObj("comboOffsets", flatOffsets, "int[]")
    val masks = ctx.addReferenceObj("comboMasks", flatMasks, "long[]")
    val starts = ctx.addReferenceObj("comboStarts", comboStarts, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.simhashComboKeys($c, $offs, $masks, $starts)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sigs(shingles, numHashes)` → array<bigint>. */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs needs array<string>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSigs(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashSigs($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `repetition_profile(text)` → struct<n_2grams, top_2gram_n,
  * dup_3gram_excess> (all bigint): the Gopher repetition-removal profile
  * (Rae et al. 2021 §A1.1) in ONE tokenize pass — total and most-frequent
  * 2-gram occurrence counts plus the excess (beyond-first) occurrences of
  * repeated 3-grams. Exact string-keyed counting (no hash-collision
  * caveat): bit-identical to the rawShingles/topRunCount column
  * formulation, which walks interpreted higher-order functions and is
  * ~20x slower at corpus scale. */
case class RepetitionProfile(child: Expression) extends UnaryExpression {
  override def prettyName: String = "repetition_profile"
  override def dataType: DataType = RepetitionProfile.Out
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_profile needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.repetitionProfile(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.repetitionProfile($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionProfile {
  val Out: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_2grams", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("top_2gram_n", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_3gram_excess", LongType, nullable = false)))
}

/** `winnow_fps(text, k, w)` → array<bigint>: one-pass winnowing
  * fingerprint selection ([[TextHash.winnowHashes]]). */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")
  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.winnowHashes(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.winnowHashes($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `linear_score(text)` → double: the hashed bag-of-words linear model
  * ([[graft.text.Classifier]]) as ONE native pass — tokenize, xxhash64
  * bucket, weight sum — with no token array, no per-token lambda frames,
  * no 32-char hash strings. Weights ride into generated code as a
  * reference object. Matches `Classifier.hashedLinearScore(...,
  * fastHash = true)` bit for bit (same tokenizer, same xxhash64 seed,
  * same pmod; spec-enforced differentially). */
case class LinearScore(child: Expression, weights: Array[Double], bias: Double)
    extends UnaryExpression {
  require(weights.nonEmpty, "empty weight vector")
  override def prettyName: String = "linear_score"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"linear_score needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.linearScore(input.asInstanceOf[UTF8String], weights, bias)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("linearWeights", weights, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.linearScore($c, $wRef, $bias)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
