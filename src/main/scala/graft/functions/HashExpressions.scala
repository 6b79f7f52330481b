package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash signature from an array of per-token 64-bit hashes:
  * bit j of the result is set iff Σ_tokens (±1 by bit j of the token hash)
  * is positive.
  *
  * Why custom: the fold-over-64-counters version in pure Catalyst
  * higher-order functions costs ~500 interpreted ops and one 64-element
  * array allocation per token; this compiles to two tight primitive loops
  * per row inside whole-stage codegen. */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_signature expects array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // freshName for every local — the block is emitted unbraced when the
      // child is non-nullable, so bare names collide across expressions.
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("shN")
      val i = ctx.freshName("shI")
      val h = ctx.freshName("shH")
      s"""
         |int[] $counts = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int j = 0; j < 64; j++) {
         |    $counts[j] += ((($h >>> j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int j = 0; j < 64; j++) { if ($counts[j] > 0) $sig |= (1L << j); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature from an array of per-gram 64-bit hashes: slot j is
  * min over grams of xxhash64(gramHash, seed = j). Empty input → all-MaxValue
  * sentinel (callers filter it).
  *
  * Why custom: the fold-with-zip_with version re-enters the interpreted
  * higher-order-function machinery numHashes times per gram (~3 s for 260k
  * grams at sf0.1); this is two primitive loops per row. */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Shared by interpreted eval and generated code. */
  def compute(hs: ArrayData, numHashes: Int): ArrayData = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val p = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, j.toLong)
        if (p < out(j)) out(j) = p
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 64-bit hashes of the word n-grams of a words array: gram j covers words
  * [j, j+n), hashed by chaining xxhash64 over the per-word hashes. Fewer than
  * n words → empty array.
  *
  * Why custom: building gram STRINGS via transform/slice/array_join runs
  * interpreted and allocates a string per gram; every consumer (minhash,
  * jaccard candidate join) only needs gram EQUALITY, which the 64-bit hash
  * preserves (collision odds ~2^-64 per pair). */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {

  // SQL-exposed via graft_word_grams: a non-positive n would silently
  // yield degenerate hashes instead of an error at the call site
  require(n > 0, s"word_gram_hashes: gram size n must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordGramHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramHashes {
  private val SEED = 42L

  /** Shared by interpreted eval and generated code. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val count = words.numElements()
    if (count < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](count)
    var i = 0
    while (i < count) {
      val w = words.getUTF8String(i)
      wh(i) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes(), SEED)
      i += 1
    }
    val out = new Array[Long](count - n + 1)
    var j = 0
    while (j < out.length) {
      var g = SEED
      var k = 0
      while (k < n) { g = XXH64.hashLong(wh(j + k), g); k += 1 }
      out(j) = g
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 64-bit hashes of every `k`-BYTE sliding window of a string's UTF-8
  * encoding — the byte-level gram primitive of ExactSubstr-style span
  * dedup (Lee et al. 2021 operate on bytes, not words: sub-word and
  * whitespace-variant duplication that word grams miss). Positions are
  * byte offsets into the UTF-8 encoding (== character offsets for ASCII
  * text).
  *
  * Why custom: the functions-only spelling
  * (`transform(sequence(...), i -> xxhash64(substring(text, i, k)))`)
  * materializes one substring COPY per position — O(len·k) allocation per
  * row; this hashes each window in place over the backing bytes (zero
  * copies) inside whole-stage codegen. */
case class ByteGramHashes(child: Expression, k: Int) extends UnaryExpression {

  // SQL-exposed via graft_byte_grams: a non-positive window would silently
  // yield degenerate hashes instead of an error at the call site
  require(k > 0, s"byte_gram_hashes: window k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_gram_hashes expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ByteGramHashes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ByteGramHashes.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteGramHashes {
  private val SEED = 42L

  /** Shared by interpreted eval and generated code. */
  def compute(text: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = text.numBytes()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i < out.length) {
      out(i) = XXH64.hashUnsafeBytes(text.getBaseObject, text.getBaseOffset + i, k, SEED)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** The engine-portable 60-bit md5 word hash of every element of a words
  * array: element i is `conv(substring(md5(words[i]), 1, 15), 16, 10)`
  * cast to BIGINT — i.e. the first 60 bits of the word's md5, as an
  * unsigned value — replicated bit-for-bit (the first 15 hex chars of an
  * md5 are exactly the first 8 digest bytes read big-endian, shifted
  * right by 4). Null elements map to null, matching the HOF's semantics.
  *
  * Why custom: the `transform(words, w -> conv(substring(md5(w), 1, 15),
  * 16, 10) :: long)` spelling re-enters the interpreted expression
  * evaluator per WORD (Catalyst HOFs never join whole-stage codegen) and
  * materializes a 32-char hex string plus a decimal string per word; this
  * is one MessageDigest update and one shift per word, inside codegen.
  * ExpressionsSpec pins the parity against the HOF formulation. */
case class Md5WordHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_word_hashes expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5WordHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5WordHashes.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5WordHashes {
  /** Shared by interpreted eval and generated code. */
  def compute(words: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = words.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        md.reset()
        val d = md.digest(words.getUTF8String(i).getBytes)
        // first 15 hex chars = first 60 bits = (first 8 bytes BE) >>> 4;
        // >>> zero-fills, so the value is the UNSIGNED 60-bit quantity the
        // decimal conv string parses to
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        out(i) = v >>> 4
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object HashFunctions {
  /** Column API for [[SimHashSignature]]. */
  def simhash_signature(tokenHashes: Column): Column =
    GraftColumnBridge.column(SimHashSignature(GraftColumnBridge.expression(tokenHashes)))

  /** Column API for [[Md5WordHashes]]. */
  def md5_word_hashes(words: Column): Column =
    GraftColumnBridge.column(Md5WordHashes(GraftColumnBridge.expression(words)))

  /** Column API for [[IntersectCount]]. */
  def intersect_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[MinHashSignature]]. */
  def minhash_signature(gramHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(gramHashes), numHashes))

  /** Column API for [[WordGramHashes]]. */
  def word_gram_hashes(words: Column, n: Int): Column =
    GraftColumnBridge.column(WordGramHashes(GraftColumnBridge.expression(words), n))

  /** Column API for [[ByteGramHashes]]. */
  def byte_gram_hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(ByteGramHashes(GraftColumnBridge.expression(text), k))

  /** Column API for [[MisraGriesAgg]] (an aggregate — use inside agg()). */
  def misra_gries(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(item), capacity).toAggregateExpression())

  /** Column API for [[KllSketchAgg]] (an aggregate — use inside agg()). */
  def kll_sketch(value: Column, k: Int): Column =
    GraftColumnBridge.column(
      KllSketchAgg(GraftColumnBridge.expression(value), k).toAggregateExpression())

  /** Column API for [[KllMergeSketchAgg]] (an aggregate). */
  def kll_merge_sketch(sketch: Column, k: Int): Column =
    GraftColumnBridge.column(
      KllMergeSketchAgg(GraftColumnBridge.expression(sketch), k)
        .toAggregateExpression())

  /** Column API for [[KllMergeSummaryAgg]] (an aggregate). */
  def kll_merge_summary(sketch: Column, ranks: Seq[Double], k: Int): Column =
    GraftColumnBridge.column(
      KllMergeSummaryAgg(GraftColumnBridge.expression(sketch), ranks, k)
        .toAggregateExpression())

  /** Column API for [[KllValuesSummaryAgg]] (an aggregate). */
  def kll_values_summary(value: Column, ranks: Seq[Double], k: Int): Column =
    GraftColumnBridge.column(
      KllValuesSummaryAgg(GraftColumnBridge.expression(value), ranks, k)
        .toAggregateExpression())
}
