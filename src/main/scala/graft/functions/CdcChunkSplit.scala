package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk texts from a word array — the codegen'd form of
  * [[graft.operators.Dedup.cdcChunks]]' fold (r21). A word w closes a chunk
  * iff `conv(substring(md5(w), 1, 4), 16, 10) % divisor == 0` (i.e. the
  * md5's first TWO BYTES, as an unsigned 16-bit int, ≡ 0 mod divisor —
  * identical arithmetic, hex spelled as bytes); chunk text joins its words
  * with single spaces exactly like the fold's `has ? cur + ' ' + w : w`
  * (so empty words from doubled spaces contribute separators, matching the
  * oracle's string_agg), and a trailing unterminated chunk is emitted iff
  * it has absorbed at least one word.
  *
  * Why custom: the HOF fold ran interpreted (one md5 + string concat per
  * word per element through the expression interpreter, with the growing
  * `cur` re-copied each step — O(words²) bytes); this is one linear pass.
  * Value contract: output array BIT-IDENTICAL to the fold's
  * (OperatorsSpec's cdcChunks suite + an ExpressionsSpec parity pin). */
case class CdcChunkSplit(child: Expression, divisor: Int) extends UnaryExpression {
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_split expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkSplit.compute(input.asInstanceOf[ArrayData], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CdcChunkSplit.compute($a, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkSplit =
    copy(child = newChild)
}

object CdcChunkSplit {
  private val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(words: ArrayData, divisor: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[UTF8String]()
    val cur = new java.util.ArrayList[UTF8String]()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      md.reset()
      val digest = md.digest(w.getBytes)
      // first 4 hex chars == first 2 bytes as an unsigned 16-bit value
      val h16 = ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
      cur.add(w)
      if (h16 % divisor == 0) {
        out.add(UTF8String.concatWs(space, cur.toArray(new Array[UTF8String](cur.size)): _*))
        cur.clear()
      }
      i += 1
    }
    if (!cur.isEmpty)
      out.add(UTF8String.concatWs(space, cur.toArray(new Array[UTF8String](cur.size)): _*))
    new GenericArrayData(out.toArray)
  }
}

object CdcFunctions {
  def cdc_chunk_split(words: Column, divisor: Int): Column =
    GraftColumnBridge.column(CdcChunkSplit(GraftColumnBridge.expression(words), divisor))
}
