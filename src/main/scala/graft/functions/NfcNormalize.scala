package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15) — the canonicalization step a text
  * pipeline runs BEFORE hashing/dedup/tokenization: the same visible text
  * can arrive composed (é = U+00E9) or decomposed (e + U+0301), and
  * byte-level dedup, MinHash grams, and BPE all see those as different
  * documents unless the corpus is normalized to one canonical form first.
  * NFC is the web's dominant form (W3C recommendation), so it is also the
  * cheapest target: most input is already normalized.
  *
  * Why custom: Spark has no normalization builtin, and a Scala UDF would
  * pay serialization + break whole-stage codegen on the hottest full-text
  * column. This stays inside codegen and exploits the two overwhelming
  * fast paths in crawl text byte-for-byte: pure-ASCII rows return the
  * INPUT UTF8String (zero decode, zero allocation — NFC is the identity
  * on ASCII), and already-normalized rows return the input after the
  * JDK's quick-check (one decode, no re-encode).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    // pure ASCII ⇔ every char is one byte; NFC is the identity there
    if (s.numBytes == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
