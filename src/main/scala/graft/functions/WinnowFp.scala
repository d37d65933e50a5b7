package graft.functions


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03): per text, hash every positional `gramLen`-char gram
  * with the portable 60-bit md5 hash ([[Portable.h60]] semantics),
  * slide a window of `w` consecutive hashes, keep each window's
  * minimum, and return the distinct selected values in
  * first-occurrence (window) order — exactly the value sequence of
  * the compositional form
  * `array_distinct(transform(windows, w -> array_min(slice(hs, w,
  * W))))` over `hs = transform(grams, md5…)`.
  *
  * Why native: the compositional pipeline evaluates INTERPRETED
  * (higher-order functions never reach codegen), and because the
  * `hs` projection feeds a lambda, Catalyst's projection collapse +
  * the lack of interpreted common-subexpression elimination re-walk
  * the expression tree per window — at sf0.1 that made q177 the
  * slowest query in the registry by two orders of magnitude (it is
  * what actually blew the round-9 driver bench window mid-q177).
  * Here: one md5 per gram (thread-local digest, no per-call
  * allocation), an O(n) monotonic-deque sliding minimum, and a
  * single output buffer — the whole fingerprint costs ~L digest
  * calls per document, period.
  *
  * Semantics pinned by PipelineSpec bit-equality against the
  * compositional form (including empty / sub-threshold / exactly-
  * threshold / non-ASCII texts):
  *  - texts shorter than `gramLen + w - 1` chars (codepoints, the
  *    `substr` unit) select NOTHING → empty array;
  *  - null text → empty array too (the `when` guard's null-pred
  *    behavior in the compositional form), so the expression is
  *    never null and `explode` drops the doc on both paths;
  *  - hash = first 15 hex chars of md5(UTF-8 gram bytes) as a
  *    positive long = top 60 bits of the big-endian digest.
  */
case class WinnowFp(child: Expression, gramLen: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(gramLen >= 1 && w >= 1, s"gramLen=$gramLen, w=$w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fp expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_winnow_fp"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WinnowFp.Empty
    else WinnowFp.fingerprint(v.asInstanceOf[UTF8String], gramLen, w)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFp {

  private[functions] val Empty = new GenericArrayData(Array.empty[Long])

  private[functions] def fingerprint(text: UTF8String, gramLen: Int, w: Int): GenericArrayData = {
    val chars = text.numChars()
    if (chars < gramLen + w - 1) return Empty
    val n = chars - gramLen + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      // substringSQL is codepoint-indexed like the `substr` the
      // compositional form hashes — identical bytes reach md5
      hs(i) = Portable.h60jvm(text.substringSQL(i + 1, gramLen).getBytes)
      i += 1
    }
    // O(n) sliding-window minimum: deque of indices with increasing
    // hash values; the front is the current window's min
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](n - w + 1)
    var outLen = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hs(deque(head))
        if (seen.add(m)) { out(outLen) = m; outLen += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** Column wrapper for the DataFrame surface. */
  def winnowFp(text: Column, gramLen: Int, w: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WinnowFp(Bridge.expression(text), gramLen, w))
  }
}
