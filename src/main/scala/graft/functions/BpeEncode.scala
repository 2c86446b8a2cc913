package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding of a document with a FIXED learned merge table
  * (see [[graft.ext.Bpe.train]]): tokens are `trim → lowercase → split
  * \s+` words, each word starts as its character symbols, and adjacent
  * symbol pairs merge greedily in learned-rank order (lowest rank first —
  * the standard BPE inference loop). Output is the concatenated symbol
  * stream across words (merges never cross a word boundary).
  *
  * A native imperative expression for the same reason as
  * [[GramMixHashes]]: the per-word merge loop is data-dependent iteration
  * that higher-order Column functions cannot express without interpreting
  * a lambda per symbol per round. The merge table rides in the expression
  * (driver-trained, small by construction — `numMerges` entries), so the
  * whole encode is a narrow map with no joins.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs a string input, got ${child.dataType.sql}")

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private def encodeWord(w: String, out: ArrayBuffer[UTF8String]): Unit = {
    var syms = BpeEncode.codePointSymbols(w)
    while (syms.length > 1) {
      // lowest-rank adjacent pair this round (ranks are unique, so the
      // scan is deterministic); stop when no pair is mergeable
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) {
        syms.foreach(s => out += UTF8String.fromString(s))
        return
      }
      val merged = syms(best) + syms(best + 1)
      val next = new ArrayBuffer[String](syms.length - 1)
      var j = 0
      while (j < syms.length) {
        // merge EVERY occurrence of the winning pair left-to-right
        if (j < syms.length - 1 && syms(j) == syms(best) &&
          syms(j + 1) == syms(best + 1)) {
          next += merged; j += 2
        } else { next += syms(j); j += 1 }
      }
      syms = next
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.trim
      .toLowerCase(java.util.Locale.ROOT)
    val out = new ArrayBuffer[UTF8String]()
    s.split("\\s+").foreach { w => if (w.nonEmpty) encodeWord(w, out) }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}

object BpeEncode {
  /** Seed symbols = whole code points, not UTF-16 chars: per-char
    * substring would split surrogate pairs (emoji, CJK extensions) into
    * lone surrogates, which `UTF8String.fromString` emits as malformed
    * UTF-8. Shared by inference here and [[graft.ext.Bpe.train]] so the
    * learned merge table and the encoder agree on the symbol alphabet. */
  def codePointSymbols(w: String): ArrayBuffer[String] = {
    val syms = new ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      syms += w.substring(i, i + n)
      i += n
    }
    syms
  }
}
