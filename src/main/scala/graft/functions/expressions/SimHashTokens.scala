package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens in one pass.
  *
  * Same rationale as [[MinHashShingles]]: the HOF formulation costs 64
  * interpreted folds per row (one per bit); this walks the string
  * once, hashes each token with FNV-1a + avalanche, and updates 64
  * counters in a tight loop. Token boundaries are whitespace runs,
  * matching `split(trim(text), "\\s+")`.
  */
case class SimHashTokens(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](64)
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L
        while (i < n && !Character.isWhitespace(text.charAt(i))) {
          h = (h ^ text.charAt(i)) * 0x100000001b3L
          i += 1
        }
        // avalanche so low bits are well-mixed
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
        h ^= h >>> 33
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashTokens =
    copy(child = newChild)
  override def prettyName: String = "simhash_tokens"
}
