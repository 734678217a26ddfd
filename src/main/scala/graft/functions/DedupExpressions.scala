package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the dedup signature hot loops.
  *
  * The declarative HOF forms (`transform`/`aggregate` lambdas) evaluate
  * one lambda dispatch per array element per hash function — for 16
  * MinHash permutations × ~300 shingles × n docs that interpreted
  * overhead dominated the bench. These evaluate the same arithmetic in
  * one tight JVM loop per document. `CodegenFallback` is deliberate:
  * one eval call per document amortizes everything; codegen would only
  * inline the same loop.
  *
  * The arithmetic must stay BIT-IDENTICAL to the DuckDB oracle SQL in
  * `graft.registry.DedupQueries` — change both together or neither.
  */

/** MinHash signature from an array of base hashes (each in [0, P)):
  * sig[j] = min over bases of (a_j·h + b_j) mod P, with
  * a_j = (2654435761·(j+1)) mod P, b_j = (40503·(j+7)) mod P,
  * P = 2^31−1 (prime ⇒ each map is a bijection). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val bases = input.asInstanceOf[ArrayData]
    val n = bases.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = (2654435761L * (j + 1)) % P
      val b = (40503L * (j + 7)) % P
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * bases.getLong(i) + b) % P
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** SimHash bit string from an array of md5 hex digests: bit j votes
  * ±1 per digest by bit (j mod 4) of the VALUE of hex digit (j div 4)
  * — 4 signature bits per hex character, so one 32-char md5 supports
  * up to 128 bits and a 64-bit signature costs exactly one digest per
  * shingle. Output char j is '1' iff the vote sum is positive. */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash_bits"

  override def nullSafeEval(input: Any): Any = {
    val digests = input.asInstanceOf[ArrayData]
    val n = digests.numElements()
    val sums = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val d = digests.getUTF8String(i).getBytes
      var j = 0
      while (j < bits) {
        val b = d(j >> 2)
        val v = if (b < 58) b - 48 else b - 87 // hex char -> digit value
        sums(j) += (((v >> (j & 3)) & 1) << 1) - 1
        j += 1
      }
      i += 1
    }
    val chars = new Array[Byte](bits)
    var j = 0
    while (j < bits) {
      chars(j) = if (sums(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(chars)
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}

object DedupExpressions {
  def minhashSig(bases: Column, numHashes: Int): Column =
    column(MinHashSig(expression(bases), numHashes))
  def simhashBits(digests: Column, bits: Int): Column =
    column(SimHashBits(expression(digests), bits))
}
