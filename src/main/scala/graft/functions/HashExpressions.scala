package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hash-sketch hot paths.
  *
  * The same computations are expressible with higher-order functions
  * (`aggregate`/`zip_with`), but HOF lambda bodies are interpreted
  * per-element with boxed values — a 64-hash MinHash signature over ~70
  * shingles costs thousands of allocating interpreted evals per row
  * (measured ~4 ms/row). These expressions run the identical loops as
  * tight unboxed JVM code (~20 us/row) using Spark's own XXH64.
  *
  * `CodegenFallback` is deliberate: the expression body is one compiled
  * method call per row, so whole-stage codegen would add nothing — the
  * loop, not the dispatch, is the cost.
  */

/** Hashes a token array into distinct word n-gram shingle hashes:
  * each token is xxhash64'd once, each n-gram hash chains the token
  * hashes. If the document has fewer than `n` tokens the whole token
  * array collapses to one shingle (mirrors [[graft.ops.Dedup.shingles]]).
  */
case class ShingleHash(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  private final val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val numToks = toks.numElements()
    val th = new Array[Long](numToks)
    var i = 0
    while (i < numToks) {
      th(i) = XXH64.hashUTF8String(toks.getUTF8String(i), Seed)
      i += 1
    }
    val out =
      if (numToks < n) { // whole-text fallback shingle
        var h = Seed
        var j = 0
        while (j < numToks) { h = XXH64.hashLong(th(j), h); j += 1 }
        Array(h)
      } else {
        val numShingles = numToks - n + 1
        val hs = new Array[Long](numShingles)
        var s = 0
        while (s < numShingles) {
          var h = Seed
          var j = 0
          while (j < n) { h = XXH64.hashLong(th(s + j), h); j += 1 }
          hs(s) = h
          s += 1
        }
        hs
      }
    // distinct via sort + unique (shingle sets are set-semantics)
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** MinHash signature over a (distinct) shingle-hash array: element k of
  * the result is `min over shingles s of xxhash64(s, seed = k)`. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val s = sh.getLong(i)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashLong(s, k)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: one xxhash64 per token, then the
  * usual signed bit-count vote. */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private final val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    while (i < toks.numElements()) {
      val h = XXH64.hashUTF8String(toks.getUTF8String(i), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashFunctions {
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Distinct word-n-gram shingle hashes of a token-array column. */
  def shingleHash(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash(expr(tokens), n))

  /** MinHash signature (array<long> of length `numHashes`) of a
    * shingle-hash array column. */
  def minHashSignature(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(expr(shingleHashes), numHashes))

  /** 64-bit SimHash of a token-array column. */
  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(expr(tokens)))
}
