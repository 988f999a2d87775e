package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_minhash(array<string> tokens, n, k) → array<long>`: the MinHash
 * signature of a document's token n-gram shingle set as ONE fused native
 * pass — shingles are assembled in place and each updates k running minima.
 *
 * Bit-exact to the reference formulation it replaces (spec-locked in
 * LlmSpec): shingle strings are
 * [[graft.llm.TextFunctions.shinglesFromTokens]]'s (n consecutive tokens
 * joined by `" "`; a document shorter than n tokens contributes ONE shingle
 * = all its tokens), and hash j of shingle s is Spark's
 * `xxhash64(lit(j), s)` — seed 42, int-hash of j chained into the UTF8
 * hash of s, via the same `XXH64` kernels Spark's expression uses. Min
 * over the shingle MULTISET equals min over the distinct set, so the
 * `array_distinct` of the reference pipeline is free here.
 *
 * Why native: the reference shape is `explode(array_distinct(transform(...)))`
 * + a k-column min aggregate — an interpreted HOF building one string per
 * shingle per row, a row explosion of ~|tokens| per document, and a
 * hash-aggregate carrying k longs per shingle row through partial
 * aggregation. This expression is a projection: no explosion, no aggregate,
 * no shuffle — the signature step of every MinHash operator
 * (near-duplicates, signature stores, incremental dedup) becomes map-only.
 *
 * Null contract: null input array → null; null TOKENS are skipped inside a
 * shingle (matching `concat_ws`, which drops nulls).
 */
final case class MinhashFromTokens(child: Expression, shingleN: Int, numHashes: Int)
  extends UnaryExpression {

  require(shingleN >= 1, s"shingle size must be >= 1: $shingleN")
  require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string> (tokens), got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    MinhashFromTokens.compute(a.asInstanceOf[ArrayData], shingleN, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call keeps the whole-stage codegen span intact; the loop
    // itself gains nothing from being inlined as generated Java
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.MinhashFromTokens.compute($w, $shingleN, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinhashFromTokens =
    copy(child = newChild)
}

/**
 * `graft_shingles(array<string> tokens, n, distinct) → array<string>`:
 * token n-gram shingles, natively — bit-exact to
 * `shinglesFromTokens(tokens, n)` (and, with `distinct`, to
 * `array_distinct` of it including first-occurrence order — LlmSpec lock),
 * with the short-document rule (fewer than n tokens → one shingle = the
 * whole document). The non-distinct form keeps multiplicity and order —
 * the n-gram LANGUAGE-MODEL shape (bigram counts need every occurrence).
 * Why native: the HOF formulation re-evaluates its child per element
 * access when no exchange materializes the token array first — a
 * pure-projection pipeline (the signature-store shape) would pay
 * O(tokens²) re-splitting per document.
 */
final case class ShinglesFromTokensExpr(child: Expression, shingleN: Int,
                                        distinct: Boolean)
  extends UnaryExpression {

  require(shingleN >= 1, s"shingle size must be >= 1: $shingleN")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string> (tokens), got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    ShinglesFromTokensExpr.compute(a.asInstanceOf[ArrayData], shingleN, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.ShinglesFromTokensExpr.compute($w, $shingleN, $distinct);")

  override protected def withNewChildInternal(
      newChild: Expression): ShinglesFromTokensExpr =
    copy(child = newChild)
}

object ShinglesFromTokensExpr {

  private val Sep = UTF8String.fromString(" ")

  /** Public static so generated code can call it by name. */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = tokens.numElements()
    val count = m - (n - 1)
    if (count <= 0) {
      val parts = new Array[UTF8String](m)
      var i = 0
      while (i < m) { parts(i) = tokens.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Sep, parts: _*)))
    } else if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < count) {
        var j = 0
        while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Sep, parts: _*)): Unit
        i += 1
      }
      new GenericArrayData(seen.toArray)
    } else {
      val out = new Array[Any](count)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < count) {
        var j = 0
        while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/**
 * `graft_char_shingles(text, n) → array<string>`: character n-gram shingles
 * of the space-trimmed text, natively — bit-exact to the HOF reference
 * `when(length(trim(t)) <= n, array(trim(t)))
 *  .otherwise(transform(sequence(1, len-(n-1)), i => trim(t).substr(i, n)))`
 * (r17 spec-locked in TextExpressionsSpec, unicode included).
 *
 * Why native (same O(len²) trap as [[ShinglesFromTokensExpr]], one level
 * lower): the HOF lambda re-evaluates `trim(text)` per ELEMENT, and even a
 * materialized string pays `substringSQL`'s from-the-start char scan per
 * shingle — quadratic in document length either way. This pass walks the
 * trimmed bytes once, records each character's byte offset, and slices
 * every shingle as a byte-range copy: O(len·n) total. Measured 1.9 s →
 * sub-0.3 s on q_text_jaccard's single-task shingle job at sf0.1.
 */
final case class CharShinglesExpr(child: Expression, shingleN: Int)
  extends UnaryExpression {

  require(shingleN >= 1, s"shingle size must be >= 1: $shingleN")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_shingles requires a string column, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(a: Any): Any =
    CharShinglesExpr.compute(a.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharShinglesExpr.compute($t, $shingleN);")

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpr =
    copy(child = newChild)
}

object CharShinglesExpr {

  def apply(text: Column, shingleN: Int): Column =
    Shims.column(new CharShinglesExpr(Shims.expression(text), shingleN))

  /** Public static so generated code can call it by name. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val t = text.trim() // the reference's trim(): ASCII-space only
    val bytes = t.getBytes
    // byte offset of every character start (+ terminal), one pass
    val charStarts = new java.util.ArrayList[Integer](bytes.length + 1)
    var b = 0
    while (b < bytes.length) {
      charStarts.add(b)
      b += UTF8String.numBytesForFirstByte(bytes(b))
    }
    charStarts.add(bytes.length)
    val len = charStarts.size() - 1 // numChars
    val count = len - (n - 1)
    if (count <= 0) return new GenericArrayData(Array[Any](t))
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val from = charStarts.get(i)
      val to = charStarts.get(i + n)
      out(i) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, to))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-level constructors for the shingle expression. */
object DistinctShinglesFromTokens {
  def apply(tokens: Column, shingleN: Int): Column =
    Shims.column(ShinglesFromTokensExpr(Shims.expression(tokens), shingleN,
      distinct = true))
}

object AllShinglesFromTokens {
  def apply(tokens: Column, shingleN: Int): Column =
    Shims.column(ShinglesFromTokensExpr(Shims.expression(tokens), shingleN,
      distinct = false))
}

object MinhashFromTokens {

  private val Sep = UTF8String.fromString(" ")

  /** Public static so generated code can call it by name. */
  def compute(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = XXH64.hashInt(j, 42L); j += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    def hashShingle(s: UTF8String): Unit = {
      var j = 0
      while (j < k) {
        val h = XXH64.hashUTF8String(s, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    val m = tokens.numElements()
    val count = m - (n - 1)
    if (count <= 0) {
      val parts = new Array[UTF8String](m)
      var i = 0
      while (i < m) { parts(i) = tokens.getUTF8String(i); i += 1 }
      hashShingle(UTF8String.concatWs(Sep, parts: _*))
    } else {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < count) {
        var j = 0
        while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        hashShingle(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Column-level constructor. */
  def apply(tokens: Column, shingleN: Int, numHashes: Int): Column =
    Shims.column(MinhashFromTokens(Shims.expression(tokens), shingleN, numHashes))
}
