package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-sketch kernels as native Catalyst expressions.
  *
  * The column-function spellings of SimHash/MinHash (64 `aggregate` calls,
  * 32 `transform` passes) re-traverse the token array per bit/permutation —
  * O(64·T) expression-tree evaluations per document. These expressions do the
  * identical math in a single tight loop per row: tokenize once, hash each
  * token once, update all lanes in registers. At sf0.1 this cut simhash from
  * ~14 s to well under a second; at 100 TB it is the difference between a
  * CPU-bound scan and an unusable one.
  *
  * Hashing uses Spark's own XxHash64 kernel (seed 42, matching
  * `functions.xxhash64`) so results are stable across the engine.
  */
object TextSketches {

  private[expressions] val Prime = 2147483629L // largest prime < 2^31

  /** The sketch modulus, exposed so operators can hash shingles the same
    * way the kernels do (stoplists, diagnostics). */
  val SketchPrime: Long = Prime

  private[expressions] def tokenize(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private[expressions] def hashToken(t: String): Long =
    XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)

  /** Static kernel targeted by generated code (and nullSafeEval): one pass,
    * no Catalyst boxing.
    */
  def simhashKernel(input: UTF8String): Long = {
    val counts = new Array[Int](64)
    val toks = tokenize(input.toString)
    var i = 0
    while (i < toks.length) {
      val h = hashToken(toks(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Static kernel for minhash signatures; perms passed as flat
    * [a0,b0,a1,b1,…]. `stopSorted` (sorted shingle hashes, possibly empty)
    * excludes boilerplate shingles from the signature: on a corpus where
    * most docs share a header/footer, the hot shingles dominate every
    * lane's min and unrelated docs collide in every band — stopping them
    * restores the signature's discriminative power (candidate pruning
    * only; the exact-Jaccard verify still sees full shingle sets).
    */
  def minhashKernel(
      input: UTF8String,
      shingleWidth: Int,
      permsFlat: Array[Long],
      stopSorted: Array[Long]
  ): GenericArrayData = {
    val nPerms = permsFlat.length / 2
    val toks = tokenize(input.toString)
    val shingles: Iterator[String] =
      if (toks.length < shingleWidth) Iterator(toks.mkString(" "))
      else toks.sliding(shingleWidth).map(_.mkString(" "))
    val mins = Array.fill(nPerms)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    while (shingles.hasNext) {
      val s = shingles.next()
      if (seen.add(s)) {
        val h = java.lang.Math.floorMod(hashToken(s), Prime)
        if (stopSorted.length == 0 || java.util.Arrays.binarySearch(stopSorted, h) < 0) {
          var i = 0
          while (i < nPerms) {
            val v = java.lang.Math.floorMod(permsFlat(2 * i) * h + permsFlat(2 * i + 1), Prime)
            if (v < mins(i)) mins(i) = v
            i += 1
          }
        }
      }
    }
    new GenericArrayData(mins)
  }

  /** Static kernel for the rolling-hash document fingerprint: polynomial
    * hash over tokens mod a 31-bit prime — identical math to the
    * `aggregate` HOF spelling in TextFunctions.fingerprintHof (kept for the
    * equivalence spec), but one pass with no per-element expression
    * evaluation (the HOF cost 6 s / 5k docs in BENCH_r01).
    */
  def fingerprintKernel(input: UTF8String): Long = {
    val toks = tokenize(input.toString)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc = java.lang.Math.floorMod(
        acc * 31L + java.lang.Math.floorMod(hashToken(toks(i)), Prime), Prime)
      i += 1
    }
    acc
  }

  /** Static kernel for distinct word w-shingles: one tokenize pass, one
    * rolling StringBuilder per shingle, LinkedHashSet dedup (first-
    * occurrence order — matching what array_distinct over the transform
    * spelling produced). The columnar spelling (transform + slice +
    * array_join per position, then array_distinct) allocates an array and
    * re-joins strings per shingle position; this is the dominant cost of
    * the shingle-verify joins at corpus scale.
    */
  def shinglesKernel(input: UTF8String, w: Int): GenericArrayData = {
    val toks = tokenize(input.toString)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < w) out.add(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - w) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  /** Column API: 64-bit SimHash of whitespace-tokenized text. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** Column API: distinct word w-shingles (array<string>). */
  def shingleSet(text: Column, w: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), w))

  /** Column API: rolling-hash fingerprint (order-sensitive, whitespace-
    * normalized). */
  def fingerprint64(text: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(text)))

  /** Column API: MinHash signature (array<long> of length nPerms) over
    * distinct word w-shingles; `stopHashes` are shingle hashes (mod Prime)
    * to exclude (see [[Dedup.hotShingleHashes]]).
    */
  def minhashSignature(text: Column, nPerms: Int = 32, shingleWidth: Int = 3,
      seed: Long = 42L, stopHashes: Array[Long] = Array.empty): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(text), nPerms, shingleWidth, seed, stopHashes))
}

/** bit j of result = sign of Σ_tokens(±1 per bit j of xxhash64(token)).
  * Codegen emits a direct static-kernel call, so the expression stays inside
  * WholeStageCodegen (no interpreted fallback, no InternalRow boxing).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    TextSketches.simhashKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextSketches.simhashKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** sig[i] = min over distinct word-shingles s of (a_i·h(s) + b_i) mod p,
  * with h(s) = xxhash64(s) mod p. Texts shorter than `shingleWidth` words
  * contribute their whole normalized text as the single shingle.
  */
case class MinHashSig(child: Expression, nPerms: Int, shingleWidth: Int, seed: Long,
    stopHashes: Array[Long] = Array.empty)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  // deterministic permutation params, flat [a0,b0,a1,b1,…], same scheme
  // across the engine
  @transient private lazy val permsFlat: Array[Long] = MinHashSig.permsFlat(nPerms, seed)
  @transient private lazy val stopSorted: Array[Long] = stopHashes.sorted

  override def nullSafeEval(input: Any): Any =
    TextSketches.minhashKernel(input.asInstanceOf[UTF8String], shingleWidth, permsFlat, stopSorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val permsRef = ctx.addReferenceObj("permsFlat", permsFlat, "long[]")
    val stopRef = ctx.addReferenceObj("stopSorted", stopSorted, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextSketches.minhashKernel($c, $shingleWidth, $permsRef, $stopRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Distinct word w-shingles of whitespace-tokenized text; texts shorter
  * than w words contribute their whole normalized text as the single
  * shingle (same contract as the minhash kernel's shingling).
  */
case class ShingleSet(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override def nullSafeEval(input: Any): Any =
    TextSketches.shinglesKernel(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextSketches.shinglesKernel($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** acc_{i+1} = (31·acc_i + (xxhash64(token_i) mod p)) mod p over tokens in
  * order; empty text → 0. Codegen calls the static kernel directly, so the
  * scan stays one WholeStageCodegen span.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override def nullSafeEval(input: Any): Any =
    TextSketches.fingerprintKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextSketches.fingerprintKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object MinHashSig {
  def permsFlat(nPerms: Int, seed: Long): Array[Long] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPerms)(Array(1L + rng.nextInt(Int.MaxValue - 1).toLong,
      rng.nextInt(Int.MaxValue).toLong)).flatten
  }
}
