package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen expressions for the MinHash-LSH dedup path.
  *
  * The `functions._` formulation (transform+slice+concat_ws for
  * shingles, 32 × array_min(transform(xxhash64)) for signatures) is
  * correct but every lambda runs interpreted per element — measured
  * 14s for 50k docs at sf0.1. These two expressions do the same work
  * as single tight Java loops (one per doc), keeping the whole dedup
  * map stage inside WholeStageCodegen.
  */
object TextExprs {

  /** Distinct k-word shingles of a token array (insertion order).
    * Mirrors Dedup.shingles semantics: fewer than k tokens → one
    * shingle of the whole token list. */
  case class WordShingles(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires array<string>, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      new GenericArrayData(TextExprs.shingleSet(toks, k).toArray())
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, toks => {
        val cls = TextExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"
        val set = ctx.freshName("set")
        s"""
           |java.util.LinkedHashSet $set = $cls.shingleSet($toks, $k);
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : WordShingles = copy(child = newChild)
  }

  /** Java-friendly shingle builder shared by eval and codegen. */
  def shingleSet(toks: ArrayData, k: Int): java.util.LinkedHashSet[UTF8String] = {
    val n = toks.numElements()
    val sep = UTF8String.fromString(" ")
    val set = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = toks.getUTF8String(i); i += 1 }
      set.add(UTF8String.concatWs(sep, parts: _*))
    } else {
      var s = 0
      while (s <= n - k) {
        val parts = new Array[UTF8String](k)
        var i = 0
        while (i < k) { parts(i) = toks.getUTF8String(s + i); i += 1 }
        set.add(UTF8String.concatWs(sep, parts: _*))
        s += 1
      }
    }
    set
  }

  /** Banded MinHash: numHashes permutation minima over the shingle
    * set, folded into bands XXH64 band hashes — one pass over the
    * shingles. Output: array<long> of length `bands`. */
  case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
      extends UnaryExpression {
    require(numHashes % bands == 0, "bands must divide numHashes")

    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"minhash_bands requires array<string>, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        TextExprs.minhashBands(
          input.asInstanceOf[ArrayData], numHashes, bands))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, sh => {
        val cls = TextExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $cls.minhashBands($sh, $numHashes, $bands));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : MinHashBands = copy(child = newChild)
  }

  /** One-pass banded minhash shared by eval and codegen: for each
    * shingle compute numHashes seeded XXH64 values, track minima;
    * band hash = XXH64 fold of the band's minima (seed = band idx). */
  def minhashBands(sh: ArrayData, numHashes: Int, bands: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = sh.numElements()
    var s = 0
    while (s < n) {
      val t = sh.getUTF8String(s)
      val base = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      var i = 0
      while (i < numHashes) {
        // per-permutation hash: remix the base hash with the seed —
        // one bytes-pass per shingle, numHashes long-mixes
        val h = XXH64.hashLong(base, i.toLong)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var i = b * r
      while (i < (b + 1) * r) {
        acc = XXH64.hashLong(mins(i), acc)
        i += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  def register(spark: SparkSession): Unit = {
    def asInt(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => WordShingles(exprs(0), asInt(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands",
      exprs => MinHashBands(exprs(0), asInt(exprs(1)), asInt(exprs(2))),
      "built-in")
  }

  def word_shingles(tokens: Column, k: Int): Column =
    call_function("word_shingles", tokens, lit(k))

  def minhash_bands(shingles: Column, numHashes: Int, bands: Int): Column =
    call_function("minhash_bands", shingles, lit(numHashes), lit(bands))
}
