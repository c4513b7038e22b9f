package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter runtime-filter surface (the semi-join pruning
  * technique every 100 TB engine needs: build a bit-set sketch over
  * the small side's join keys, broadcast it — kilobytes, not a hashed
  * relation — and drop probe rows that cannot match BEFORE they reach
  * the shuffle/join). No false negatives, so an exact join over the
  * survivors returns exactly the plain join's rows; false positives
  * only cost verify work, never correctness.
  *
  * Bit placement uses Kirsch–Mitzenmacher double hashing over the
  * key's xxhash64: bit_i = (h1 + i·h2) mod m — the standard public
  * construction (same scheme as Spark's own util.sketch.BloomFilter,
  * built here natively so membership tests stay inside whole-stage
  * codegen instead of going through a boxed UDF call).
  *
  * Reference behavior being served: the reference's exploration
  * queries filter facts by docket/agency subsets
  * (simple_iceberg_exploration.py:254-262); at its 2 GB scale an IN
  * list works — at 100 TB the subset lives on the other side of a
  * join and this is the shape that keeps the probe scan from
  * shuffling rows the join will discard.
  */
object BloomExprs {

  /** Number of 64-bit words for an m-bit filter. */
  private def words(numBits: Int): Int = (numBits + 63) >>> 6

  /** Second hash for double hashing: a murmur-style finalizer of h so
    * h1 and h2 are independent enough; forced odd so all k probes are
    * distinct mod a power-of-two m. */
  private[graft] def mix(h: Long): Long = {
    var x = h
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x | 1L
  }

  /** Set the k double-hashed bits of `h` in `bits` (m = bits.length*64). */
  private[graft] def setBits(bits: Array[Long], h: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64L
    val h2 = mix(h)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h + i.toLong * h2, m)
      bits((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }

  /** Typed Aggregator building the filter: input = xxhash64 of the
    * key, buffer = long[] bit-set (merge is wordwise OR — associative
    * and commutative, so the plan keeps map-side partial aggregation
    * and the shuffle carries one sketch per map task), output = the
    * bit-set packed big-endian into binary. */
  final class BloomAgg(numBits: Int, k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Byte]] {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

    override def zero: Array[Long] = new Array[Long](words(numBits))

    override def reduce(b: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h != null) setBits(b, h.longValue(), k)
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(b.length * 8)
      b.foreach(bb.putLong)
      bb.array()
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Membership probe: true iff all k double-hashed bits of `hash` are
    * set in the binary filter. Codegen: a short unrolled-by-loop bit
    * test over the byte array — stays inside whole-stage codegen on
    * the scan, which is the entire point (a boxed UDF here would
    * serialize every probe row). */
  case class BloomMightContain(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {

    override def dataType: DataType = BooleanType

    override def prettyName: String = "bloom_might_contain"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires (binary, bigint), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }

    override def nullSafeEval(bloom: Any, hash: Any): Any = {
      val bytes = bloom.asInstanceOf[Array[Byte]]
      val h = hash.asInstanceOf[Long]
      java.lang.Boolean.valueOf(
        BloomMightContain.test(bytes, h, k))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val cls = BloomMightContain.getClass.getName.stripSuffix("$") +
        "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (b, h) =>
        s"${ev.value} = $cls.test($b, $h, $k);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  object BloomMightContain {
    /** Bit test shared by interpreted eval and generated code. Bytes
      * are the big-endian packing of the long[] words (see finish). */
    def test(bytes: Array[Byte], h: Long, k: Int): Boolean = {
      val m = bytes.length.toLong * 8L
      if (m == 0L) return false
      val h2 = mix(h)
      var i = 0
      while (i < k) {
        val bit = java.lang.Math.floorMod(h + i.toLong * h2, m)
        val word = (bit >>> 6).toInt
        val inWord = bit & 63L
        // byte 0 holds word 0's MSBs (ByteBuffer putLong is big-endian)
        val byteIdx = word * 8 + (7 - (inWord >>> 3)).toInt
        if ((bytes(byteIdx) & (1 << (inWord & 7L).toInt)) == 0) return false
        i += 1
      }
      true
    }
  }

  /** m for a target false-positive rate: m = -n·ln(p)/ln(2)², rounded
    * up to a whole word. (Standard sizing formula.) */
  def optimalNumBits(expectedItems: Long, fpp: Double): Int = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val m = math.ceil(
      -expectedItems.toDouble * math.log(fpp) /
        (math.log(2.0) * math.log(2.0)))
    math.max(64, ((m.toLong + 63L) / 64L * 64L).min(Int.MaxValue.toLong).toInt)
  }

  /** k for given m and n: k = m/n·ln(2), clamped to [1, 16]. */
  def optimalK(numBits: Int, expectedItems: Long): Int =
    math.max(1, math.min(16,
      math.round(numBits.toDouble / expectedItems.toDouble * math.log(2.0))
        .toInt))

  /** Register `bloom_agg(hash, numBits, k)` (UDAF) and
    * `bloom_might_contain(bloom, hash, k)` (codegen expression). */
  def register(spark: SparkSession): Unit = {
    // one udaf instance per (numBits, k) would need parameterized
    // registration; register the common default and keep the typed
    // API (BloomJoin) as the parameterized path
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => {
        def asInt(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        BloomMightContain(exprs(0), exprs(1), asInt(exprs(2)))
      }, "built-in")
  }

  /** Aggregate Column building a bloom filter over a long hash
    * column. */
  def bloom_agg(hash: Column, numBits: Int, k: Int): Column =
    udaf(new BloomAgg(numBits, k)).apply(hash)

  def bloom_might_contain(bloom: Column, hash: Column, k: Int): Column =
    call_function("bloom_might_contain", bloom, hash,
      org.apache.spark.sql.functions.lit(k))
}
