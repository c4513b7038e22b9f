package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch surface — the frequency twin of BloomExprs.
  *
  * A CM sketch answers "how often does key x occur" with one-sided
  * error: estimates NEVER undercount (each of `depth` rows adds the
  * key's true count plus non-negative collision noise; the min over
  * rows keeps the noise ≈ N/width). That one-sidedness is what makes
  * heavy-hitter queries exact at scale: keys whose estimate clears a
  * threshold are a SUPERSET of keys whose true count does, so an
  * exact count over just the candidates returns precisely GROUP BY
  * ... HAVING count >= T — without ever shuffling the long tail of
  * light keys (the 99%+ of distinct keys at 100 TB).
  *
  * Row hashes use the same Kirsch–Mitzenmacher double hashing as
  * BloomExprs (idx_i = (h + i·mix(h)) mod width), the estimate probe
  * is a codegen expression (sketch inlined as a literal, evaluated
  * inside the scan's generated code), and the aggregation buffer
  * merges by elementwise add — associative + commutative, so
  * map-side partial aggregation applies and the shuffle carries one
  * depth×width counter grid per map task.
  */
object CountMinExprs {

  /** Typed Aggregator building the sketch: input = xxhash64 of the
    * key; buffer = row-major depth×width counters; output = counters
    * packed big-endian into binary. */
  final class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Byte]] {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 16, s"width must be >= 16, got $width")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h != null) {
        val h1 = h.longValue()
        val h2 = BloomExprs.mix(h1)
        var i = 0
        while (i < depth) {
          val cell = i * width +
            java.lang.Math.floorMod(h1 + i.toLong * h2, width.toLong).toInt
          b(cell) += 1L
          i += 1
        }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(b.length * 8)
      b.foreach(bb.putLong)
      bb.array()
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Point estimate: min over the depth rows — never below the true
    * count. Codegen delegates to the shared `estimate` below. */
  case class CmEstimate(
      left: Expression, right: Expression, depth: Int, width: Int)
      extends BinaryExpression {

    override def dataType: DataType = LongType

    override def prettyName: String = "cm_estimate"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "cm_estimate requires (binary, bigint), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }

    override def nullSafeEval(sketch: Any, hash: Any): Any =
      java.lang.Long.valueOf(CmEstimate.estimate(
        sketch.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long],
        depth, width))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val cls = CmEstimate.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (s, h) =>
        s"${ev.value} = $cls.estimate($s, $h, $depth, $width);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CmEstimate =
      copy(left = newLeft, right = newRight)
  }

  object CmEstimate {
    /** Shared by interpreted eval and generated code. Bytes are the
      * big-endian packing of the row-major counter grid. */
    def estimate(bytes: Array[Byte], h: Long, depth: Int, width: Int)
        : Long = {
      // a sketch of the wrong geometry would silently mis-estimate
      // (breaking one-sidedness) — fail loudly instead
      require(bytes.length == depth * width * 8,
        s"sketch is ${bytes.length} bytes, expected depth*width*8 = " +
          s"${depth * width * 8} — depth/width must match the build")
      val h2 = BloomExprs.mix(h)
      var min = Long.MaxValue
      var i = 0
      while (i < depth) {
        val cell = i * width +
          java.lang.Math.floorMod(h + i.toLong * h2, width.toLong).toInt
        var v = 0L
        var b = 0
        val off = cell * 8
        while (b < 8) {
          v = (v << 8) | (bytes(off + b) & 0xFFL)
          b += 1
        }
        if (v < min) min = v
        i += 1
      }
      min
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_estimate", exprs => {
        def asInt(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        CmEstimate(exprs(0), exprs(1), asInt(exprs(2)), asInt(exprs(3)))
      }, "built-in")

  def cm_agg(hash: Column, depth: Int, width: Int): Column =
    udaf(new CountMinAgg(depth, width)).apply(hash)

  def cm_estimate(sketch: Column, hash: Column, depth: Int, width: Int)
      : Column =
    call_function("cm_estimate", sketch, hash,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))
}
