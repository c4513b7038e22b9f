package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches (Apache DataSketches, shipped with Spark 4)
  * as engine aggregates — the mergeable-quantiles complement to the
  * HLL distinct tables (`operators/DistinctSketches`) and the
  * fixed-domain histograms (`operators/HistogramSketch`): KLL needs
  * NO a-priori [lo, hi) domain, guarantees a normalized RANK error
  * (~1.65% at k=200, with high probability), and its merge is
  * associative/commutative, so per-bucket sketches build map-side
  * partial and range queries union ~KB sketches instead of
  * rescanning raw rows.
  *
  * Built as typed `Aggregator`s (the `RevenueAgg` extension point):
  * `udaf(...)` wraps them in Catalyst's object-buffer aggregate, so
  * the live sketch object is updated per row in memory and
  * serialized only at the exchange — the same lifecycle Spark's own
  * datasketches HLL aggregates use. The buffer wrapper owns the
  * Java-serialization proxy (sketch → compact byte image).
  *
  * Determinism note: KLL compaction makes random coin flips, so the
  * ESTIMATE is not bit-stable across runs/partitionings — only the
  * rank-error CONTRACT is stable. Oracle queries must therefore pin
  * tolerance booleans (the a21 HLL pattern), never raw estimates;
  * exactness-critical paths keep `percentile`.
  */
object KllExprs {

  /** Sketch accuracy parameter: ε ≈ 1.65% normalized rank error. */
  val DefaultK = 200

  /** Serializable carrier for a live heap sketch. */
  final class KllBuf(@transient var sketch: KllDoublesSketch)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = sketch.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      sketch = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** `kll_sketch_agg(value)`: one KLL sketch over a double column
    * (nulls skipped, like every Spark aggregate). */
  val kllAgg: Aggregator[java.lang.Double, KllBuf, Array[Byte]] =
    new Aggregator[java.lang.Double, KllBuf, Array[Byte]] {
      override def zero: KllBuf =
        new KllBuf(KllDoublesSketch.newHeapInstance(DefaultK))
      override def reduce(b: KllBuf, v: java.lang.Double): KllBuf = {
        if (v != null) b.sketch.update(v.doubleValue())
        b
      }
      override def merge(a: KllBuf, b: KllBuf): KllBuf = {
        a.sketch.merge(b.sketch)
        a
      }
      override def finish(b: KllBuf): Array[Byte] = b.sketch.toByteArray
      override def bufferEncoder: Encoder[KllBuf] =
        Encoders.javaSerialization[KllBuf]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `kll_merge_agg(sketch)`: union pre-serialized sketches (the
    * range-query step over a persisted sketch table). */
  val kllMergeAgg: Aggregator[Array[Byte], KllBuf, Array[Byte]] =
    new Aggregator[Array[Byte], KllBuf, Array[Byte]] {
      override def zero: KllBuf =
        new KllBuf(KllDoublesSketch.newHeapInstance(DefaultK))
      override def reduce(b: KllBuf, bytes: Array[Byte]): KllBuf = {
        if (bytes != null)
          b.sketch.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
        b
      }
      override def merge(a: KllBuf, b: KllBuf): KllBuf = {
        a.sketch.merge(b.sketch)
        a
      }
      override def finish(b: KllBuf): Array[Byte] = b.sketch.toByteArray
      override def bufferEncoder: Encoder[KllBuf] =
        Encoders.javaSerialization[KllBuf]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `kll_quantile(sketch, rank)`: the estimated quantile at a
    * normalized rank in [0, 1]; NULL for an empty sketch. Scalar
    * extraction over the (few) merged rows — CodegenFallback is fine
    * here, the hot path is the aggregate. */
  case class KllQuantile(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "kll_quantile"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "kll_quantile requires (binary, double), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def nullSafeEval(bytes: Any, rank: Any): Any = {
      val sk = KllDoublesSketch.heapify(
        Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else java.lang.Double.valueOf(
        sk.getQuantile(rank.asInstanceOf[Double]))
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent: operator entry points call this defensively on every
    * invocation (UDAFs can't ride the extension injector, so unlike
    * the codegen expressions these must exist per session state), and
    * re-registering would spam "function replaced" warnings. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("kll_quantile")) {
      spark.udf.register("kll_sketch_agg", udaf(kllAgg))
      spark.udf.register("kll_merge_agg", udaf(kllMergeAgg))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "kll_quantile", exprs => KllQuantile(exprs(0), exprs(1)), "built-in")
    }

  def kll_sketch_agg(value: Column): Column =
    call_function("kll_sketch_agg", value)

  def kll_merge_agg(sketch: Column): Column =
    call_function("kll_merge_agg", sketch)

  def kll_quantile(sketch: Column, rank: Column): Column =
    call_function("kll_quantile", sketch, rank)
}
