package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, UpdateSketch}
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Theta sketches (Apache DataSketches) as engine aggregates — the
  * SET-OPERATION member of the sketch-table family. HLL
  * (`operators/DistinctSketches`) answers "how many distinct in this
  * range" but cannot intersect; theta sketches support union AND
  * intersection with bounded error, so a persisted per-bucket theta
  * table answers "how many users active in range A were ALSO active
  * in range B" (retention / overlap — the audience-intersection
  * query) from ~KB sketch rows, never a raw two-range rescan.
  *
  * Same Aggregator lifecycle as [[KllExprs]] (live object per group,
  * serialized only at the exchange). Theta sketches are EXACT until
  * the retained-entry budget (~2^lgK entries; lgK=14 → 16k) and
  * estimate beyond it with ~1/√(2^lgK) relative error, so audits use
  * tolerance oracles (the a21 pattern).
  */
object ThetaExprs {

  /** lgK=14: exact to ~16k distinct per sketch, ~0.8% RSE beyond. */
  val DefaultLgK = 14

  /** Serializable carrier: a live update gadget for raw-key updates
    * plus an optional compact union image (an update sketch cannot
    * wrap a compact byte image, so after any merge/serialization
    * boundary the accumulated state lives in `mergedImage` and fresh
    * updates go into a new gadget; `result()` unions the two). */
  final class ThetaBuf(@transient var sketch: UpdateSketch)
      extends Serializable {
    var mergedImage: Array[Byte] = _
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = result()
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      sketch = UpdateSketch.builder().setLogNominalEntries(DefaultLgK).build()
      mergedImage = b
    }
    def result(): Array[Byte] = {
      if (mergedImage == null) sketch.compact().toByteArray
      else {
        val u = SetOperation.builder()
          .setLogNominalEntries(DefaultLgK).buildUnion()
        u.union(Sketch.heapify(Memory.wrap(mergedImage)))
        u.union(sketch.compact())
        u.getResult.toByteArray
      }
    }
  }

  private def newBuf(): ThetaBuf =
    new ThetaBuf(UpdateSketch.builder()
      .setLogNominalEntries(DefaultLgK).build())

  private def mergeBufs(a: ThetaBuf, b: ThetaBuf): ThetaBuf = {
    val u = SetOperation.builder()
      .setLogNominalEntries(DefaultLgK).buildUnion()
    u.union(Sketch.heapify(Memory.wrap(a.result())))
    u.union(Sketch.heapify(Memory.wrap(b.result())))
    val out = newBuf()
    out.mergedImage = u.getResult.toByteArray
    out
  }

  /** `theta_sketch_agg(key)`: one theta sketch over a long key column
    * (nulls skipped). */
  val thetaAgg: Aggregator[java.lang.Long, ThetaBuf, Array[Byte]] =
    new Aggregator[java.lang.Long, ThetaBuf, Array[Byte]] {
      override def zero: ThetaBuf = newBuf()
      override def reduce(b: ThetaBuf, v: java.lang.Long): ThetaBuf = {
        if (v != null) b.sketch.update(v.longValue())
        b
      }
      override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf =
        mergeBufs(a, b)
      override def finish(b: ThetaBuf): Array[Byte] = b.result()
      override def bufferEncoder: Encoder[ThetaBuf] =
        Encoders.javaSerialization[ThetaBuf]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `theta_union_agg(sketch)`: union pre-serialized sketches (the
    * range step over a persisted sketch table). */
  val thetaUnionAgg: Aggregator[Array[Byte], ThetaBuf, Array[Byte]] =
    new Aggregator[Array[Byte], ThetaBuf, Array[Byte]] {
      override def zero: ThetaBuf = newBuf()
      override def reduce(b: ThetaBuf, bytes: Array[Byte]): ThetaBuf = {
        if (bytes != null) {
          val u = SetOperation.builder()
            .setLogNominalEntries(DefaultLgK).buildUnion()
          u.union(Sketch.heapify(Memory.wrap(b.result())))
          u.union(Sketch.heapify(Memory.wrap(bytes)))
          b.mergedImage = u.getResult.toByteArray
          b.sketch.reset()
        }
        b
      }
      override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf =
        mergeBufs(a, b)
      override def finish(b: ThetaBuf): Array[Byte] = b.result()
      override def bufferEncoder: Encoder[ThetaBuf] =
        Encoders.javaSerialization[ThetaBuf]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `theta_intersect_estimate(a, b)`: estimated |A ∩ B| of two
    * serialized sketches — the overlap query HLL cannot answer. */
  case class ThetaIntersectEstimate(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "theta_intersect_estimate"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "theta_intersect_estimate requires (binary, binary), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val i = SetOperation.builder()
        .setLogNominalEntries(DefaultLgK).buildIntersection()
      i.intersect(Sketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])))
      i.intersect(Sketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
      java.lang.Double.valueOf(i.getResult.getEstimate)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent, like [[KllExprs.register]]. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("theta_intersect_estimate")) {
      spark.udf.register("theta_sketch_agg", udaf(thetaAgg))
      spark.udf.register("theta_union_agg", udaf(thetaUnionAgg))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "theta_intersect_estimate",
        exprs => ThetaIntersectEstimate(exprs(0), exprs(1)), "built-in")
    }

  def theta_sketch_agg(key: Column): Column =
    call_function("theta_sketch_agg", key)

  def theta_union_agg(sketch: Column): Column =
    call_function("theta_union_agg", sketch)

  def theta_intersect_estimate(a: Column, b: Column): Column =
    call_function("theta_intersect_estimate", a, b)
}
