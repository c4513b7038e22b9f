package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native codegen vector expressions for the similarity/ANN operators.
  *
  * The pure-`functions._` formulation (`aggregate(zip_with(a,b,*))`)
  * is semantically identical but runs interpreted lambdas per element
  * (higher-order functions don't codegen), allocating a boxed Double
  * per multiply. These expressions compile to a tight Java loop over
  * the unsafe array data — the difference between O(seconds) and
  * O(minutes) for brute-force cosine over 50k × 64-dim vectors, and
  * the reason ANN stays CPU-bound rather than allocation-bound at
  * 100 TB. Accumulation is left-to-right in double — bit-identical to
  * the HOF version and to the DuckDB oracle.
  */
object VectorExprs {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  /** Dot product of two array<float|double> columns → double. */
  case class ArrayDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult =
      (elemType(left.dataType), elemType(right.dataType)) match {
        case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"array_dot requires array<float|double> args, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }

    private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val lt = elemType(left.dataType).get
      val rt = elemType(right.dataType).get
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += get(a, i, lt) * get(b, i, rt)
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        def getter(t: DataType, arr: String, i: String) = t match {
          case FloatType => s"(double) $arr.getFloat($i)"
          case _ => s"$arr.getDouble($i)"
        }
        val lt = elemType(left.dataType).get
        val rt = elemType(right.dataType).get
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${getter(lt, a, i)} * ${getter(rt, b, i)};
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArrayDot =
      copy(left = newLeft, right = newRight)
  }

  /** Random-hyperplane sign-bit buckets for multi-table LSH: one
    * bucket id per table, each from `nBits` pseudo-random projections.
    * Hyperplane component r(i,j) for dim i, global bit j is derived
    * from XXH64 — deterministic across executors, no RNG state, no
    * broadcast of a projection matrix. Output: array<long> of length
    * nTables. */
  case class LshBuckets(child: Expression, nBits: Int, nTables: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      elemType(child.dataType) match {
        case Some(_) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets requires array<float|double>, got " +
            child.dataType.simpleString)
      }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val t = elemType(child.dataType).get
      val total = nBits * nTables
      val proj = new Array[Double](total)
      val n = v.numElements()
      var i = 0
      while (i < n) {
        val vi = t match {
          case FloatType => v.getFloat(i).toDouble
          case _ => v.getDouble(i)
        }
        var j = 0
        while (j < total) {
          proj(j) += vi * LshBuckets.component(i, j)
          j += 1
        }
        i += 1
      }
      val out = new Array[Long](nTables)
      var tb = 0
      while (tb < nTables) {
        var bucket = 0L
        var b = 0
        while (b < nBits) {
          if (proj(tb * nBits + b) >= 0) bucket |= (1L << b)
          b += 1
        }
        out(tb) = bucket
        tb += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val t = elemType(child.dataType).get
        val getV = t match {
          case FloatType => s"(double) $v.getFloat(i)"
          case _ => s"$v.getDouble(i)"
        }
        val cls = LshBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
        val total = nBits * nTables
        val proj = ctx.freshName("proj")
        val out = ctx.freshName("out")
        s"""
           |double[] $proj = new double[$total];
           |for (int i = 0; i < $v.numElements(); i++) {
           |  double vi = $getV;
           |  for (int j = 0; j < $total; j++) {
           |    $proj[j] += vi * $cls.component(i, j);
           |  }
           |}
           |long[] $out = new long[$nTables];
           |for (int t = 0; t < $nTables; t++) {
           |  long bucket = 0L;
           |  for (int b = 0; b < $nBits; b++) {
           |    if ($proj[t * $nBits + b] >= 0) bucket |= (1L << b);
           |  }
           |  $out[t] = bucket;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : LshBuckets = copy(child = newChild)
  }

  object LshBuckets {
    /** Pseudo-random hyperplane component in [-1, 1] for (dim, bit). */
    def component(i: Int, j: Int): Double =
      (java.lang.Math.floorMod(
        XXH64.hashLong((i.toLong << 32) | (j.toLong & 0xFFFFFFFFL), 42L),
        2000001L).toDouble / 1000000.0) - 1.0
  }

  /** Register both expressions in a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets", exprs => {
        def asInt(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        LshBuckets(exprs(0), asInt(exprs(1)), asInt(exprs(2)))
      }, "built-in")
  }

  def array_dot(a: Column, b: Column): Column =
    call_function("array_dot", a, b)

  def lsh_buckets(vec: Column, nBits: Int, nTables: Int): Column =
    call_function("lsh_buckets", vec, lit(nBits), lit(nTables))
}
