package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string modulo the Mersenne prime
  * 2^31-1 — the document-fingerprint core, as a single codegen pass.
  *
  * Replaces the `aggregate(split(s, ''), …)` higher-order formulation:
  * that allocates a one-char UTF8String per character and runs an
  * interpreted lambda each — this walks the chars of one string in
  * generated Java. Same recurrence (acc·131 + code mod p), so the
  * fingerprint semantics (overflow-free, oracle-portable) carry over.
  */
case class TextHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_hash requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHash.roll(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = TextHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.roll($s.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): TextHash =
    copy(child = newChild)
}

object TextHash {
  final val Prime = 2147483647L

  def roll(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      acc = (acc * 131L + s.charAt(i).toLong) % Prime
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_hash", exprs => TextHash(exprs.head), "built-in")

  def text_hash(c: Column): Column = call_function("text_hash", c)
}
