package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object RollingHashUtil {
  final val Mod = 1000000007L
  final val Mult = 31L

  /** Polynomial rolling hash over UNICODE CODE POINTS: h = fold(h * 31 + cp) mod 1e9+7.
    * Code points (not UTF-16 units or bytes) so the definition is representation-
    * independent and reproducible in any engine with code-point access.
    */
  def hash(u: UTF8String): Long = {
    val s = u.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** rolling_hash(text STRING) -> LONG: deterministic document fingerprint.
  *
  * Unlike the FM expressions (CodegenFallback, justified: their inner loop runs over an
  * opaque deserialized index), this one participates in WHOLE-STAGE CODEGEN — doGenCode
  * emits a direct static call, so the expression fuses into the surrounding generated
  * stage with no boxing or interpreted-eval bridge. Pattern for any hot scalar kernel.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {

  def rolling_hash(text: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("rolling_hash", text)
  }

  /** SQL registration: SELECT rolling_hash(text) FROM docs. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs(0)), "scala_udf")
}
