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
    * independent and reproducible in any engine with code-point access. Decodes the
    * code points straight from the UTF8String's UTF-8 bytes — no per-row String
    * allocation in the codegen'd hot path (input is valid UTF-8 by StringType
    * contract; TextExpressionsSpec checks parity with a String/codePointAt reference
    * over multi-byte and surrogate-pair inputs).
    */
  def hash(u: UTF8String): Long = {
    val n = u.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = u.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
      else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len) { cp = (cp << 6) | (u.getByte(i + k) & 0x3f); k += 1 }
      h = (h * Mult + cp) % Mod
      i += len
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
