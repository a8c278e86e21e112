package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BinaryExpression, Expression, ExpressionInfo, GreaterThan,
  GreaterThanOrEqual, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the fingerprint build + test (shared by the shard builders, the
  * interpreted eval, and the generated code — ONE definition so the builders and the
  * pruning rule can never drift out of sync).
  */
object AlphaFingerprint {

  /** 1024-bit char-presence fingerprint of a corpus: bit (c & 1023) set for every
    * UTF-16 unit c present. Used by DocShards.build and TranscriptPipeline.buildShards.
    */
  def build(corpus: Array[Char]): Array[Long] = {
    val bits = new Array[Long](16)
    var i = 0
    while (i < corpus.length) {
      val b = corpus(i) & 1023
      bits(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
    bits
  }
  /** True iff every UTF-16 unit of `pattern` has its (char & 1023) bit set in the
    * 1024-bit presence fingerprint. False guarantees the indexed corpus lacks some
    * pattern char, hence fm_count(shard, pattern) == 0 — the one-sided guarantee the
    * pruning rule relies on.
    */
  def mayContain(fp: Array[Long], pattern: String): Boolean = {
    var i = 0
    while (i < pattern.length) {
      val b = pattern.charAt(i) & 1023
      if ((fp(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** ArrayData overload for the Catalyst expression (no array materialization). */
  def mayContain(fp: ArrayData, pattern: UTF8String): Boolean = {
    val s = pattern.toString
    var i = 0
    while (i < s.length) {
      val b = s.charAt(i) & 1023
      if ((fp.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** alpha_may_contain(fp ARRAY<BIGINT>, pattern STRING) -> BOOLEAN. Codegen-native. */
case class AlphaMayContain(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "alpha_may_contain"
  override protected def nullSafeEval(fp: Any, pattern: Any): Any =
    AlphaFingerprint.mayContain(fp.asInstanceOf[ArrayData], pattern.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, p) => s"graft.functions.AlphaFingerprint.mayContain($f, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Optimizer rule: in a Filter whose condition requires `fm_count(shard, pat) > 0`
  * (or >= 1), and whose child exposes the shard table's `alpha_fp` fingerprint column
  * (ARRAY<BIGINT>, written next to `shard` by the graft shard builders), prepend the
  * cheap fingerprint test. Sound because alpha_may_contain == false implies some
  * pattern char is absent from the indexed corpus, so fm_count is 0 and the original
  * predicate already rejects the row — the rewrite only short-circuits the expensive
  * deserialize + backward-search path. The Catalyst analog of the reference's
  * unknown-symbol short-circuit (fm/FmIndex.java:457-459) lifted to plan level, and
  * the declarative twin of the pipeline's imperative mayContain guard in route().
  */
object FmFingerprintPruning extends Rule[LogicalPlan] {

  private def isFpType(t: org.apache.spark.sql.types.DataType): Boolean =
    t == ArrayType(LongType, containsNull = false) || t == ArrayType(LongType, containsNull = true)

  private def positiveGt(e: Expression): Boolean = e match {
    case Literal(v: Int, _) => v >= 0
    case Literal(v: Long, _) => v >= 0
    case _ => false
  }

  private def positiveGte(e: Expression): Boolean = e match {
    case Literal(v: Int, _) => v >= 1
    case Literal(v: Long, _) => v >= 1
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // SOUNDNESS SCOPE: guard only when the child exposes exactly ONE (shard,
      // alpha_fp) column pair, the fm_count's shard argument IS that column, AND both
      // attributes flow unaliased from the SAME leaf relation — name-only pairing
      // would let a same-named fingerprint from the other side of a join veto rows it
      // says nothing about. A filter above a self-join sees two pairs (ambiguous row
      // provenance), so the rule steps aside there too.
      val shards = child.output.filter(_.name == "shard")
      val fps = child.output.collect {
        case a: AttributeReference if a.name == "alpha_fp" && isFpType(a.dataType) => a
      }
      def sameLeaf = child.collectLeaves().exists(l =>
        l.outputSet.contains(shards.head) && l.outputSet.contains(fps.head))
      if (shards.size != 1 || fps.size != 1 || !sameLeaf) f
      else {
        val fp = fps.head
        // NULL-SAFE GUARD: alpha_fp reads as nullable from parquet; a bare
        // And(AlphaMayContain(fp, p), cmp) is null when fp is null, silently dropping
        // rows whose fm_count predicate is true. Or(IsNull(fp), test) keeps the
        // rewrite a pure short-circuit: unknown fingerprint = no pruning.
        def guard(pattern: Expression): Expression =
          Or(IsNull(fp), AlphaMayContain(fp, pattern))
        var changed = false
        val guarded = cond.transformUp {
          // fm_count(shard, p) > n (n >= 0)  /  fm_count(shard, p) >= n (n >= 1)
          case cmp @ GreaterThan(fc: FmCount, n)
              if positiveGt(n) && fc.left.semanticEquals(shards.head) =>
            changed = true; And(guard(fc.right), cmp)
          case cmp @ GreaterThanOrEqual(fc: FmCount, n)
              if positiveGte(n) && fc.left.semanticEquals(shards.head) =>
            changed = true; And(guard(fc.right), cmp)
        }
        // Idempotence is enforced by the exists() check below, NOT by the patterns:
        // a guarded And(alpha_may_contain, fm_count > 0) still re-matches its inner
        // comparison on a second pass, so without the check guards would stack.
        // All-or-nothing is deliberate: a condition already containing any
        // AlphaMayContain (rule-injected or user-written) is left untouched.
        if (changed && !cond.exists(_.isInstanceOf[AlphaMayContain])) Filter(guarded, child)
        else f
      }
  }
}

/** Session-extension entry point: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) registers every graft Catalyst
  * function permanently for the session AND injects the fingerprint pruning rule —
  * the deployment surface for clusters where jobs are plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String): ExpressionInfo = new ExpressionInfo("graft", name)
    e.injectFunction((FunctionIdentifier("fm_count"), info("fm_count"),
      (exprs: Seq[Expression]) => FmCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("fm_extract"), info("fm_extract"),
      (exprs: Seq[Expression]) => FmExtract(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("fm_locate"), info("fm_locate"),
      (exprs: Seq[Expression]) => FmLocateGen(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("rolling_hash"), info("rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs(0))))
    e.injectFunction((FunctionIdentifier("alpha_may_contain"), info("alpha_may_contain"),
      (exprs: Seq[Expression]) => AlphaMayContain(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => FmFingerprintPruning)
  }
}

object GraftExtensions {
  /** Install the pruning rule into an ALREADY-RUNNING session (the extensions config
    * can only be set at session build time). Idempotent.
    */
  def installRules(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(FmFingerprintPruning))
      spark.experimental.extraOptimizations = cur :+ FmFingerprintPruning
  }
}
