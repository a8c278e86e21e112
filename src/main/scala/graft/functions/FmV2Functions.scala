package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructType}

/** `fm_count` as a DataSource V2 CATALOG function (FunctionCatalog surface) — the
  * piece that makes FM filters *query-driven at the source*: a SQL predicate
  * `cat.fm_count(shard, 'p') > 0` resolves to an ApplyFunctionExpression, which
  * Catalyst's V2ExpressionBuilder translates to a `UserDefinedScalarFunc` V2
  * predicate, which the manifest scan builder (SupportsPushDownV2Filters) recognizes
  * by canonical name and turns into FINGERPRINT FILE PRUNING — no optimizer rule, no
  * helper API, just the WHERE clause. Evaluation (the residual post-scan re-check)
  * runs through produceResult on the same ShardCache + FmIndex backward search the
  * Catalyst expression uses, so both surfaces answer identically.
  */
object FmCountV2 extends UnboundFunction {
  /** The identity the V2 pushdown matches on — name() alone is display-only. */
  val CanonicalName = "graft.fm_count"

  override def name(): String = "fm_count"
  override def description(): String =
    "fm_count(shard BINARY, pattern STRING) -> INT: overlapping occurrences of the " +
      "pattern in the corpus indexed by the serialized FM shard"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == BinaryType &&
      inputType.fields(1).dataType == StringType,
      s"fm_count expects (BINARY, STRING), got ${inputType.simpleString}")
    Bound
  }

  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(BinaryType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "fm_count"
    override def canonicalName(): String = CanonicalName
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val fm = ShardCache.get(input.getBinary(0))
      Int.box(fm.count(input.getUTF8String(1).toString.toCharArray))
    }
  }
}
