package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Catalog-resolved partition-transform FUNCTIONS (`bucket`, `days`, `truncate`) —
  * what Spark binds when a manifest write requests CLUSTERED distribution over a
  * hidden transform (RequiresDistributionAndOrdering): the shuffle key is the
  * transform value itself, computed by the ONE PartTransforms definition the writer
  * and the scan's pruning share, so "rows that cluster together" is exactly "rows
  * that land in the same file". Null sources map to a constant key (the writer then
  * rejects them loudly — clustering never masks the error).
  *
  * Only determinism matters for clustering correctness; sharing the writer's exact
  * definition additionally makes one shuffled task own each partition tuple.
  */
private[sources] object PartitionTransformFunctions {

  /** bucket(n, col): murmur3 bucket of the canonical key bytes, n-way. */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): murmur3 bucket of the partition source value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket(n, col) takes 2 arguments, got ${inputType.simpleString}")
      val keyType = inputType.fields(1).dataType
      require(Seq(LongType, IntegerType, StringType).contains(keyType),
        s"bucket source must be long|int|string, got $keyType")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = "graft.bucket"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0) || input.isNullAt(1)) return 0
          val n = input.getInt(0)
          keyType match {
            case LongType => ManifestTables.PartTransforms.bucketLong(input.getLong(1), n)
            case IntegerType =>
              ManifestTables.PartTransforms.bucketLong(input.getInt(1).toLong, n)
            case _ =>
              ManifestTables.PartTransforms.bucketString(input.getUTF8String(1).toString, n)
          }
        }
      }
    }
  }

  /** days(ts): UTC epoch day of a timestamp (micros). */
  object DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String = "days(ts): UTC epoch day of a timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"days(ts) takes 1 argument, got ${inputType.simpleString}")
      val srcType = inputType.fields.head.dataType
      require(srcType == TimestampType || srcType == TimestampNTZType,
        s"days source must be a timestamp, got $srcType")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "days"
        override def canonicalName(): String = "graft.days"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0)) return 0
          ManifestTables.PartTransforms.epochDayOfMicros(input.getLong(0)).toInt
        }
      }
    }
  }

  /** hours(ts): whole hours since epoch of a timestamp (micros). */
  object HoursUnbound extends UnboundFunction {
    override def name(): String = "hours"
    override def description(): String = "hours(ts): whole hours since epoch of a timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"hours(ts) takes 1 argument, got ${inputType.simpleString}")
      val srcType = inputType.fields.head.dataType
      require(srcType == TimestampType || srcType == TimestampNTZType,
        s"hours source must be a timestamp, got $srcType")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "hours"
        override def canonicalName(): String = "graft.hours"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0)) return 0
          ManifestTables.PartTransforms.epochHourOfMicros(input.getLong(0)).toInt
        }
      }
    }
  }

  /** months(ts): months since epoch of a timestamp (micros). */
  object MonthsUnbound extends UnboundFunction {
    override def name(): String = "months"
    override def description(): String = "months(ts): months since epoch of a timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"months(ts) takes 1 argument, got ${inputType.simpleString}")
      val srcType = inputType.fields.head.dataType
      require(srcType == TimestampType || srcType == TimestampNTZType,
        s"months source must be a timestamp, got $srcType")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "months"
        override def canonicalName(): String = "graft.months"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0)) return 0
          ManifestTables.PartTransforms.epochMonthOfMicros(input.getLong(0)).toInt
        }
      }
    }
  }

  /** years(ts): years since epoch of a timestamp (micros). */
  object YearsUnbound extends UnboundFunction {
    override def name(): String = "years"
    override def description(): String = "years(ts): years since epoch of a timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"years(ts) takes 1 argument, got ${inputType.simpleString}")
      val srcType = inputType.fields.head.dataType
      require(srcType == TimestampType || srcType == TimestampNTZType,
        s"years source must be a timestamp, got $srcType")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "years"
        override def canonicalName(): String = "graft.years"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0)) return 0
          ManifestTables.PartTransforms.epochYearOfMicros(input.getLong(0)).toInt
        }
      }
    }
  }

  /** truncate(w, col): w-char prefix of a string. */
  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String = "truncate(w, col): w-char prefix of a string"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate(w, col) takes 2 arguments, got ${inputType.simpleString}")
      require(inputType.fields(1).dataType == StringType,
        s"truncate source must be string, got ${inputType.fields(1).dataType}")
      new ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
        override def resultType(): DataType = StringType
        override def name(): String = "truncate"
        override def canonicalName(): String = "graft.truncate"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow)
            : org.apache.spark.unsafe.types.UTF8String = {
          if (input.isNullAt(0) || input.isNullAt(1))
            return org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
          org.apache.spark.unsafe.types.UTF8String.fromString(
            ManifestTables.PartTransforms.truncString(
              input.getUTF8String(1).toString, input.getInt(0)))
        }
      }
    }
  }

  val all: Map[String, UnboundFunction] = Map(
    "bucket" -> BucketUnbound, "days" -> DaysUnbound, "hours" -> HoursUnbound,
    "months" -> MonthsUnbound, "years" -> YearsUnbound, "truncate" -> TruncateUnbound)
}
