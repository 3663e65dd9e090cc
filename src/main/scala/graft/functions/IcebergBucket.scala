package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg `bucket[N]` as a native Catalyst expression with codegen:
  * `(icebergHash(value) & Int.MaxValue) % N` (SURVEY §2.8 T7; reference
  * applies PyIceberg's BucketTransform, `partition_builder.py:255-256`).
  *
  * Codegen calls the static hash directly, so bucket computation stays
  * inside whole-stage codegen on the write path instead of falling back to
  * interpreted eval per row.
  */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | StringType | _: DecimalType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bucket transform does not support ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hash = child.dataType match {
      case ByteType => IcebergHash.hashLong(input.asInstanceOf[Byte].toLong)
      case ShortType => IcebergHash.hashLong(input.asInstanceOf[Short].toLong)
      case IntegerType | DateType => IcebergHash.hashLong(input.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergHash.hashLong(input.asInstanceOf[Long])
      case StringType => IcebergHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)
      case _: DecimalType =>
        IcebergHash.hashDecimal(input.asInstanceOf[Decimal].toJavaBigDecimal)
    }
    (hash & Integer.MAX_VALUE) % numBuckets
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the object's static forwarders (janino cannot resolve the Scala
    // MODULE$ field through the forwarder class — referencing it made
    // every bucket-staging stage silently fall back to interpreted eval)
    val hashCls = IcebergHash.getClass.getName.stripSuffix("$")
    val hashCall = child.dataType match {
      case ByteType | ShortType | IntegerType | DateType =>
        (v: String) => s"$hashCls.hashLong((long) $v)"
      case LongType | TimestampType | TimestampNTZType =>
        (v: String) => s"$hashCls.hashLong($v)"
      case StringType =>
        (v: String) => s"$hashCls.hashBytes($v.getBytes())"
      case _: DecimalType =>
        (v: String) => s"$hashCls.hashDecimal($v.toJavaBigDecimal())"
    }
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (${hashCall(v)} & Integer.MAX_VALUE) % $numBuckets;")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)

  override def prettyName: String = "iceberg_bucket"
}

object IcebergBucket {
  /** Column-level entry point: `IcebergBucket(10, $"user_id")`. Resolves
    * through the session FunctionRegistry — call
    * [[GraftFunctions.register]] on the session first. */
  def apply(numBuckets: Int, col: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "iceberg_bucket", col, org.apache.spark.sql.functions.lit(numBuckets))
}
