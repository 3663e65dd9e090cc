package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, GenerateMutableProjection}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayDot, IcebergBucket, IcebergHash, QuantileCode}

/** Pins the CODEGEN path of the engine's custom Catalyst expressions.
  *
  * A codegen regression is invisible in result-level tests: Spark falls
  * back to interpreted eval silently and only performance degrades (this
  * actually happened — janino cannot resolve a Scala object's `MODULE$`
  * field through the static-forwarder class, so every bucket-staging
  * stage quietly dropped out of whole-stage codegen). These specs compile
  * the generated code directly, so the fallback becomes a test failure.
  *
  * sbt's layered test classloader is not visible to janino by default;
  * each compile runs with the context classloader pinned to the loader
  * that owns the graft classes, mirroring production (runMain/cluster)
  * classloading.
  */
class CodegenPinSpec extends AnyFunSuite {

  private def withGraftClassLoader[A](f: => A): A = {
    val prev = Thread.currentThread().getContextClassLoader
    Thread.currentThread().setContextClassLoader(IcebergHash.getClass.getClassLoader)
    try f
    finally Thread.currentThread().setContextClassLoader(prev)
  }

  test("bucket codegen calls the static forwarder, never MODULE$") {
    val ctx = new CodegenContext
    val code = IcebergBucket(BoundReference(0, StringType, nullable = true), 16)
      .genCode(ctx).code.toString
    assert(code.contains("graft.functions.IcebergHash.hashBytes"),
      s"expected a static-forwarder hash call in:\n$code")
    assert(!code.contains("MODULE$"),
      "MODULE$ reference would make janino reject the class and fall back to interpreted eval")
  }

  test("generated bucket projection compiles and matches interpreted eval (string)") {
    withGraftClassLoader {
      val expr = IcebergBucket(BoundReference(0, StringType, nullable = true), 16)
      // generate() compiles the code directly — a janino failure here is a
      // test failure, not a silent fallback
      val proj = GenerateMutableProjection.generate(Seq(expr))
      for (s <- Seq("", "a", "graft", "iceberg-bucket-transform", null)) {
        val row = InternalRow(if (s == null) null else UTF8String.fromString(s))
        val gen = proj(row)
        val interp = expr.eval(row)
        if (s == null) assert(gen.isNullAt(0) && interp == null)
        else assert(gen.getInt(0) == interp, s"codegen vs interpreted mismatch for '$s'")
      }
    }
  }

  test("generated bucket projection matches interpreted eval (long, int, decimal)") {
    withGraftClassLoader {
      val longExpr = IcebergBucket(BoundReference(0, LongType, nullable = true), 32)
      val intExpr = IcebergBucket(BoundReference(1, IntegerType, nullable = true), 32)
      val decExpr = IcebergBucket(BoundReference(2, DecimalType(18, 2), nullable = true), 32)
      val proj = GenerateMutableProjection.generate(Seq(longExpr, intExpr, decExpr))
      for (i <- Seq(0L, 1L, -1L, 1234567890123L)) {
        val row = InternalRow(i, i.toInt, Decimal(BigDecimal(i, 2), 18, 2))
        val gen = proj(row)
        assert(gen.getInt(0) == longExpr.eval(row))
        assert(gen.getInt(1) == intExpr.eval(row))
        assert(gen.getInt(2) == decExpr.eval(row))
      }
    }
  }

  test("graft_dot and graft_qcode generated projections compile and match eval") {
    withGraftClassLoader {
      val arrT = ArrayType(DoubleType, containsNull = false)
      val dot = ArrayDot(
        BoundReference(0, arrT, nullable = true),
        BoundReference(1, arrT, nullable = true))
      val qcode = QuantileCode(
        BoundReference(2, DoubleType, nullable = true), Seq(0.25, 0.5, 0.75))
      val proj = GenerateMutableProjection.generate(Seq(dot, qcode))
      val mk = (xs: Seq[Double]) =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)
      val row = InternalRow(mk(Seq(1.0, 2.0, 3.0)), mk(Seq(4.0, 5.0, 6.0)), 0.6)
      val gen = proj(row)
      assert(gen.getDouble(0) == dot.eval(row).asInstanceOf[Double])
      assert(gen.getInt(1) == qcode.eval(row).asInstanceOf[Int])
    }
  }
}
