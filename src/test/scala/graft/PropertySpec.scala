package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.types.TypeLattice
import graft.cast.CastValidator
import graft.schema.SchemaEvolution
import graft.partition.Transforms
import graft.functions.IcebergHash

/** Property-based invariants over the schema machinery and transforms. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic property driver over scalacheck Gens (scalatestplus is
    * not in the offline dependency set). */
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 300)(
      f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private val leafGen: Gen[DataType] = Gen.oneOf(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, BinaryType, DateType, TimestampType,
    TimestampNTZType, DecimalType(10, 2), DecimalType(38, 9))

  private val typeGen: Gen[DataType] = Gen.frequency(
    8 -> leafGen,
    1 -> leafGen.map(ArrayType(_, containsNull = true)),
    1 -> Gen.zip(leafGen, leafGen).map { case (k, v) => MapType(k, v) },
    1 -> Gen.listOfN(2, leafGen).map(ts => StructType(
      ts.zipWithIndex.map { case (t, i) => StructField(s"f$i", t) })))

  private def fieldsGen(n: Int): Gen[StructType] =
    Gen.listOfN(n, typeGen).map(ts => StructType(
      ts.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) }))

  test("normalize is idempotent") {
    forAll(typeGen) { t =>
      assert(TypeLattice.normalize(TypeLattice.normalize(t)) ==
        TypeLattice.normalize(t))
    }
  }

  test("canPromote is reflexive, and antisymmetric up to decimal equality") {
    forAll(typeGen) { t => assert(TypeLattice.canPromote(t, t)) }
    forAll2(leafGen, leafGen) { (a, b) =>
      if (TypeLattice.canPromote(a, b) && TypeLattice.canPromote(b, a))
        assert(a == b)
    }
  }

  test("identical schemas always validate safe and never evolve") {
    forAll(Gen.choose(1, 5).flatMap(fieldsGen)) { s =>
      assert(CastValidator.validateCast(s, s).isSafe)
      val r = SchemaEvolution.evolve(s, s)
      assert(!r.evolved && r.schema == s)
    }
  }

  test("evolution keeps every existing field and is idempotent") {
    val pair = for {
      base <- Gen.choose(1, 4).flatMap(fieldsGen)
      extra <- Gen.choose(0, 3)
      extraFields <- Gen.listOfN(extra, leafGen)
    } yield (base, StructType(base.fields ++ extraFields.zipWithIndex.map {
      case (t, i) => StructField(s"x$i", t)
    }))
    forAll(pair) { case (base, incoming) =>
      val r = SchemaEvolution.evolve(base, incoming)
      val names = r.schema.fieldNames.toSet
      assert(base.fieldNames.forall(names.contains))
      assert(incoming.fieldNames.forall(names.contains))
      // applying the same incoming schema again changes nothing
      val r2 = SchemaEvolution.evolve(r.schema, incoming)
      assert(!r2.evolved && r2.schema == r.schema)
    }
  }

  test("parseHint roundtrips parameterized transforms") {
    forAll2(Gen.oneOf("bucket", "truncate"), Gen.choose(1, 4096)) { (t, n) =>
      assert(Transforms.parseHint(s"$t[$n]") == ((t, Some(n))))
    }
    forAll(Gen.oneOf("year", "month", "day", "hour", "identity")) { t =>
      assert(Transforms.parseHint(t) == ((t, None)))
    }
  }

  test("iceberg hash is deterministic; bucket values stay in range") {
    forAll2(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 1024)) {
      (v, n) =>
        assert(IcebergHash.hashLong(v) == IcebergHash.hashLong(v))
        val b = (IcebergHash.hashLong(v) & Int.MaxValue) % n
        assert(b >= 0 && b < n)
    }
    forAll(Gen.alphaNumStr) { s =>
      assert(IcebergHash.hashString(s) == IcebergHash.hashString(s))
    }
  }

  test("int and long hashes agree on the shared value domain (spec rule)") {
    forAll(Gen.choose(Int.MinValue, Int.MaxValue)) { i =>
      assert(IcebergHash.hashInt(i) == IcebergHash.hashLong(i.toLong))
    }
  }

  test("KeyBloom never false-negatives; positions stay in range") {
    import graft.catalog.KeyBloom
    val keysGen = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(24))))
    forAll(keysGen, n = 100) { keys =>
      val words = Array.fill(KeyBloom.NumLongs)(0L)
      keys.foreach { k =>
        KeyBloom.positions(k).foreach { p =>
          assert(p >= 0 && p < KeyBloom.NumBits)
          words(p / 64) |= (1L << (p % 64))
        }
      }
      val b64 = KeyBloom.encode(words.toSeq)
      // membership of every inserted key is guaranteed (no false negatives)
      assert(keys.forall(KeyBloom.mightContain(b64, _)))
    }
  }

  test("canonical stat encoding orders like the native type") {
    import graft.write.Stager.canonicalKey
    // the pruner compares canonical strings numerically (compareTyped);
    // canonicalKey(long/date/timestamp) must preserve the source ordering
    forAll2(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)) { (a, b) =>
      val ca = canonicalKey(LongType, a).toLong
      val cb = canonicalKey(LongType, b).toLong
      assert(java.lang.Long.compare(ca, cb) == java.lang.Long.compare(a, b))
    }
    forAll2(Gen.choose(-100000, 100000), Gen.choose(-100000, 100000)) { (a, b) =>
      val da = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(a.toLong))
      val db = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(b.toLong))
      val ca = canonicalKey(DateType, da).toLong
      val cb = canonicalKey(DateType, db).toLong
      assert(java.lang.Long.compare(ca, cb) == Integer.compare(a, b))
    }
  }
}
