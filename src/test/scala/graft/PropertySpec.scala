package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MinRollingHash

/** Property-based invariants for the deterministic building blocks —
  * the properties the 100 TB story leans on (bit-stability under
  * partitioning, hash/fingerprint laws). Uses scalacheck generators
  * with fixed seeds (deterministic CI).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("rolling-hash fingerprint: suffix extension can only lower the min") {
    val pairs = samples(
      for {
        a <- Gen.alphaNumStr.suchThat(_.length >= 16)
        b <- Gen.alphaNumStr
      } yield (a, b), 60)
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val fa = MinRollingHash.minHash(a.getBytes("UTF-8"), 16)
      val fab = MinRollingHash.minHash((a + b).getBytes("UTF-8"), 16)
      assert(fab <= fa, s"a=$a b=$b") // all windows of a are windows of a+b
    }
  }

  test("rolling-hash: a shared 16-byte window bounds both documents' minima") {
    samples(Gen.alphaStr.suchThat(_.length >= 16), 60).foreach { shared =>
      val w = shared.take(16)
      val h = MinRollingHash.minHash(w.getBytes("UTF-8"), 16)
      assert(MinRollingHash.minHash(("XX" + w + "YY").getBytes("UTF-8"),
        16) <= h)
    }
  }

  test("decimal-exact aggregates are invariant under repartitioning") {
    val base = graft.sources.Tables.table(spark, sf, "lineitem")
    def total(parts: Int): String =
      (if (parts == 0) base else base.repartition(parts))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("string"))
        .head().getString(0)
    val expect = total(0)
    samples(Gen.chooseNum(1, 17), 5).foreach { p =>
      assert(total(p) == expect, s"parts=$p")
    }
  }

  test("surrogate keys are injective on the natural key encoding") {
    import spark.implicits._
    val xs = samples(Gen.alphaNumStr, 200).distinct
    val keys = xs.toDF("k")
      .select(operators.StarSchema.surrogateKey(col("k")).as("id"))
      .collect().map(_.getString(0)).toSet
    assert(keys.size == xs.size)
  }

  test("vector_dot equals a scala-fold reference on random vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    val cases = samples(for { a <- gen; b <- gen } yield (a, b), 40)
    val df = cases.map { case (a, b) => (a.toArray, b.toArray) }
      .toDF("a", "b")
    val got = df.select(graft.plans.VectorDot.vector_dot(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      val expect = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      assert(g == expect)
    }
  }
}
