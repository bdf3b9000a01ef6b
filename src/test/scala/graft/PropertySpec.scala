package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{FloatVecDot, MinHashSig, PolyCharFold, SrpBucket}

/** Property tests for the codegen helpers against naive references —
  * pure JVM (no Spark session), so hundreds of cases are cheap.
  * Deterministic: scalacheck generators sampled with fixed seeds.
  */
class PropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val P = 2147483647L
  private val params = Gen.Parameters.default

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  test("PolyCharFold.fold == naive codepoint fold (ascii + full unicode)") {
    val unicodeStr = Gen.listOf(
      Gen.choose(32, 0x10ffff).suchThat(cp => cp < 0xd800 || cp > 0xdfff))
      .map(cps => new String(cps.flatMap(Character.toChars(_).toSeq).toArray))
    for {
      s <- samples(Gen.asciiPrintableStr, 200) ++ samples(unicodeStr, 200)
      m <- Seq(31L, 131L)
    } {
      val naive = s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * m + cp) % P)
      assert(PolyCharFold.fold(UTF8String.fromString(s), m) == naive, s"string=$s mult=$m")
    }
  }

  test("FloatVecDot.dot == naive double fold") {
    val vec = Gen.listOf(Gen.chooseNum(-10.0f, 10.0f))
    samples(Gen.zip(vec, vec), 300).foreach { case (xs0, ys0) =>
      val n = math.min(xs0.length, ys0.length)
      val (xs, ys) = (xs0.take(n), ys0.take(n))
      val naive = xs.zip(ys).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      assert(FloatVecDot.dot(
        new GenericArrayData(xs.toArray), new GenericArrayData(ys.toArray)) == naive)
    }
  }

  test("SrpBucket.bucket == naive plane/dim loops") {
    samples(Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)), 200).foreach { xs =>
      val naive = (0 until 8).foldLeft(0L) { (b, i) =>
        val acc = xs.indices.foldLeft(0.0) { (a, d0) =>
          val k = i * 64L + d0
          val s = (1000003L * k + 12289L) % P
          val m = ((s * s) % P + k) % P
          val c = (m * m) % P
          a + xs(d0).toDouble * (if (c > 1073741823L) 1.0 else -1.0)
        }
        if (acc > 0) b | (1L << i) else b
      }
      assert(SrpBucket.bucket(new GenericArrayData(xs.toArray), 8, 0) == naive)
    }
  }

  test("MinHashSig.sig == naive permutation-min") {
    samples(Gen.nonEmptyListOf(Gen.choose(0L, P - 1)), 300).foreach { hs =>
      val got = MinHashSig.sig(new GenericArrayData(hs.toArray), 16).toLongArray()
      val want = (0 until 16).map { i =>
        hs.map(x => ((1000003L * i + 12289L) * x + (999983L * i + 15373L)) % P).min
      }
      assert(got.toSeq == want)
    }
  }
}
