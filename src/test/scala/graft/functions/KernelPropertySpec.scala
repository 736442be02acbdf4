package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Seeded-random property checks for the driver-side kernels behind the
  * codegen'd expressions — hundreds of adversarial inputs per property. */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xC0FFEE)

  test("mulmod61 equals BigInt arithmetic on random operands") {
    val p = (BigInt(1) << 61) - 1
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() & ((1L << 61) - 1)
      val b = rnd.nextLong() & ((1L << 61) - 1)
      assert(BigInt(TextFunctions.mulmod61(a, b)) === (BigInt(a) * BigInt(b)) % p,
        s"a=$a b=$b")
    }
  }

  test("bitsetOf + andPopcountOf equal set-intersection size on random sets") {
    (1 to 500).foreach { _ =>
      val vocab = 1 + rnd.nextInt(2000)
      val nWords = (vocab + 63) / 64
      val a = Set.fill(rnd.nextInt(100))(rnd.nextInt(vocab).toLong)
      val b = Set.fill(rnd.nextInt(100))(rnd.nextInt(vocab).toLong)
      val bsA = VectorFunctions.bitsetOf(
        new GenericArrayData(a.toArray), nWords)
      val bsB = VectorFunctions.bitsetOf(
        new GenericArrayData(b.toArray), nWords)
      assert(VectorFunctions.andPopcountOf(bsA, bsB) === (a intersect b).size.toLong)
    }
  }

  test("ngramsOf equals a straightforward reimplementation on random text") {
    val alphabet = "ab c\td\nE \u00e9 "
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val n = 1 + rnd.nextInt(4)
      // reference model: trim spaces only (Spark trim), lowercase, \s+ split
      val trimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse.toLowerCase
      val toks = trimmed.split("\\s+", -1)
      val count = math.max(toks.length - n, 0) + 1
      val expected = (0 until count)
        .map(i => toks.slice(i, math.min(i + n, toks.length)).mkString(" ")).distinct
      val got = VectorFunctionsSpecHelper.strings(
        TextFunctions.ngramsOf(UTF8String.fromString(s), n))
      assert(got === expected, s"text=${s.replace("\n", "\\n").replace("\t", "\\t")} n=$n")
    }
  }

  test("dotOf/l2Of equal sequential BigDecimal-free reference folds") {
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(80)
      val a = Array.fill(n)(rnd.nextFloat() * 4 - 2)
      val b = Array.fill(n)(rnd.nextFloat() * 4 - 2)
      val ad = new GenericArrayData(a)
      val bd = new GenericArrayData(b)
      var dot = 0.0
      var sq = 0.0
      var i = 0
      while (i < n) {
        dot += a(i).toDouble * b(i).toDouble
        sq += a(i).toDouble * a(i).toDouble
        i += 1
      }
      assert(java.lang.Double.doubleToLongBits(VectorFunctions.dotOf(ad, bd)) ===
        java.lang.Double.doubleToLongBits(dot))
      assert(java.lang.Double.doubleToLongBits(VectorFunctions.l2Of(ad)) ===
        java.lang.Double.doubleToLongBits(math.sqrt(sq)))
    }
  }
}

private object VectorFunctionsSpecHelper {
  def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
}
