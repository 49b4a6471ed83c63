package graft

import graft.operators.Abbreviations
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants. Raw ScalaCheck generators driven from a fixed
  * seed (the scalatest-plus bridge isn't on the classpath). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("LSH S-curve threshold is a probability, monotone in rows-per-band") {
    val configs = Gen.chooseNum(1, 8).flatMap(r => Gen.chooseNum(1, 64).map(b => (b, r)))
    samples(configs, 300).foreach { case (b, r) =>
      val t = graft.operators.Dedup.sCurveThreshold(b, r)
      assert(t > 0.0 && t <= 1.0, s"b=$b r=$r t=$t")
      if (b > 1) {
        // more rows per band at the same band count -> stricter operating point
        assert(graft.operators.Dedup.sCurveThreshold(b, r + 1) >= t)
        // more bands at the same rows -> looser operating point
        assert(graft.operators.Dedup.sCurveThreshold(b + 1, r) <= t)
      }
    }
  }

  test("SubProcess hex framing round-trips arbitrary binary payloads") {
    val bytesGen = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)
    samples(bytesGen, 300).foreach { b =>
      val hex = graft.infra.SubProcess.toHex(b)
      assert(hex.length == b.length * 2)
      assert(hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
      assert(graft.infra.SubProcess.fromHex(hex).toSeq == b.toSeq)
    }
  }

  test("XML entity decoder is identity on entity-free printable text") {
    samples(Gen.asciiPrintableStr.map(_.filterNot(c => c == '&')), 300).foreach { s0 =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s0)
      assert(graft.functions.XmlEntityDecoder.decode(u).toString == s0)
    }
  }

  private val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("Schwartz–Hearst: initials-formed short forms resolve to a pre-paren suffix") {
    samples(Gen.listOfN(3, word)).foreach { ws =>
      val sf = ws.map(_.head).mkString.toUpperCase
      val before = ws.mkString(" ")
      val text = s"$before ($sf)"
      Abbreviations.schwartzHearst(text).foreach { case (s, lf) =>
        assert(s == sf)
        assert(before.endsWith(lf), s"text=$text lf=$lf")
      }
    }
  }

  test("Schwartz–Hearst never throws on arbitrary printable strings") {
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      Abbreviations.schwartzHearst(s) // must not throw
    }
    succeed
  }

  test("rolling-hash window value stays in [0, P)") {
    samples(Gen.listOfN(5, Gen.chooseNum(1L, 100000L))).foreach { tids =>
      val b = graft.operators.Dedup.RollB
      val p = graft.operators.Dedup.RollP
      val wh = tids.reduceLeft((acc, t) => acc * b + t) % p
      assert(wh >= 0 && wh < p)
    }
  }

  test("floor-rounding r6 semantics: idempotent and within half-ulp of input") {
    samples(Gen.chooseNum(-1000.0, 1000.0), 1000).foreach { x =>
      val r = math.floor(x * 1e6 + 0.5) / 1e6
      val r2 = math.floor(r * 1e6 + 0.5) / 1e6
      assert(r2 == r)
      assert(math.abs(r - x) <= 5.0000001e-7)
    }
  }
}
