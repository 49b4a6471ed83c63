package graft

import graft.operators.Abbreviations._
import org.scalatest.funsuite.AnyFunSuite

/** Classic Schwartz–Hearst examples (Schwartz & Hearst, PSB 2003). */
class AbbreviationsSpec extends AnyFunSuite {

  test("finds simple initialism") {
    assert(schwartzHearst("the heat shock protein (HSP) pathway")
      .contains(("HSP", "heat shock protein")))
  }

  test("matches characters inside words") {
    assert(schwartzHearst("polymerase chain reaction (PCR) was used")
      .contains(("PCR", "polymerase chain reaction")))
  }

  test("first short-form char must start a word") {
    val r = schwartzHearst("endothelial growth factor (EGF)")
    assert(r.contains(("EGF", "endothelial growth factor")))
  }

  test("rejects invalid short forms") {
    assert(!isValidShortForm("x"))          // too short
    assert(!isValidShortForm("a b c"))      // >2 words
    assert(!isValidShortForm("12345678901")) // too long
    assert(!isValidShortForm("123"))        // no letter
    assert(isValidShortForm("HSP90"))
  }

  test("no match when characters missing") {
    assert(schwartzHearst("completely unrelated words (XYZ)").isEmpty)
  }

  test("multiple pairs in one text") {
    val r = schwartzHearst("heat shock protein (HSP) and polymerase chain reaction (PCR)")
    assert(r.map(_._1).toSet == Set("HSP", "PCR"))
  }
}
