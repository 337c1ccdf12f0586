package graft

import graft.kernels.HmmLogo
import org.scalatest.funsuite.AnyFunSuite

class HmmLogoSpec extends AnyFunSuite {

  // minimal HMMER3-shaped model: 4-letter alphabet, 2 positions
  private val text =
    """HMMER3/f [3.1b2 | February 2015]
      |NAME  TEST1
      |LENG  2
      |ALPH  DNA
      |HMM          A        C        G        T
      |            m->m     m->i     m->d
      |  COMPO   1.38629  1.38629  1.38629  1.38629
      |      1   0.00000  *        *        *
      |          0.1 0.2 0.3
      |      2   0.69315  0.69315  *        *
      |          0.1 0.2 0.3
      |//
      |""".stripMargin

  test("parses name, length, alphabet and match emissions") {
    val m = HmmLogo.parse(text)
    assert(m.name === "TEST1")
    assert(m.length === 2)
    assert(m.alphabet === Vector('A', 'C', 'G', 'T'))
    assert(m.matchEmissions(0)(0) === 0.0)
    assert(m.matchEmissions(0)(1).isInfinite)
    assert(math.abs(m.matchEmissions(1)(0) - 0.69315) < 1e-9)
  }

  test("logo: certain position carries full information, even split carries 1 bit") {
    val cols = HmmLogo.logo(HmmLogo.parse(text))
    // position 1: p = (1,0,0,0) -> IC = log2(4) = 2 bits, height(A) = 2
    assert(math.abs(cols(0).infoContent - 2.0) < 1e-9)
    assert(math.abs(cols(0).heights('A') - 2.0) < 1e-9)
    assert(cols(0).heights('C') === 0.0)
    // position 2: p = (.5,.5,0,0) -> IC = 2 - 1 = 1 bit, heights .5 each
    assert(math.abs(cols(1).infoContent - 1.0) < 1e-4)
    assert(math.abs(cols(1).heights('A') - 0.5) < 1e-4)
    assert(math.abs(cols(1).heights('C') - 0.5) < 1e-4)
  }

  test("logoFrame runs the parser distributed") {
    val s = SparkSpec.session
    import s.implicits._
    val df = HmmLogo.logoFrame(Seq(("SIG1", text)).toDS())
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(1)).toSet === Set(1, 2))
  }

  test("missing position line throws") {
    val bad = text.replace("      2   0.69315  0.69315  *        *", "")
    assertThrows[IllegalArgumentException](HmmLogo.parse(bad))
  }
}
