package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the multi-delimiter personnel parse (F8/F9):
  * delimiter precedence (comma > space > slash), trim, sentinel handling —
  * the reference's `parse_list_val` contract
  * (`/root/reference/parser/xml.py:375-395`).
  */
class PersonnelSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val name = Gen.alphaStr.suchThat(s => s.nonEmpty && s != "nan")

  test("comma present -> comma split, items trimmed") {
    check(Prop.forAll(Gen.nonEmptyListOf(name)) { names =>
      val joined = names.mkString(" , ")
      Personnel.parseListVal(joined) == joined.split(",", -1).toSeq.map(_.trim)
    })
  }

  test("spaces without commas -> space split") {
    check(Prop.forAll(Gen.listOfN(2, name), Gen.listOfN(3, name)) { (a, b) =>
      val joined = (a ++ b).mkString(" ")
      Personnel.parseListVal(joined) == joined.split(" ", -1).toSeq.map(_.trim)
    })
  }

  test("slashes only -> slash split") {
    check(Prop.forAll(Gen.nonEmptyListOf(name)) { names =>
      val joined = names.mkString("/")
      Personnel.parseListVal(joined) == joined.split("/", -1).toSeq.map(_.trim)
    })
  }

  test("single token passes through intact") {
    check(Prop.forAll(name) { n =>
      Personnel.parseListVal(n) == Seq(n)
    })
  }

  test("sentinels parse to the empty list") {
    for (s <- Seq(null, "", " ", "nan"))
      assert(Personnel.parseListVal(s) === Seq.empty, s"for <$s>")
  }

  test("comma wins over slash inside items") {
    assert(Personnel.parseListVal("A/B, C") === Seq("A/B", "C"))
  }
}
