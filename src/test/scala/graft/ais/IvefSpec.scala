package graft.ais

import org.scalatest.funsuite.AnyFunSuite

class IvefSpec extends AnyFunSuite {

  test("parseDoc flattens nested elements with Key/Value re-keying") {
    val recs = Ivef.parseDoc(IvefFixtures.docs.head._2)
    assert(recs.size === 1)
    val r = recs.head
    assert(r.Id === "20240102200433")
    assert(r.MsgRefId === "aaaa-0001") // braces stripped
    assert(r.NavStatus === 0)          // <NavStatus Value="0"/> re-keyed
    assert(r.Lat === 1.23972166666667)
    assert(r.Name.contains("MAERSK WALLIS"))
    assert(r.Draught === 11.2)         // VoyageData attr
    assert(r.ETA.isDefined)
    // quirks
    assert(r.EstAccLat === 2.0240102200433E13) // eval(Id)
    assert(r.Flag.isEmpty)                     // never assigned
  }

  test("record without UpdateTime is dropped (ctor crash parity)") {
    val recs = Ivef.parseDoc(IvefFixtures.docs(3)._2)
    assert(recs.map(_.Id) === Seq("20240102200499")) // 200500 dropped
  }

  test("malformed XML yields no records") {
    assert(Ivef.parseDoc("<MSG_IVEF><unclosed>").isEmpty)
    assert(Ivef.parseDoc("").isEmpty)
  }
}
