package graft.ais

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Ivef.parseDoc totality under hostile input: the live IVEF TCP shell
  * feeds whatever the peer sends into the parser, so a corrupt document
  * must yield Seq.empty (parse-or-drop), never an escaped exception
  * killing the stream. Seeded fuzz: random non-XML noise, structurally
  * valid XML with garbage attribute VALUES (which reach the numeric and
  * timestamp field conversions), and mutations of the golden fixture
  * docs.
  */
class IvefFuzzSpec extends AnyFunSuite {

  test("random non-XML noise parses to empty, never throws") {
    val rnd = new Random(11)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(120)
      val junk = new String(Array.fill(n)((32 + rnd.nextInt(95)).toChar))
      Ivef.parseDoc(junk)
    }
    Ivef.parseDoc("")
    Ivef.parseDoc("<MSG_IVEF>")
    Ivef.parseDoc("<MSG_IVEF></MSG_IVEF>")
  }

  test("mutated golden documents parse-or-drop, never throw") {
    val rnd = new Random(23)
    val docs = IvefFixtures.docs.map(_._2)
    assert(docs.nonEmpty)
    for (_ <- 1 to 1000) {
      val base = docs(rnd.nextInt(docs.length))
      val mutated = rnd.nextInt(3) match {
        case 0 => base.take(rnd.nextInt(base.length)) // truncate
        case 1 => // flip one char anywhere (tags, attrs, values)
          val i = rnd.nextInt(base.length)
          base.updated(i, (32 + rnd.nextInt(95)).toChar)
        case _ => // corrupt numeric-looking attribute values only:
          // stays well-formed XML, so the garbage reaches toSwasla's
          // field conversions
          base.replaceAll("\"[0-9][0-9.]*\"", "\"x9x\"")
      }
      Ivef.parseDoc(mutated)
    }
  }
}
