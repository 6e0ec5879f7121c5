package graft.table

import org.scalatest.funsuite.AnyFunSuite

/** JSON round-trip of every action shape (seeded fuzz over field content —
  * quotes, newlines, unicode, empty maps). */
class ActionsSpec extends AnyFunSuite {

  private val nasty = Seq("plain", "with \"quotes\"", "line\nbreak", "tab\there",
    "unicode ✓ ☂", "", "back\\slash", "{\"json\": [1,2]}")

  test("all action shapes round-trip through JSON") {
    val rnd = new scala.util.Random(1)
    def s() = nasty(rnd.nextInt(nasty.size))
    val actions: Seq[Action] = (1 to 50).flatMap { i =>
      Seq(
        MetaData(s"id$i-${s()}", s"{\"schema\": \"${i}\"}", rnd.nextLong().abs),
        AddFile(s"part-$i.parquet", rnd.nextLong().abs, rnd.nextLong().abs,
          rnd.nextLong().abs,
          Map("c1" -> s(), "c2" -> rnd.nextInt().toString),
          Map("c1" -> s())),
        RemoveFile(s"part-$i.parquet", rnd.nextLong().abs),
        CommitInfo(i, rnd.nextLong().abs, s(), Map("metric" -> s())))
    }
    actions.foreach { a =>
      val json = Actions.toJson(a)
      assert(!json.contains("\n"), "one line per action")
      assert(Actions.fromJson(json) === a, s"round-trip failed for $json")
    }
  }

  test("empty maps round-trip as empty") {
    val a = AddFile("p", 1, 2, 3, Map.empty, Map.empty)
    assert(Actions.fromJson(Actions.toJson(a)) === a)
  }
}
