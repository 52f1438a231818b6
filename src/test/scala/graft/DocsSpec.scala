package graft

import org.scalatest.funsuite.AnyFunSuite

/** Docs-drift gate: the committed human-facing docs must equal what
  * `graft.CatalogDump` regenerates from the live catalog — the round-5/6
  * README-count drift class, made impossible to recommit. Fix a failure
  * with `sbt "runMain graft.CatalogDump"`. */
class DocsSpec extends AnyFunSuite {

  private def read(name: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(name))

  test("OPERATORS.md matches the generator output byte-for-byte") {
    assert(read("OPERATORS.md") == CatalogDump.operatorsMd,
      "OPERATORS.md is stale — run `sbt \"runMain graft.CatalogDump\"`")
  }

  test("README.md / COVERAGE.md marker-span counts match the live catalog") {
    val live = CatalogDump.counts
    Seq("README.md", "COVERAGE.md").foreach { name =>
      val text = read(name)
      val spans = "<!--gen:([a-z]+)-->([^<]*)<!--/gen-->".r
        .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toSeq
      assert(spans.nonEmpty, s"$name lost its generated marker spans")
      spans.foreach { case (key, value) =>
        assert(live.contains(key), s"$name cites unknown count key '$key'")
        assert(value == live(key),
          s"$name cites $key=$value but the catalog says ${live(key)} — " +
            "run `sbt \"runMain graft.CatalogDump\"`")
      }
      // both docs must cite the query total and the oracle split so a
      // future edit can't silently drop the generated numbers
      assert(spans.map(_._1).toSet.contains("oracle"), s"$name: no oracle span")
    }
  }
}
