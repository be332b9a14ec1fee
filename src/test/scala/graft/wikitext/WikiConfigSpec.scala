package graft.wikitext

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Runtime per-wiki config (wiki_config.py:12-33 + wikis.yaml parity):
  * the map is parsed from the bundled YAML resource, not compiled in,
  * and the same loader accepts user-supplied files.
  */
class WikiConfigSpec extends AnyFunSuite {

  test("it.wikipedia.org sections come from the bundled wikis.yaml") {
    assert(WikiConfig.isReferenceSection("it.wikipedia.org", " Bibliografia "))
    assert(WikiConfig.isReferenceSection("it.wikipedia.org", "Note"))
    assert(!WikiConfig.isReferenceSection("it.wikipedia.org", "References"))
    assert(WikiConfig.isCitationTemplate("it.wikipedia.org", "Cita web"))
    assert(WikiConfig.isCitationTemplate("it.wikipedia.org", "Citazione"))
  }

  test("af.wikipedia.org multi-word section from the file") {
    assert(WikiConfig.isReferenceSection(
      "af.wikipedia.org", "Notas en verwysings"))
  }

  test("unknown domain falls back to en (wiki_config.py:12-15)") {
    assert(WikiConfig.isReferenceSection("xx.wikipedia.org", "References"))
    assert(WikiConfig.isCitationTemplate("xx.wikipedia.org", "Cite book"))
    assert(!WikiConfig.isCitationTemplate("xx.wikipedia.org", "Infobox"))
  }

  test("parseYaml accepts a user-supplied wiki definition at runtime") {
    val yaml =
      """de.wikipedia.org:
        |  reference_sections: [einzelnachweise, literatur, weblinks]
        |  citation_prefixes: [internetquelle, literatur]
        |  citation_exact: [zitat]
        |""".stripMargin
    val parsed = WikiConfig.parseYaml(
      new ByteArrayInputStream(yaml.getBytes(StandardCharsets.UTF_8)))
    val de = parsed("de.wikipedia.org")
    assert(de.referenceSections == Set(
      "einzelnachweise", "literatur", "weblinks"))
    assert(de.citationPrefixes == Seq("internetquelle", "literatur"))
    assert(de.citationExact == Set("zitat"))
  }
}
