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

  test("en-fallback golden: unconfigured domain gets the FULL en config " +
      "(wiki_config.py:12-15 + wikis.yaml:1-17)") {
    val fb = WikiConfig.forDomain("zz.wikivoyage.org")
    // Field-for-field the reference's en.wikipedia.org entry — not just
    // a couple of spot lookups: a drift in the bundled file or loader
    // would silently change extraction on every unconfigured wiki.
    assert(fb.referenceSections == Set("articles", "audiobooks",
      "bibliography", "books", "external links", "further reading",
      "references", "sources", "works cited", "discography", "see also"))
    assert(fb.citationPrefixes == Seq("cite"))
    assert(fb.citationExact == Set("citation"))
    // And it IS the en config, not a lookalike.
    assert(fb == WikiConfig.forDomain("en.wikipedia.org"))
  }

  test("parseYaml accepts the reference's own wikis.yaml schema " +
      "(nested citation_templates + legacy flat list)") {
    val yaml =
      """it.wikipedia.org:
        |  reference_sections: [note, bibliografia]
        |  citation_templates:
        |    prefixes: [cita, cite]
        |    exact: [citazione]
        |legacy.example.org:
        |  reference_sections: [refs]
        |  citation_templates: [cite, citeweb]
        |""".stripMargin
    val parsed = WikiConfig.parseYaml(
      new ByteArrayInputStream(yaml.getBytes(StandardCharsets.UTF_8)))
    val it = parsed("it.wikipedia.org")
    assert(it.citationPrefixes == Seq("cita", "cite"))
    assert(it.citationExact == Set("citazione"))
    // wiki_config.py:25-27: a flat list is all-prefixes, exact empty.
    val legacy = parsed("legacy.example.org")
    assert(legacy.citationPrefixes == Seq("cite", "citeweb"))
    assert(legacy.citationExact.isEmpty)
  }

  test("EVERY domain in the reference's own wikis.yaml resolves with " +
      "identical sections + template matchers (full-file parity)") {
    // The reference deployment's actual config file (read-only test
    // input, never bundled or copied): parse it with the SAME loader a
    // user would point at it, then assert each entry resolves through
    // the engine's lookup exactly as the reference's wiki_config.py
    // would — sections verbatim, prefixes in order, exacts as a set.
    val path = java.nio.file.Paths.get("/root/reference/wikis.yaml")
    assume(java.nio.file.Files.exists(path), "reference tree not mounted")
    val in = java.nio.file.Files.newInputStream(path)
    val parsed = try WikiConfig.parseYaml(in) finally in.close()
    assert(parsed.nonEmpty)
    parsed.foreach { case (domain, want) =>
      // Resolution for a CONFIGURED domain must be its own entry (no
      // accidental en-fallback shadowing) ...
      val got = WikiConfig.forDomain(domain)
      assert(got.referenceSections == want.referenceSections,
        s"$domain sections")
      assert(got.citationPrefixes == want.citationPrefixes,
        s"$domain prefixes")
      assert(got.citationExact == want.citationExact, s"$domain exacts")
      // ... and the behavioral surface agrees: every declared section
      // matches (case/space-insensitively, wiki_config.py:18-20), every
      // declared prefix/exact template is recognized.
      want.referenceSections.foreach { s =>
        assert(WikiConfig.isReferenceSection(domain, s" ${s.toUpperCase} "),
          s"$domain section '$s'")
      }
      want.citationPrefixes.foreach { p =>
        assert(WikiConfig.isCitationTemplate(domain, s"${p}_anything"),
          s"$domain prefix '$p'")
      }
      want.citationExact.foreach { x =>
        assert(WikiConfig.isCitationTemplate(domain, x.capitalize),
          s"$domain exact '$x'")
      }
    }
    // The reference file carries en/it/af today; the loop above is
    // future-proof if the deployment adds wikis.
    assert(parsed.keySet.contains("en.wikipedia.org"))
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
