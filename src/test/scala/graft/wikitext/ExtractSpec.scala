package graft.wikitext

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's extractor behavioral tests
  * (/root/reference/tests/test_article_extract_references.py:8-58) plus
  * get_family goldens (tests/test_wikis.py:4-15).
  */
class ExtractSpec extends AnyFunSuite {

  private def byRaw(refs: Seq[ExtractedReference]) =
    refs.map(r => r.rawReference -> r).toMap

  private val wikitext =
    "Lead text. <!-- <ref>https://comment.invalid</ref> -->\n" +
      "Inline <ref name=foo>https://example.com/a</ref> then more.\n" +
      "And a short footnote {{Sfn|Smith|2020|p=12}} here.\n" +
      "\n" +
      "==External links==\n" +
      "* [https://archive.org Internet Archive]\n" +
      "\n" +
      "==Other section==\n" +
      "* No links here\n" +
      "* Has a bare url https://example.com/b\n" +
      "\n" +
      "Standalone https://example.com/c at end.\n"

  test("types, offsets, and external-link dedupe") {
    val results = ReferenceExtractor.extract(wikitext, includeOffsets = true)
    val m = byRaw(results)

    val refRaw = "<ref name=foo>https://example.com/a</ref>"
    assert(m.contains(refRaw))
    assert(m(refRaw).referenceName.contains("foo"))
    assert(m(refRaw).offsetStart == wikitext.indexOf(refRaw))
    assert(m(refRaw).length == refRaw.length)
    assert(m(refRaw).urls == Seq("https://example.com/a"))

    val sfnRaw = "{{Sfn|Smith|2020|p=12}}"
    assert(m.contains(sfnRaw))
    assert(m(sfnRaw).referenceName.isEmpty)
    assert(m(sfnRaw).offsetStart == wikitext.indexOf(sfnRaw))

    val listRaw = "* [https://archive.org Internet Archive]"
    assert(m.contains(listRaw))
    assert(m(listRaw).offsetStart == wikitext.indexOf(listRaw))

    assert(m.contains("* Has a bare url https://example.com/b"))

    assert(m.contains("https://example.com/c"))
    assert(!m.contains("https://example.com/a"))
    // Commented-out ref never emitted.
    assert(!results.exists(_.rawReference.contains("comment.invalid")))
  }

  test("self-closing ref with unquoted name") {
    val wt = "X <ref name=bar /> Y"
    val m = byRaw(ReferenceExtractor.extract(wt))
    val raw = "<ref name=bar />"
    assert(m.contains(raw))
    assert(m(raw).referenceName.contains("bar"))
    assert(m(raw).offsetStart == wt.indexOf(raw))
  }

  test("reference types: ref=inline, ref-section list=endnote") {
    val results = ReferenceExtractor.extract(wikitext)
    val m = byRaw(results)
    assert(m("<ref name=foo>https://example.com/a</ref>").referenceType == 1)
    assert(m("* [https://archive.org Internet Archive]").referenceType == 2)
    assert(m("* Has a bare url https://example.com/b").referenceType == 0)
    assert(m("{{Sfn|Smith|2020|p=12}}").referenceType == 0)
  }

  test("template params: positional numeric keys + named") {
    val m = byRaw(ReferenceExtractor.extract(wikitext))
    val tpls = m("{{Sfn|Smith|2020|p=12}}").templates
    assert(tpls.size == 1)
    assert(tpls.head.templateName == "Sfn")
    assert(tpls.head.parameters == Seq(
      TemplateParam("1", Some("Smith")),
      TemplateParam("2", Some("2020")),
      TemplateParam("p", Some("12"))))
  }

  test("templates inside refs are attached, not re-emitted standalone") {
    val wt = "A <ref>{{cite web |url=https://e.org/x |title=T}}</ref> B"
    val results = ReferenceExtractor.extract(wt)
    assert(results.size == 1)
    val r = results.head
    assert(r.referenceType == 1)
    assert(r.templates.map(_.templateName) == Seq("cite web"))
    assert(r.urls == Seq("https://e.org/x"))
  }

  test("results sorted by offset") {
    val offs = ReferenceExtractor.extract(wikitext).map(_.offsetStart)
    assert(offs == offs.sorted)
  }

  test("two refs on one line: both emitted with exact offsets") {
    val wt = "A <ref>one</ref> B <ref name=z>https://e.org/z</ref> C"
    val rs = ReferenceExtractor.extract(wt)
    assert(rs.size == 2)
    assert(rs.map(_.offsetStart) ==
      Seq(wt.indexOf("<ref>one"), wt.indexOf("<ref name=z")))
    assert(rs(1).referenceName.contains("z"))
  }

  test("ref with group and name attributes") {
    val wt = "X <ref group=note name=\"n1\">content</ref>"
    val m = byRaw(ReferenceExtractor.extract(wt))
    val raw = "<ref group=note name=\"n1\">content</ref>"
    assert(m.contains(raw))
    assert(m(raw).referenceName.contains("n1"))
  }

  test("nested list markers and trailing URL punctuation") {
    val wt = "==References==\n#* {{cite web |url=https://e.org/p}}\n\n" +
      "See https://x.org/a. End.\n"
    val m = byRaw(ReferenceExtractor.extract(wt))
    assert(m.contains("#* {{cite web |url=https://e.org/p}}"))
    assert(m("#* {{cite web |url=https://e.org/p}}").referenceType == 2)
    // trailing sentence period stripped from the bare URL
    assert(m.contains("https://x.org/a"))
    assert(!m.keys.exists(_ == "https://x.org/a."))
  }

  test("citation template nested inside a non-citation template") {
    val wt = "{{Infobox |source={{cite web |url=https://e.org/i}} }}"
    val m = byRaw(ReferenceExtractor.extract(wt))
    assert(m.contains("{{cite web |url=https://e.org/i}}"))
    assert(!m.keys.exists(_.startsWith("{{Infobox")))
  }

  test("property: offsets slice back to raw over generated articles") {
    val rng = new scala.util.Random(7)
    val words = Array("alpha", "beta", "cite", "see", "also", "x")
    def text(page: Int): String = {
      val parts = Seq.newBuilder[String]
      parts += s"Intro ${words(rng.nextInt(words.length))}."
      (0 until 1 + rng.nextInt(3)).foreach { k =>
        parts += s"<ref name=r$k>{{Cite web |url=https://e.org/$page/$k " +
          s"|title=T$k}}</ref> filler"
      }
      if (rng.nextBoolean()) parts += "{{Sfn|Doe|2001|p=3}}"
      parts += "\n==References==\n* {{Cite book |title=B}}\n" +
        s"* bare https://n.org/$page\n\nTail https://t.org/$page end."
      parts.result().mkString(" ")
    }
    (0 until 200).foreach { p =>
      val wt = text(p)
      val refs = ReferenceExtractor.extract(wt)
      assert(refs.nonEmpty)
      refs.foreach { r =>
        assert(wt.substring(r.offsetStart, r.offsetStart + r.length)
          == r.rawReference, s"offset mismatch in: $wt")
        val norm = WikitextNormalizer.normalize(r.rawReference)
        assert(WikitextNormalizer.normalize(norm) == norm)
      }
      // No two references claim overlapping spans.
      val spans = refs.map(r => (r.offsetStart, r.offsetStart + r.length))
        .sorted
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2,
          s"overlapping references in: $wt")
        case _ => ()
      }
    }
  }

  test("get_family goldens") {
    assert(WikiConfig.getFamily("www.wikidata.org") == "Wikidata")
    assert(WikiConfig.getFamily("wikidata.org") == "Wikidata")
    assert(WikiConfig.getFamily("commons.wikimedia.org") == "Wikimedia Commons")
    assert(WikiConfig.getFamily("species.wikimedia.org") == "Wikispecies")
    assert(WikiConfig.getFamily("zh.wikipedia.org") == "Wikipedia")
    assert(WikiConfig.getFamily("scn.wiktionary.org") == "Wiktionary")
    assert(WikiConfig.getFamily("wikisource.org") == "Wikisource")
  }
}
