package graft.wikitext

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's 15 golden pairs
  * (/root/reference/tests/test_syntax.py:6-71), plus idempotence
  * properties (SURVEY.md §5).
  */
class NormalizeSpec extends AnyFunSuite {

  private def n(s: String) = WikitextNormalizer.normalize(s)

  test("case 1: multi-param template, unnamed positional, named sorted") {
    val in =
      """
{{Cite_web
| unnamed1
| unnamed2
| foo        = value
| bar        = value2
| paz      =    value 3
| bigpara    =
Okay so here's the deal guys.

This is a crazy guy citation.
}}
"""
    assert(n(in) == "{{Cite web|unnamed1|unnamed2|bar=value2|bigpara=Okay so here's the deal guys. This is a crazy guy citation.|foo=value|paz=value 3}}")
  }

  test("case 2: nested template inside external link") {
    assert(n("[https://example.com {{ flag | USA }}]") ==
      "[https://example.com {{Flag|USA}}]")
  }

  test("case 3: kitchen-sink cite news inside named ref") {
    val in = "\n<ref name=\"Jones 2007\">{{cite news |author = Jones, Tim |date = March 27, 2007 |title = Barack Obama: Mother not just a girl from Kansas; Stanley Ann Dunham shaped a future senator |newspaper = [[Chicago Tribune]] |page = 1 (Tempo) |url=http://gbppr.dyndns.org/~gbpprorg/obama/barack.mother.txt |url-status=dead |archive-url=https://web.archive.org/web/20170207112933/http://gbppr.dyndns.org/~gbpprorg/obama/barack.mother.txt |archive-date = February 7, 2017 }}</ref>\n"
    assert(n(in) == "<ref name=\"Jones 2007\">{{Cite news|archive-date=February 7, 2017|archive-url=https://web.archive.org/web/20170207112933/http://gbppr.dyndns.org/~gbpprorg/obama/barack.mother.txt|author=Jones, Tim|date=March 27, 2007|newspaper=[[Chicago Tribune]]|page=1 (Tempo)|title=Barack Obama: Mother not just a girl from Kansas; Stanley Ann Dunham shaped a future senator|url-status=dead|url=http://gbppr.dyndns.org/~gbpprorg/obama/barack.mother.txt}}</ref>")
  }

  test("case 4: magic-word templates in value normalized, not expanded") {
    assert(n("{{Cite web | url = http://example.com | title = Example | access-date = {{CURRENTYEAR}}-{{CURRENTMONTH}}-{{CURRENTDAY}} }}") ==
      "{{Cite web|access-date={{CURRENTYEAR}}-{{CURRENTMONTH}}-{{CURRENTDAY}}|title=Example|url=http://example.com}}")
  }

  test("case 5: template inside external-link label") {
    assert(n("[http://example.com {{Cite web | url = http://example.com | title = Example | access-date = 2023-05-19}}]") ==
      "[http://example.com {{Cite web|access-date=2023-05-19|title=Example|url=http://example.com}}]")
  }

  test("case 6: nowiki content opaque") {
    assert(n("<ref name=\"test\">{{Cite web | url = http://example.com | title = Example | access-date = 2023-05-19}}<nowiki>{{Not a template}}</nowiki></ref>") ==
      "<ref name=\"test\">{{Cite web|access-date=2023-05-19|title=Example|url=http://example.com}}<nowiki>{{Not a template}}</nowiki></ref>")
  }

  test("case 7: nested template in value capitalized") {
    assert(n("{{Cite web | url = http://example.com | title = {{random}} | access-date = 2023-05-19}}") ==
      "{{Cite web|access-date=2023-05-19|title={{Random}}|url=http://example.com}}")
  }

  test("case 8: explicit positional 2= sorts with named") {
    assert(n("{{Example | unnamed | name=value | foo = bar | 2=second unnamed }}") ==
      "{{Example|unnamed|2=second unnamed|foo=bar|name=value}}")
  }

  test("case 9: external link as param value") {
    assert(n("{{cite web | url = [http://example.com Example] | title = Example Title | access-date = 2023-05-19}}") ==
      "{{Cite web|access-date=2023-05-19|title=Example Title|url=[http://example.com Example]}}")
  }

  test("case 10: multi-line ref with list items and wikilink underscores") {
    val in = """
<ref>{{cite news |author = Serafin, Peter |date = March 21, 2004 |title = Punahou grad stirs up Illinois politics |newspaper = [[Honolulu_Star-Bulletin]] |url=http://archives.starbulletin.com/2004/03/21/news/story4.html |access-date = March 20, 2008 }}
* {{cite news |author = Scott, Janny |date = March 14, 2008 |title = A free-spirited wanderer who set Obama's path |work = The New York Times |page = A1 |url=https://www.nytimes.com/2008/03/14/us/politics/14obama.html |archive-url=https://web.archive.org/web/20080314042735/http://www.nytimes.com/2008/03/14/us/politics/14obama.html |archive-date=March 14, 2008 |url-access=limited |url-status=live |access-date = November 18, 2011 }}
*Obama (1995, 2004), Chapters 3 and 4.
* Scott (2012), pp. 131–134.
*Maraniss (2012), pp. 264–269.</ref>
"""
    val want = "<ref>{{Cite news|access-date=March 20, 2008|author=Serafin, Peter|date=March 21, 2004|newspaper=[[Honolulu Star-Bulletin]]|title=Punahou grad stirs up Illinois politics|url=http://archives.starbulletin.com/2004/03/21/news/story4.html}}\n* {{Cite news|access-date=November 18, 2011|archive-date=March 14, 2008|archive-url=https://web.archive.org/web/20080314042735/http://www.nytimes.com/2008/03/14/us/politics/14obama.html|author=Scott, Janny|date=March 14, 2008|page=A1|title=A free-spirited wanderer who set Obama's path|url-access=limited|url-status=live|url=https://www.nytimes.com/2008/03/14/us/politics/14obama.html|work=The New York Times}}\n* Obama (1995, 2004), Chapters 3 and 4.\n* Scott (2012), pp. 131–134.\n* Maraniss (2012), pp. 264–269.</ref>"
    assert(n(in) == want)
  }

  test("case 11: unquoted ref name gets quoted") {
    assert(n("<ref name=john></ref>") == "<ref name=\"john\"></ref>")
  }

  test("case 12: self-closing ref keeps space before />") {
    assert(n("<ref name=john/>") == "<ref name=\"john\" />")
  }

  test("case 13: list markers get a following space") {
    assert(n("***Hello world") == "*** Hello world")
  }

  test("case 14: hash list markers") {
    assert(n("##test2") == "## test2")
  }

  test("case 15: multi-line ref content trimmed, inner newline kept") {
    assert(n("\n<ref>\nMulti-line ref\nSecond line\n</ref>\n") ==
      "<ref>Multi-line ref\nSecond line</ref>")
  }

  test("idempotence on all golden outputs") {
    val outputs = Seq(
      "{{Cite web|unnamed1|unnamed2|bar=value2|foo=value}}",
      "[https://example.com {{Flag|USA}}]",
      "<ref name=\"john\" />",
      "*** Hello world",
      "<ref>Multi-line ref\nSecond line</ref>")
    outputs.foreach(o => assert(n(o) == o))
  }

  test("unicode and realistic citation pins (regression anchors)") {
    // Non-ASCII content passes through untouched; param sorting uses
    // binary string order consistently.
    assert(n("{{Cite web |title=Čitátion ünïcode — 引用 |url=http://x.ru/ж}}")
      == "{{Cite web|title=Čitátion ünïcode — 引用|url=http://x.ru/ж}}")
    // DOI/ISBN-style params with dots/slashes survive verbatim.
    assert(n("{{cite journal |doi=10.1000/j.x.2020.01 |isbn=978-3-16-148410-0 |title=T}}")
      == "{{Cite journal|doi=10.1000/j.x.2020.01|isbn=978-3-16-148410-0|title=T}}")
    // Empty parameter values are kept (reference keeps all params).
    assert(n("{{Cite web |url=http://e.org |archive-url= |title=T}}")
      == "{{Cite web|archive-url=|title=T|url=http://e.org}}")
    // HTML entities are data, not markup.
    assert(n("{{Cite web |title=A &amp; B |url=http://e.org}}")
      == "{{Cite web|title=A &amp; B|url=http://e.org}}")
    // Duplicate keys both survive, stably ordered by rendered k=v.
    assert(n("{{Cite web |url=http://b.org |url=http://a.org}}")
      == "{{Cite web|url=http://a.org|url=http://b.org}}")
  }

  test("scalacheck: idempotence + sha1 stability over generated wikitext") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "beta", "cite", "url", "x_y")
    val param = for { k <- word; v <- word } yield s"$k = $v"
    val tpl = for {
      name <- Gen.oneOf("cite web", "Cite_book", "sfn", "flag")
      ps <- Gen.listOfN(3, param)
    } yield s"{{ $name | ${ps.mkString(" | ")} }}"
    val doc = for {
      t <- tpl
      pre <- Gen.oneOf("", "text ", "* ", "### ", "\n")
      wrap <- Gen.oneOf(identity[String] _,
        (s: String) => s"<ref name=a>$s</ref>",
        (s: String) => s"[https://e.org $s]")
    } yield pre + wrap(t)
    def sha1(s: String) = java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val prop = Prop.forAll(doc) { s =>
      val n1 = n(s)
      n(n1) == n1 && sha1(n1) == sha1(n(s)) // idempotent + stable hash
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("fuzz: pathological bracket/pipe soup neither crashes nor hangs") {
    val rng = new scala.util.Random(42)
    val alphabet = Array("{{", "}}", "[[", "]]", "[", "]", "|", "=",
      "<ref", "</ref>", "<ref ", "/>", ">", "<nowiki>", "</nowiki>",
      "<!--", "-->", "a", " ", "\n", "*", "#", "http://x.y")
    (1 to 200).foreach { _ =>
      val s = Seq.fill(60)(alphabet(rng.nextInt(alphabet.length))).mkString
      val t0 = System.nanoTime()
      val out = n(s)
      assert(out != null)
      assert(n(out) == out, s"not idempotent for fuzz input: $s")
      assert(System.nanoTime() - t0 < 2e9, s"too slow on: $s")
    }
  }

  test("idempotence property: normalize(normalize(x)) == normalize(x)") {
    val atoms = Seq("{{cite web|url=http://x.org|title=T}}",
      "{{ Flag | USA }}", "<ref name=a>text</ref>", "[[A_b|c]]",
      "* item", "plain text", "<nowiki>{{raw}}</nowiki>",
      "<!-- hidden -->", "##x", "[http://e.org lbl]")
    for {
      a <- atoms; b <- atoms; pad <- Seq("", " ", "\n")
    } {
      val s = s"$a$pad$b"
      assert(n(n(s)) == n(s), s"not idempotent for: $s")
    }
  }
}
