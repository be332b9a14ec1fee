package graft.wikitext

import scala.collection.mutable

/** A template parameter; positional parameters get 1-based numeric string
  * keys (MediaWiki convention — `{{Sfn|Smith|2020}}` has 1=Smith, 2=2020).
  */
final case class TemplateParam(key: String, value: Option[String])

/** One template invocation inside a reference, shape per the reference's
  * consumption at build_db.py:395-435. `templateName` is raw (downstream
  * normalizes via WikitextNormalizer.normalizeTemplateName).
  */
final case class RefTemplate(
    templateName: String,
    fullText: String,
    parameters: Seq[TemplateParam])

/** One extracted reference (build_db.py:332-435;
  * tests/test_article_extract_references.py:24-48).
  * referenceType: 0=other, 1=inline (`<ref>`), 2=endnote
  * (reference-section list item) — api_v1.py:14.
  */
final case class ExtractedReference(
    rawReference: String,
    offsetStart: Int,
    length: Int,
    referenceType: Short,
    referenceName: Option[String],
    urls: Seq[String],
    templates: Seq[RefTemplate])

/** U2 `extract_references` — find every citation-shaped construct in an
  * article's wikitext. Behavioral contract is the reference's tests
  * (tests/test_article_extract_references.py:8-58):
  *
  *  (a) `<ref …>…</ref>` elements incl. self-closing, with `name=` attr;
  *  (b) citation-template invocations outside refs (`{{Sfn|…}}`);
  *  (c) list items (`*`/`#` lines): always in reference sections, and in
  *      other sections when they carry a URL or template;
  *  (d) bare/standalone URLs;
  *  content inside HTML comments is skipped entirely; a URL inside an
  *  already-emitted reference is never re-emitted standalone; offsets
  *  match `wikitext.find(raw)` semantics.
  */
object ReferenceExtractor {

  private val InlineRef: Short = 1
  private val Endnote: Short = 2
  private val Other: Short = 0

  private val urlRe = """https?://[^\s\[\]<>{}|"']+""".r
  private val headerRe = """^(=+)\s*(.*?)\s*=+\s*$""".r
  private val listItemRe = """^[*#:;]*[*#]\s*""".r
  private val refNameRe =
    """(?i)name\s*=\s*("([^"]*)"|'([^']*)'|([^\s/>]+))""".r

  def extract(
      wikitext: String,
      includeOffsets: Boolean = true,
      domain: String = "en.wikipedia.org"): Seq[ExtractedReference] = {

    // Mask comments so nothing inside them is scanned; keep offsets by
    // replacing comment spans with same-length spaces (build_db consumers
    // index into the ORIGINAL text).
    val masked = maskComments(wikitext)
    val out = mutable.ArrayBuffer.empty[ExtractedReference]
    // Claimed [start, end) spans — used to suppress re-emission of
    // templates/URLs living inside an already-emitted reference.
    val claimed = mutable.ArrayBuffer.empty[(Int, Int)]
    def isClaimed(pos: Int): Boolean =
      claimed.exists { case (a, b) => pos >= a && pos < b }
    def emit(start: Int, end: Int, tpe: Short, name: Option[String]): Unit = {
      val raw = wikitext.substring(start, end)
      out += ExtractedReference(raw, start, end - start, tpe, name,
        extractUrls(masked.substring(start, end)),
        extractTemplates(masked, start, end))
      claimed += ((start, end))
    }

    // (a) <ref> elements.
    findRefs(masked).foreach { case (start, end, name) =>
      emit(start, end, InlineRef, name)
    }

    // (c) list items, with section tracking.
    var section = ""
    var lineStart = 0
    while (lineStart <= masked.length) {
      val lineEnd = {
        val nl = masked.indexOf('\n', lineStart)
        if (nl < 0) masked.length else nl
      }
      val line = masked.substring(lineStart, lineEnd)
      line match {
        case headerRe(_, title) => section = title.toLowerCase
        case _ if listItemRe.findFirstIn(line).isDefined &&
            !isClaimed(lineStart) =>
          val trimmedEnd = lineStart + line.replaceAll("\\s+$", "").length
          val isRefSection = WikiConfig.isReferenceSection(domain, section)
          val hasPayload = urlRe.findFirstIn(line).isDefined ||
            line.contains("{{")
          if (isRefSection || hasPayload)
            emit(lineStart, trimmedEnd,
              if (isRefSection) Endnote else Other, None)
        case _ => ()
      }
      lineStart = lineEnd + 1
    }

    // (b) citation templates outside refs / list items.
    var i = 0
    while (i < masked.length - 1) {
      if (masked.startsWith("{{", i) && !isClaimed(i)) {
        val end = TemplateParser.findEnd(masked, i)
        if (end >= 0) {
          val inner = masked.substring(i + 2, end)
          val name = WikitextNormalizer.splitTopLevel(inner, '|').head
          if (WikiConfig.isCitationTemplate(domain, name)) {
            emit(i, end + 2, Other, None)
            i = end + 2
          } else i += 2 // not a citation — scan inside for nested ones
        } else i += 1
      } else i += 1
    }

    // (d) standalone URLs not inside any emitted reference.
    urlRe.findAllMatchIn(masked).foreach { m =>
      if (!isClaimed(m.start))
        emit(m.start, m.start + stripTrailingPunct(m.matched).length,
          Other, None)
    }

    out.sortBy(_.offsetStart).toSeq
  }

  // ---- helpers -----------------------------------------------------------

  private def maskComments(s: String): String = {
    val sb = new StringBuilder(s)
    var i = 0
    while (i < sb.length) {
      if (sb.startsWith("<!--", i)) {
        val end = sb.indexOf("-->", i)
        val stop = if (end < 0) sb.length else end + 3
        var j = i
        while (j < stop) {
          if (sb.charAt(j) != '\n') sb.setCharAt(j, ' ')
          j += 1
        }
        i = stop
      } else i += 1
    }
    sb.toString
  }

  /** (start, endExclusive, nameAttr) of each <ref> element, including
    * self-closing `<ref name=x />`. */
  private def findRefs(s: String): Seq[(Int, Int, Option[String])] = {
    val res = mutable.ArrayBuffer.empty[(Int, Int, Option[String])]
    var i = 0
    while (i < s.length - 4) {
      if (s.regionMatches(true, i, "<ref", 0, 4) &&
          (s.charAt(i + 4) match {
            case ' ' | '\t' | '\n' | '>' | '/' => true
            case _ => false
          })) {
        val gt = s.indexOf('>', i)
        if (gt < 0) { i += 4 }
        else {
          val attrText = s.substring(i + 4, gt)
          val name = refNameRe.findFirstMatchIn(attrText).map { m =>
            Option(m.group(2)).orElse(Option(m.group(3)))
              .getOrElse(m.group(4)).stripSuffix("/")
          }
          if (attrText.trim.endsWith("/")) { // self-closing
            res += ((i, gt + 1, name))
            i = gt + 1
          } else {
            val close = s.toLowerCase.indexOf("</ref>", gt + 1)
            val end = if (close < 0) s.length else close + "</ref>".length
            res += ((i, end, name))
            i = end
          }
        }
      } else i += 1
    }
    res.toSeq
  }

  private def stripTrailingPunct(url: String): String =
    url.replaceAll("""[.,;:!?)]+$""", "")

  private[wikitext] def extractUrls(raw: String): Seq[String] =
    urlRe.findAllIn(raw).map(stripTrailingPunct).toSeq.distinct

  /** All template invocations within [from, until) of `masked`, outermost
    * first, recursing into parameter values (build_db.py:395-435 walks a
    * flat template list per reference). */
  private def extractTemplates(
      masked: String, from: Int, until: Int): Seq[RefTemplate] = {
    val res = mutable.ArrayBuffer.empty[RefTemplate]
    def scan(start: Int, end: Int): Unit = {
      var i = start
      while (i < end - 1) {
        if (masked.startsWith("{{", i)) {
          val tplEnd = TemplateParser.findEnd(masked, i)
          if (tplEnd >= 0 && tplEnd + 2 <= end) {
            res += TemplateParser.parse(masked.substring(i, tplEnd + 2))
            scan(i + 2, tplEnd) // nested templates, outer-first
            i = tplEnd + 2
          } else i += 1
        } else i += 1
      }
    }
    scan(from, until)
    res.toSeq
  }
}

/** Shared template-invocation parsing for the extractor. */
private[wikitext] object TemplateParser {

  /** Index of the `}}` matching the `{{` at `start`, or -1. */
  def findEnd(s: String, start: Int): Int = {
    var i = start + 2
    var depth = 1
    while (i < s.length - 1) {
      if (s.startsWith("{{", i)) { depth += 1; i += 2 }
      else if (s.startsWith("}}", i)) {
        depth -= 1
        if (depth == 0) return i
        i += 2
      } else i += 1
    }
    -1
  }

  /** Parse one `{{…}}` invocation into name + parameters; positional
    * parameters get 1-based numeric keys. */
  def parse(fullText: String): RefTemplate = {
    val inner = fullText.substring(2, fullText.length - 2)
    val parts = WikitextNormalizer.splitTopLevel(inner, '|')
    val name = parts.head.trim
    var pos = 0
    val params = parts.tail.map { part =>
      val eq = part.indexOf('=')
      // `=` inside nested constructs is not a key separator; reuse the
      // normalizer's top-level scan via a cheap check.
      val topEq = if (eq < 0) -1 else topLevelIndexOf(part)
      if (topEq < 0) {
        pos += 1
        TemplateParam(pos.toString, someNonEmpty(part.trim))
      } else {
        TemplateParam(part.substring(0, topEq).trim,
          someNonEmpty(part.substring(topEq + 1).trim))
      }
    }
    RefTemplate(name, fullText, params)
  }

  private def someNonEmpty(s: String): Option[String] =
    if (s.isEmpty) None else Some(s)

  private def topLevelIndexOf(s: String): Int = {
    var i = 0
    var curly = 0
    var square = 0
    while (i < s.length) {
      if (s.startsWith("{{", i)) { curly += 1; i += 2 }
      else if (s.startsWith("}}", i) && curly > 0) { curly -= 1; i += 2 }
      else {
        val c = s.charAt(i)
        if (c == '[') square += 1
        else if (c == ']' && square > 0) square -= 1
        else if (c == '=' && curly == 0 && square == 0) return i
        i += 1
      }
    }
    -1
  }
}
