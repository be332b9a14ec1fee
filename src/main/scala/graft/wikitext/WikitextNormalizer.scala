package graft.wikitext

import scala.collection.mutable

/** U1 `normalize_wikitext` — canonicalize a reference string so that
  * trivially-different spellings of the same citation hash identically.
  *
  * The behavioral contract is the reference's 15 golden pairs
  * (tests/test_syntax.py:6-66); the implementation is a small tokenizer
  * (templates / refs / wikilinks / external links / nowiki / comments),
  * not regexes. Canonical rules pinned by the goldens:
  *
  *  - template names: underscores→spaces, trim, first letter capitalized
  *    (`Cite_web`→`Cite web`, `{{ flag |…}}`→`{{Flag|…}}`);
  *  - unnamed parameters keep their position and precede named ones;
  *    named parameters are sorted by the rendered `key=value` string
  *    (NOT the bare key — that is why `url-status=dead` sorts before
  *    `url=http://…`: `-` < `=`);
  *  - whitespace around `|` and `=` is stripped; parameter values have
  *    internal whitespace (incl. newlines) collapsed to single spaces;
  *  - nested templates are normalized recursively; `<nowiki>…</nowiki>`
  *    and `<!-- … -->` spans are opaque;
  *  - `<ref name=x>` gets its name quoted; self-closing refs render as
  *    `<ref name="x" />`; multi-line ref content is trimmed but inner
  *    newlines survive;
  *  - wikilink targets: underscores→spaces;
  *  - list markers (`*`/`#` runs) get exactly one following space.
  */
object WikitextNormalizer {

  /** Private-use sentinel base for masking opaque spans. */
  private final val SentinelBase = '\uE000'

  def normalize(text: String): String = {
    val (masked, store) = maskOpaque(text)
    val inline = normalizeInner(masked)
    restore(processLines(inline).trim, store)
  }

  // ---- opaque spans ------------------------------------------------------

  /** Replace <nowiki>…</nowiki> and <!-- … --> spans with single
    * private-use chars so no later phase can touch their content. */
  private def maskOpaque(s: String): (String, Vector[String]) = {
    val out = new StringBuilder
    val store = mutable.ArrayBuffer.empty[String]
    var i = 0
    val lower = s.toLowerCase
    while (i < s.length) {
      if (lower.startsWith("<nowiki>", i)) {
        val end = lower.indexOf("</nowiki>", i)
        val stop = if (end >= 0) end + "</nowiki>".length else s.length
        store += s.substring(i, stop)
        out += (SentinelBase + store.size - 1).toChar
        i = stop
      } else if (s.startsWith("<!--", i)) {
        val end = s.indexOf("-->", i)
        val stop = if (end >= 0) end + 3 else s.length
        store += s.substring(i, stop)
        out += (SentinelBase + store.size - 1).toChar
        i = stop
      } else { out += s.charAt(i); i += 1 }
    }
    (out.toString, store.toVector)
  }

  private def restore(s: String, store: Vector[String]): String = {
    val out = new StringBuilder
    s.foreach { c =>
      val idx = c - SentinelBase
      if (idx >= 0 && idx < store.size) out ++= store(idx) else out += c
    }
    out.toString
  }

  // ---- inline constructs -------------------------------------------------

  private[wikitext] def normalizeInner(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.startsWith("{{", i)) {
        val end = findTemplateEnd(s, i)
        if (end >= 0) {
          out ++= renderTemplate(s.substring(i + 2, end))
          i = end + 2
        } else { out += s.charAt(i); i += 1 }
      } else if (s.startsWith("[[", i)) {
        val end = findMatching(s, i, "[[", "]]")
        if (end >= 0) {
          out ++= renderWikiLink(s.substring(i + 2, end))
          i = end + 2
        } else { out += s.charAt(i); i += 1 }
      } else if (s.charAt(i) == '[' && isExtLinkStart(s, i + 1)) {
        val end = findExtLinkEnd(s, i + 1)
        if (end >= 0) {
          out ++= renderExtLink(s.substring(i + 1, end))
          i = end + 1
        } else { out += s.charAt(i); i += 1 }
      } else if (isRefStart(s, i)) {
        val (rendered, next) = renderRef(s, i)
        out ++= rendered
        i = next
      } else { out += s.charAt(i); i += 1 }
    }
    out.toString
  }

  /** End index of the `}}` closing the template opened at `start`. */
  private def findTemplateEnd(s: String, start: Int): Int = {
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

  private def findMatching(s: String, start: Int, open: String,
      close: String): Int = {
    var i = start + open.length
    var depth = 1
    while (i <= s.length - close.length) {
      if (s.startsWith(open, i)) { depth += 1; i += open.length }
      else if (s.startsWith(close, i)) {
        depth -= 1
        if (depth == 0) return i
        i += close.length
      } else i += 1
    }
    -1
  }

  private def isExtLinkStart(s: String, i: Int): Boolean =
    s.startsWith("http://", i) || s.startsWith("https://", i) ||
      s.startsWith("ftp://", i) || s.startsWith("//", i)

  /** Closing `]` of an external link, skipping nested `[[…]]` in labels. */
  private def findExtLinkEnd(s: String, start: Int): Int = {
    var i = start
    while (i < s.length) {
      if (s.startsWith("[[", i)) {
        val end = findMatching(s, i, "[[", "]]")
        if (end < 0) return -1
        i = end + 2
      } else if (s.charAt(i) == ']') return i
      else i += 1
    }
    -1
  }

  private def isRefStart(s: String, i: Int): Boolean =
    s.regionMatches(true, i, "<ref", 0, 4) && i + 4 < s.length &&
      (s.charAt(i + 4) match {
        case ' ' | '\t' | '\n' | '>' | '/' => true
        case _ => false
      })

  // ---- renderers ---------------------------------------------------------

  private def collapseWs(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Split on `sep` at top level only (outside {{}}, [[]], [..]). */
  private[wikitext] def splitTopLevel(s: String, sep: Char): Vector[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var curly = 0
    var square = 0
    while (i < s.length) {
      if (s.startsWith("{{", i)) { curly += 1; cur ++= "{{"; i += 2 }
      else if (s.startsWith("}}", i) && curly > 0) {
        curly -= 1; cur ++= "}}"; i += 2
      } else {
        val c = s.charAt(i)
        if (c == '[') square += 1
        else if (c == ']' && square > 0) square -= 1
        if (c == sep && curly == 0 && square == 0) {
          parts += cur.toString; cur.clear()
        } else cur += c
        i += 1
      }
    }
    parts += cur.toString
    parts.toVector
  }

  private def capitalizeFirst(s: String): String =
    if (s.isEmpty) s else s.charAt(0).toUpper.toString + s.substring(1)

  /** Template name normalization (F7): underscores→spaces, trim,
    * capitalize first char (build_db.py:279-286, models.py:456-463). */
  def normalizeTemplateName(raw: String): String =
    capitalizeFirst(collapseWs(raw.replace('_', ' ')))

  private def renderTemplate(inner: String): String = {
    val parts = splitTopLevel(inner, '|')
    val name = normalizeTemplateName(parts.head)
    val unnamed = mutable.ArrayBuffer.empty[String]
    val named = mutable.ArrayBuffer.empty[String]
    parts.tail.foreach { part =>
      val eq = topLevelIndexOf(part, '=')
      if (eq < 0) unnamed += collapseWs(normalizeInner(part))
      else {
        val key = collapseWs(part.substring(0, eq))
        val value = collapseWs(normalizeInner(part.substring(eq + 1)))
        named += s"$key=$value"
      }
    }
    val params = unnamed ++ named.sorted
    if (params.isEmpty) s"{{$name}}"
    else params.mkString(s"{{$name|", "|", "}}")
  }

  private def topLevelIndexOf(s: String, target: Char): Int = {
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
        else if (c == target && curly == 0 && square == 0) return i
        i += 1
      }
    }
    -1
  }

  private def renderWikiLink(inner: String): String = {
    val parts = splitTopLevel(inner, '|')
    val target = parts.head.replace('_', ' ').trim
    val rest = parts.tail.map(normalizeInner)
    (target +: rest).mkString("[[", "|", "]]")
  }

  private def renderExtLink(inner: String): String = {
    val ws = inner.indexWhere(_.isWhitespace)
    if (ws < 0) s"[$inner]"
    else {
      val url = inner.substring(0, ws)
      val label = collapseWs(normalizeInner(inner.substring(ws + 1)))
      if (label.isEmpty) s"[$url]" else s"[$url $label]"
    }
  }

  private val attrRe =
    """([A-Za-z][\w:-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s/>]+))""".r

  /** Render a `<ref …>` element starting at `start`; returns (rendered,
    * index after the element). Quotes unquoted attribute values; keeps
    * attribute order; self-closing form renders with a space before `/>`. */
  private def renderRef(s: String, start: Int): (String, Int) = {
    val gt = s.indexOf('>', start)
    if (gt < 0) return (s.substring(start, start + 4), start + 4)
    val attrText = s.substring(start + 4, gt)
    val selfClosing = attrText.trim.endsWith("/")
    val attrs = attrRe.findAllMatchIn(attrText).map { m =>
      val v = Option(m.group(3)).orElse(Option(m.group(4)))
        .getOrElse(m.group(5))
      s"""${m.group(1)}="${v.stripSuffix("/")}""""
    }.mkString(" ")
    val head = if (attrs.isEmpty) "<ref" else s"<ref $attrs"
    if (selfClosing) (s"$head />", gt + 1)
    else {
      val lower = s.toLowerCase
      val close = lower.indexOf("</ref>", gt + 1)
      if (close < 0) {
        // Unclosed ref: malformed input — pass the tag head through
        // verbatim (synthesizing a close would change semantics and
        // break idempotence) and keep scanning after it.
        (s.substring(start, gt + 1), gt + 1)
      } else {
        val content = normalizeInner(s.substring(gt + 1, close)).trim
        (s"$head>$content</ref>", close + "</ref>".length)
      }
    }
  }

  // ---- line structure ----------------------------------------------------

  private val listMarkerRe = """^([*#]+)\s*(.*)$""".r

  /** Per-line cleanup: trailing-whitespace strip + exactly one space after
    * a `*`/`#` list-marker run (`***Hello`→`*** Hello`). */
  private def processLines(s: String): String =
    s.split("\n", -1).map { line =>
      val r = line.replaceAll("\\s+$", "")
      r match {
        case listMarkerRe(markers, rest) if rest.nonEmpty =>
          s"$markers $rest"
        case _ => r
      }
    }.mkString("\n")
}
