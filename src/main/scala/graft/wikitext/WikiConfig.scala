package graft.wikitext

/** Per-wiki configuration and domain classification.
  *
  * Re-expresses the reference's `wiki_config.py:12-33` + `wikis.yaml:1-50`
  * (per-domain reference-section names and citation-template matchers, with
  * fallback to en.wikipedia.org) and `wikis.py:1-11` (`get_family`).
  * Config is a plain in-code map — at cluster scale it is closure-captured
  * (tiny), no broadcast needed.
  */
object WikiConfig {

  /** Citation-template matchers: `prefixes` match any template whose
    * lowercase name starts with the prefix; `exact` must equal the whole
    * lowercase name (wiki_config.py:22-33).
    */
  final case class Config(
      referenceSections: Set[String],
      citationPrefixes: Seq[String],
      citationExact: Set[String])

  private val en = Config(
    referenceSections = Set(
      "articles", "audiobooks", "bibliography", "books", "external links",
      "further reading", "references", "sources", "works cited",
      "discography", "see also"),
    citationPrefixes = Seq("cite"),
    citationExact = Set("citation"))

  private val configs: Map[String, Config] = Map(
    "en.wikipedia.org" -> en,
    "it.wikipedia.org" -> Config(
      referenceSections = Set(
        "note", "bibliografia", "fonti", "collegamenti esterni", "opere",
        "discografia", "pagine correlate", "voci correlate"),
      citationPrefixes = Seq("cita", "cite"),
      citationExact = Set("citazione")),
    "af.wikipedia.org" -> Config(
      referenceSections = Set(
        "verwysing", "verwysings", "bibliografie", "eksterne skakel",
        "eksterne skakels", "bronne", "bron", "notas",
        "notas en verwysings"),
      citationPrefixes = Seq("cite"),
      citationExact = Set("verwysing")))

  /** Footnote-shortcut templates treated as citations on every wiki. The
    * reference's extractor emits `{{Sfn|…}}` as a citation on
    * en.wikipedia.org (tests/test_article_extract_references.py:31-34)
    * even though wikis.yaml only lists the `cite` prefix, so the extractor
    * core recognizes the standard footnote family beyond the per-wiki list.
    */
  private val footnotePrefixes = Seq("sfn", "harv", "refn", "efn")

  /** Config for a domain, falling back to en.wikipedia.org
    * (wiki_config.py:12-15). */
  def forDomain(domain: String): Config = configs.getOrElse(domain, en)

  def isReferenceSection(domain: String, section: String): Boolean =
    forDomain(domain).referenceSections.contains(section.trim.toLowerCase)

  def isCitationTemplate(domain: String, templateName: String): Boolean = {
    val n = templateName.replace('_', ' ').trim.toLowerCase
    val c = forDomain(domain)
    c.citationExact.contains(n) ||
      (c.citationPrefixes ++ footnotePrefixes).exists(n.startsWith)
  }

  /** Wikimedia family classification (wikis.py:1-11; golden contract
    * tests/test_wikis.py:4-15). */
  def getFamily(domain: String): String = domain match {
    case "species.wikimedia.org" => "Wikispecies"
    case "commons.wikimedia.org" => "Wikimedia Commons"
    case _ =>
      val parts = domain.split('.')
      val label = if (parts.length == 3) parts(1) else parts(0)
      label.capitalize
  }
}
