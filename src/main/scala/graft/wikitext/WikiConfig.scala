package graft.wikitext

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Per-wiki configuration and domain classification.
  *
  * Re-expresses the reference's `wiki_config.py:12-33` + `wikis.yaml:1-50`
  * (per-domain reference-section names and citation-template matchers, with
  * fallback to en.wikipedia.org) and `wikis.py:1-11` (`get_family`).
  *
  * Like the reference, the per-wiki map is loaded at RUNTIME from a
  * bundled `wikis.yaml` resource — adding a wiki edits the file, no
  * recompile. At cluster scale the parsed map is closure-captured
  * (tiny, loaded once per JVM), no broadcast needed.
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

  /** Parse the wikis.yaml structure from a stream (resource or
    * user-supplied file — same loader either way). Accepts BOTH
    * spellings of the template matchers, so a reference deployment's
    * own `wikis.yaml` drops in unchanged:
    *  - graft flat keys: `citation_prefixes: [...]` /
    *    `citation_exact: [...]`
    *  - reference nested form (wikis.yaml:13-17):
    *    `citation_templates: {prefixes: [...], exact: [...]}`
    *  - reference legacy flat list (wiki_config.py:25-27):
    *    `citation_templates: [a, b]` — all entries treated as
    *    prefixes, exact empty.
    */
  private[wikitext] def parseYaml(
      in: java.io.InputStream): Map[String, Config] = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(in)
    root.fields().asScala.map { e =>
      def list(n: JsonNode): Seq[String] =
        n.elements().asScala.map(_.asText()).toSeq
      def strs(n: JsonNode, field: String): Seq[String] =
        Option(n.get(field)).map(list).getOrElse(Nil)
      val tpl = Option(e.getValue.get("citation_templates"))
      val (prefixes, exact) = tpl match {
        case Some(t) if t.isArray => (list(t), Nil) // legacy flat list
        case Some(t) => (strs(t, "prefixes"), strs(t, "exact"))
        case None =>
          (strs(e.getValue, "citation_prefixes"),
            strs(e.getValue, "citation_exact"))
      }
      e.getKey -> Config(
        referenceSections = strs(e.getValue, "reference_sections").toSet,
        citationPrefixes = prefixes,
        citationExact = exact.toSet)
    }.toMap
  }

  private val configs: Map[String, Config] = {
    val in = getClass.getResourceAsStream("/graft/wikis.yaml")
    require(in != null, "missing bundled resource /graft/wikis.yaml")
    try parseYaml(in) finally in.close()
  }

  private val en = configs("en.wikipedia.org")

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
