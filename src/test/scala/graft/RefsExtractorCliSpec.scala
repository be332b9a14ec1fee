package graft

import java.io.{ByteArrayOutputStream, FileOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.github.luben.zstd.ZstdOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** CLI contract parity with the reference's refs_extractor.cli
  * (tests/test_refs_extractor_cli.py:4-73): default output is raw refs
  * separated by blank lines; as-of selects the historical revision;
  * `--full` prints one JSON object with the documented fields.
  */
class RefsExtractorCliSpec extends AnyFunSuite {

  private val refA =
    "<ref name=a>{{Cite web |url=https://example.com/x |title=X}}</ref>"
  private val refB = "<ref>{{Sfn|Doe|1999}}</ref>"

  private val bundleText =
    s"""# page_id=100 ns=0 rev_id=1001 parent_rev_id= timestamp=2020-01-01T00:00:00Z
       | Old text. $refA
       |# page_id=100 ns=0 rev_id=1002 parent_rev_id=1001 timestamp=2020-02-01T00:00:00Z
       | New text. $refA And $refB
       |""".stripMargin

  private lazy val bundle: String = {
    val dir = Files.createTempDirectory("cli-bundle").toFile
    val f = new java.io.File(dir, "b.mwrev.zst")
    val z = new ZstdOutputStream(new FileOutputStream(f))
    z.write(bundleText.getBytes(StandardCharsets.UTF_8))
    z.close()
    f.getAbsolutePath
  }

  private def runCli(args: String*): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val rc = RefsExtractorCli.run(args.toArray,
      new PrintStream(bos, true, "UTF-8"))
    (rc, new String(bos.toByteArray, StandardCharsets.UTF_8))
  }

  test("default: raw refs separated by blank lines, latest as-of now") {
    val (rc, out) = runCli("--input", bundle, "100")
    assert(rc == 0)
    assert(out == s"$refA\n\n$refB\n")
  }

  test("explicit as-of picks the historical revision") {
    val (rc, out) =
      runCli("--input", bundle, "100", "2020-01-15T00:00:00Z")
    assert(rc == 0)
    assert(out == s"$refA\n") // only rev 1001 existed then
  }

  test("--full prints the documented JSON object") {
    val (rc, out) =
      runCli("--full", "--input", bundle, "100", "2020-03-01T00:00:00Z")
    assert(rc == 0)
    val data = new ObjectMapper().readTree(out)
    assert(data.get("title").asText() == "100")
    assert(data.get("as_of").asText() == "2020-03-01 00:00:00")
    assert(data.get("page_id").asInt() == 100)
    assert(data.get("revision_id").asLong() == 1002L)
    assert(data.get("revision_timestamp").asText() ==
      "2020-02-01 00:00:00")
    val refs = data.get("references")
    assert(refs.size() == 2)
    assert(refs.get(0).get("raw_reference").asText() == refA)
    assert(refs.get(0).get("reference_name").asText() == "a")
    assert(refs.get(1).get("reference_name").isNull)
  }

  test("unknown page or too-early as-of exits 1; bad args exit 2") {
    assert(runCli("--input", bundle, "999")._1 == 1)
    assert(runCli("--input", bundle, "100", "1999-01-01T00:00:00Z")._1 == 1)
    assert(runCli()._1 == 2)
  }
}
