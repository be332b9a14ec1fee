package graft.sources

import java.io.ByteArrayOutputStream

import com.github.luben.zstd.ZstdOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** Fault tolerance of the mwrev bundle parser: a 100 TB scan over
  * thousands of bundles must degrade per-file (salvage the readable
  * prefix, default malformed fields), never abort the job from one
  * corrupt input — the per-file isolation posture of the reference's
  * process-per-bundle workers.
  */
class ToleranceSpec extends AnyFunSuite {

  private def bundleBytes(lines: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZstdOutputStream(bos)
    z.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    z.close()
    bos.toByteArray
  }

  private val goodLines = Seq(
    "#page_id=1 ns=0 rev_id=11 parent_rev_id= timestamp=2020-01-01T00:00:00Z",
    " first revision text",
    "#page_id=1 ns=0 rev_id=12 parent_rev_id=11 timestamp=2020-01-02T00:00:00Z",
    " second revision text")

  test("intact bundle parses fully") {
    val revs = MwRevZst.parse(
      new java.io.ByteArrayInputStream(bundleBytes(goodLines))).toList
    assert(revs.map(_.revisionId) == List(11L, 12L))
    assert(revs.head.revisionText == "first revision text")
    assert(revs.head.revisionTimestamp == "2020-01-01 00:00:00")
  }

  test("truncated zstd frame yields the readable prefix, no throw, " +
    "and the truncation is observable") {
    val bytes = bundleBytes(goodLines ++ (1 to 20000).map(i =>
      s" pad $i ${java.util.UUID.nameUUIDFromBytes(Array(i.toByte, (i >> 8).toByte))}"))
    val cut = bytes.take(bytes.length / 2)
    val before = MwRevZst.truncatedBundles.get()
    val revs = MwRevZst.parse(
      new java.io.ByteArrayInputStream(cut), "spec-bundle.mwrev.zst").toList
    // whatever decompressed cleanly before the corruption is kept;
    // the parser must terminate without raising
    assert(revs.map(_.revisionId).startsWith(List(11L)))
    // salvage must not be silent: a transient I/O fault on a healthy
    // file would otherwise masquerade as a successful full scan
    assert(MwRevZst.truncatedBundles.get() == before + 1)
  }

  test("malformed numeric metadata degrades the field, not the scan") {
    val lines = Seq(
      "#page_id=oops ns=zero rev_id=13 parent_rev_id=x timestamp=2020-03-01T00:00:00Z",
      " salvaged text",
      "#page_id=2 ns=0 rev_id=14 parent_rev_id= timestamp=2020-03-02T00:00:00Z",
      " clean text")
    val revs = MwRevZst.parse(
      new java.io.ByteArrayInputStream(bundleBytes(lines))).toList
    assert(revs.length == 2)
    assert(revs.head.pageId == 0 && revs.head.namespaceId.isEmpty &&
      revs.head.parentRevisionId.isEmpty && revs.head.revisionId == 13L)
    assert(revs(1).pageId == 2 && revs(1).revisionId == 14L)
  }
}
