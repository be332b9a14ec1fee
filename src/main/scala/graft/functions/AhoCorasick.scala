package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern string automaton (Aho & Corasick, CACM
  * 1975): matches ALL patterns against a text in ONE left-to-right scan,
  * O(|text| + matches), independent of the number of patterns.
  *
  * This is the scale answer to blocklist/term filtering over a corpus:
  * the naive plan runs |patterns| separate `contains`/regex passes over
  * every document — O(|patterns| × |text|) per row, which at 10k terms
  * × 100 TB is a non-starter. The automaton is built ONCE on the driver
  * from the (always small) pattern dimension, broadcast to executors,
  * and each document is scanned a single time regardless of pattern
  * count (q186 wires it as broadcast-dim + per-partition scan).
  *
  * Build is the textbook construction: a trie of the patterns, failure
  * links by BFS (longest proper suffix that is also a trie prefix), and
  * per-node output sets pre-merged through the failure chain so matching
  * never walks suffix links to collect outputs.
  *
  * The instance is immutable after `build` and java-serializable
  * (plain arrays + per-node immutable maps), so it broadcasts cleanly.
  */
final class AhoCorasick private (
    goto_ : Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Next state for (state, c): follow failure links until a goto edge
    * exists; the root absorbs unknown characters. */
  private def step(state: Int, c: Char): Int = {
    var s = state
    while (s != 0 && !goto_(s).contains(c)) s = fail(s)
    goto_(s).getOrElse(c, 0)
  }

  /** Distinct indices (into the build-time pattern seq) of patterns
    * occurring anywhere in `text` as substrings. One pass, no regex. */
  def matchedPatterns(text: String): Array[Int] = {
    val seen = new Array[Boolean](nPatterns)
    var nSeen = 0
    var s = 0
    var i = 0
    val n = text.length
    while (i < n && nSeen < nPatterns) {
      s = step(s, text.charAt(i))
      val os = out(s)
      var j = 0
      while (j < os.length) {
        if (!seen(os(j))) { seen(os(j)) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](nSeen)
    var k = 0
    var p = 0
    while (p < nPatterns) {
      if (seen(p)) { res(k) = p; k += 1 }
      p += 1
    }
    res
  }

  /** Total number of pattern occurrences in `text`, counting every match
    * end position (overlapping occurrences included — the automaton's
    * native semantics). */
  def countOccurrences(text: String): Long = {
    var s = 0
    var total = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      total += out(s).length
      i += 1
    }
    total
  }
}

object AhoCorasick {

  /** Build the automaton from `patterns` (empty patterns are rejected;
    * duplicates each keep their own index). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val gotoB = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { c =>
        s = gotoB(s).getOrElseUpdate(c, {
          gotoB += mutable.Map.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          gotoB.length - 1
        })
      }
      outB(s) += idx
    }
    val n = gotoB.length
    val fail = new Array[Int](n)
    // BFS from the root: children of the root fail to the root; deeper
    // nodes fail to step(fail(parent), c). Output sets are merged with
    // the fail target's (already final, because BFS visits shallower
    // nodes first), so matching reads one array per state.
    val queue = mutable.Queue.empty[Int]
    gotoB(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoB(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(v) = if (v != gotoB(f).getOrElse(c, 0)) gotoB(f).getOrElse(c, 0) else 0
        outB(v) ++= outB(fail(v))
        queue += v
      }
    }
    new AhoCorasick(gotoB.map(_.toMap).toArray, fail,
      outB.map(_.toArray).toArray, patterns.length)
  }
}
