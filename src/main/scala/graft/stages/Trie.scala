package graft.stages

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Frozen prefix-trie for multi-pattern containment matching (top-level
  * class so generated Java can name it without `$`-mangling).
  *
  * Node k's children live in chars/targets[childStart(k) until
  * childEnd(k)], sorted by char and binary-searched; words(k) is the
  * dictionary word ending at node k (null otherwise). Node 0 is the root.
  * The match loop allocates NOTHING per character: a `HashMap[Char, Node]`
  * formulation boxes a `java.lang.Character` for every CJK char probe
  * (only ASCII is cached by `Character.valueOf`), which at corpus scale is
  * hundreds of millions of allocations per task — measured as ~3× CPU
  * inflation on the mention-scan stage once 8 cores contend for the
  * allocator, exactly the regime a 1000-executor cluster runs in. Flat
  * arrays also serialize/broadcast as a few blocks instead of a node-graph
  * walk.
  */
final class Trie private[stages] (
    childStart: Array[Int], childEnd: Array[Int],
    chars: Array[Char], targets: Array[Int],
    words: Array[String]) extends Serializable {

  /** words as UTF8String for zero-copy emission from [[matchesArray]];
    * rebuilt lazily per JVM (cheap: one pass over the dictionary). */
  @transient private lazy val wordsU: Array[UTF8String] =
    words.map(w => if (w == null) null else UTF8String.fromString(w))

  private def step(node: Int, c: Char): Int = {
    var lo = childStart(node)
    var hi = childEnd(node) - 1
    while (lo <= hi) { // zero-allocation binary search over children
      val mid = (lo + hi) >>> 1
      val mc = chars(mid)
      if (mc == c) return targets(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Distinct dictionary words occurring anywhere in `text`. */
  def matches(text: String): Set[String] = {
    if (text == null) return Set.empty
    val out = mutable.HashSet[String]()
    val len = text.length
    var i = 0
    while (i < len) {
      var n = 0
      var j = i
      while (n >= 0 && j < len) {
        n = step(n, text.charAt(j))
        if (n >= 0) {
          if (words(n) != null) out += words(n)
          j += 1
        }
      }
      i += 1
    }
    out.toSet
  }

  /** Distinct matched words as Catalyst ArrayData — the entry point the
    * codegen'd [[TrieMatch]] expression calls. Per-row allocation is one
    * String materialization + a small int scratch + the result array;
    * dedup is a linear probe over matched NODE ids (matches per row are
    * few; no boxing, no hash set). */
  def matchesArray(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val s = text.toString
    val len = s.length
    var hit = new Array[Int](8)
    var nHit = 0
    var i = 0
    while (i < len) {
      var n = 0
      var j = i
      while (n >= 0 && j < len) {
        n = step(n, s.charAt(j))
        if (n >= 0) {
          if (words(n) != null) {
            var k = 0
            var seen = false
            while (k < nHit && !seen) { seen = hit(k) == n; k += 1 }
            if (!seen) {
              if (nHit == hit.length) hit = java.util.Arrays.copyOf(hit, nHit * 2)
              hit(nHit) = n
              nHit += 1
            }
          }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](nHit)
    var k = 0
    while (k < nHit) { out(k) = wordsU(hit(k)); k += 1 }
    new GenericArrayData(out)
  }
}
