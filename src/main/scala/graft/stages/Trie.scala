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

  /** Per-thread scratch: decoded chars + matched-node ids. The earlier
    * `text.toString` materialized a java String (char[] + String header)
    * for EVERY span row — at corpus scale that is the mention stage's
    * dominant allocation, and allocation bandwidth is a HOST-shared
    * resource: the 4N-executor side (8 concurrent cores) pays the
    * contention the 1-executor side never sees, which lands directly on
    * the scaling ratio. A thread-local buffer amortizes to zero. */
  @transient private lazy val tlScratch =
    new ThreadLocal[TrieScratch] {
      override def initialValue(): TrieScratch = new TrieScratch
    }

  /** Distinct matched words as Catalyst ArrayData — the entry point the
    * codegen'd [[TrieMatch]] expression calls. Per-row allocation is ONLY
    * the result array (+ its UTF8String refs): the UTF-8 payload is
    * decoded into a reused thread-local char buffer (never a String), and
    * dedup is a linear probe over matched NODE ids in the same scratch
    * (matches per row are few; no boxing, no hash set). */
  def matchesArray(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val scratch = tlScratch.get()
    val buf = scratch.chars(text.numBytes)
    val len = decodeUtf8(text, buf)
    var hit = scratch.hits
    var nHit = 0
    var i = 0
    while (i < len) {
      var n = 0
      var j = i
      while (n >= 0 && j < len) {
        n = step(n, buf(j))
        if (n >= 0) {
          if (words(n) != null) {
            var k = 0
            var seen = false
            while (k < nHit && !seen) { seen = hit(k) == n; k += 1 }
            if (!seen) {
              if (nHit == hit.length) {
                hit = java.util.Arrays.copyOf(hit, nHit * 2)
                scratch.hits = hit
              }
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

  /** UTF-8 → UTF-16 decode into `buf` (caller-sized: chars ≤ bytes for
    * every UTF-8 sequence). Matches String/UTF8String.toString for valid
    * input — including surrogate pairs for 4-byte sequences; a truncated
    * trailing sequence is dropped (valid Spark UTF8Strings never have
    * one). Returns the decoded length. */
  private def decodeUtf8(text: UTF8String, buf: Array[Char]): Int = {
    val nb = text.numBytes
    var p = 0
    var len = 0
    while (p < nb) {
      val b0 = text.getByte(p) & 0xff
      if (b0 < 0x80) {
        buf(len) = b0.toChar; len += 1; p += 1
      } else if (b0 < 0xe0) {
        if (p + 1 >= nb) return len
        buf(len) = (((b0 & 0x1f) << 6) |
          (text.getByte(p + 1) & 0x3f)).toChar
        len += 1; p += 2
      } else if (b0 < 0xf0) {
        if (p + 2 >= nb) return len
        buf(len) = (((b0 & 0x0f) << 12) |
          ((text.getByte(p + 1) & 0x3f) << 6) |
          (text.getByte(p + 2) & 0x3f)).toChar
        len += 1; p += 3
      } else {
        if (p + 3 >= nb) return len
        val cp = ((b0 & 0x07) << 18) |
          ((text.getByte(p + 1) & 0x3f) << 12) |
          ((text.getByte(p + 2) & 0x3f) << 6) |
          (text.getByte(p + 3) & 0x3f)
        buf(len) = Character.highSurrogate(cp)
        buf(len + 1) = Character.lowSurrogate(cp)
        len += 2; p += 4
      }
    }
    len
  }
}

/** Reused per-thread buffers for [[Trie.matchesArray]]. */
private[stages] final class TrieScratch {
  private var buf = new Array[Char](256)
  var hits = new Array[Int](8)
  def chars(atLeast: Int): Array[Char] = {
    if (buf.length < atLeast)
      buf = new Array[Char](math.max(atLeast, buf.length * 2))
    buf
  }
}
