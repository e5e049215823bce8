package graft.stages

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Stage 2 — dictionary mention detection over text spans.
  *
  * The reference seeds its KB crawl with hand-picked mentions
  * (cndbpedia/{Government,Religion,Company}Graph.main) and resolves them via
  * the ment2ent API (APIRequestCache.kt:85–94). At 10^12-doc scale the
  * mentions come from the corpus itself: a broadcast dictionary trie scanned
  * per partition — no per-row RPC, no shuffle until the final distinct
  * (north star: "broadcast dictionary/trie mention detection").
  *
  * The trie is built once per task from the broadcast dictionary (cheap:
  * dictionary ≪ executor memory) and matches all occurrences at every start
  * position — O(len × maxPatternLen) per span.
  */
object Mentions {

  /** Minimal prefix-trie for multi-pattern containment matching. */
  final class Trie extends Serializable {
    private val root = new Node
    final class Node extends Serializable {
      val children = new mutable.HashMap[Char, Node]
      var word: String = null
    }
    def add(w: String): Unit = {
      var n = root
      w.foreach { c => n = n.children.getOrElseUpdate(c, new Node) }
      n.word = w
    }
    /** Distinct dictionary words occurring anywhere in `text`. */
    def matches(text: String): Set[String] = {
      if (text == null) return Set.empty
      val out = mutable.HashSet[String]()
      var i = 0
      while (i < text.length) {
        var n = root
        var j = i
        var cont = true
        while (cont && j < text.length) {
          n.children.get(text.charAt(j)) match {
            case Some(next) =>
              if (next.word != null) out += next.word
              n = next; j += 1
            case None => cont = false
          }
        }
        i += 1
      }
      out.toSet
    }
  }

  def buildTrie(words: Seq[String]): Trie = {
    val t = new Trie
    words.foreach(t.add)
    t
  }

  /** (doc_id, offset, text) spans → (doc_id, span_offset, mention) rows.
    * Typed flatMap over a broadcast trie (SURVEY.md §7.5 — the one
    * mapPartitions-class operator; everything around it stays relational).
    * The trie is BUILT ONCE on the driver and broadcast built — a real
    * dictionary is millions of entries, and a per-task rebuild would repeat
    * the construction once per partition per stage. */
  def detect(spark: SparkSession, textSpans: DataFrame, dict: Seq[String]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(buildTrie(dict))
    val out = textSpans
      .select(col("doc_id"), col("span_offset").cast("int"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        val trie = bc.value
        it.flatMap { case (docId, off, text) =>
          trie.matches(text).iterator.map(m => (docId, off, m))
        }
      }
    out.toDF("doc_id", "span_offset", "mention")
  }
}
