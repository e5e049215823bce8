package graft

import graft.core.Rules
import graft.gen.{Corpus, CorpusData}
import graft.stages.{Canon, KbExpand, Mentions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Temporary diagnostic: isolate where pipeline and oracle diverge. */
class CanonDebugSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val cfg = Corpus.Config(nDocs = 1500, nEntities = 120, seed = 42L)

  test("kb triples, edges and canon map parity") {
    val docs = CorpusData.docsDF(spark, cfg)
    val m2eDF = CorpusData.ment2entDF(spark, cfg)
    val avDF = CorpusData.avpairDF(spark, cfg)
    val dict = m2eDF.select("mention").distinct().collect().map(_.getString(0)).toSeq
    val mentions = Mentions.detect(spark, KgPipeline.textSpans(docs), dict)
      .select(col("mention")).distinct()
    val kb = KbExpand.expand(spark, mentions, m2eDF, avDF, Rules.recursivePreds).cache()
    val kbSet = kb.as[(String, String, String)].collect().toSet

    // oracle-side KB triples
    val kbO = mutable.HashSet[(String, String, String)]()
    val kbv = Corpus.kb(cfg)
    val mentionsFound = mutable.LinkedHashSet[String]()
    Corpus.docs(cfg).foreach { d =>
      d.spans.filter(s => s.kind == "text" && s.text != null).foreach { s =>
        kbv.mentions.foreach(m => if (s.text.contains(m)) mentionsFound += m)
      }
    }
    val m2e = kbv.ment2ent.map(m => m.mention -> m.entities).toMap
    val av = kbv.avpair.groupBy(_.entity)
    val fin = mutable.HashSet[String]()
    val q = mutable.Queue[String]()
    mentionsFound.foreach(q.enqueue)
    while (q.nonEmpty) {
      val m = q.dequeue()
      m2e.getOrElse(m, Nil).foreach { e =>
        if (!fin(e)) {
          fin += e
          av.getOrElse(e, Nil).foreach { r =>
            kbO += ((r.entity, r.pred, r.obj))
            if (Rules.recursivePreds.contains(r.pred)) q.enqueue(r.obj)
          }
        }
      }
    }
    info(s"kb spark=${kbSet.size} oracle=${kbO.size} diffA=${(kbSet -- kbO).take(3)} diffB=${(kbO -- kbSet).take(3)}")

    // labels parity
    val labS = Canon.nodeLabels(kb, Rules.categoryPred)
      .as[(String, Seq[String])].collect().toMap
    val labO = mutable.HashMap[String, mutable.Set[String]]()
    val religious = kbO.collect { case (s, p, o) if p == Rules.categoryPred && o == "宗教" => s }
    kbO.foreach { case (s, p, o) =>
      if (p == Rules.categoryPred) labO.getOrElseUpdate(s, mutable.HashSet()) += o
      labO.getOrElseUpdate(o, mutable.HashSet()) += Canon.targetLabel(p, religious.contains(s))
    }
    val labDiff = (labS.keySet ++ labO.keySet).filter(k =>
      labS.getOrElse(k, Nil).toSet != labO.getOrElse(k, mutable.Set()).toSet)
    info(s"label diffs=${labDiff.size} sample=${labDiff.take(5).map(k => (k, labS.get(k), labO.get(k)))}")

    // containment edge parity
    val edgesS = Canon.containmentEdges(Canon.nodeLabels(kb, Rules.categoryPred))
      .as[(String, String)].collect().toSet
    val names = labO.keySet.toVector.sorted
    val edgesO = (for {
      a <- names; b <- names
      if a != b && b.length >= 2 && a.contains(b) && labO(b).subsetOf(labO(a))
    } yield (a, b)).toSet
    info(s"cont edges spark=${edgesS.size} oracle=${edgesO.size} " +
      s"onlyS=${(edgesS -- edgesO).take(5)} onlyO=${(edgesO -- edgesS).take(5)}")

    // full canon map parity
    val mapS = Canon.canonicalMap(kb, Rules.categoryPred, Rules.aliasPreds)
      .as[(String, String)].collect().toMap
    val parent = mutable.HashMap[String, String]()
    def find(x: String): String = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    def union(x: String, y: String): Unit = {
      val rx = find(x); val ry = find(y)
      if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
    }
    edgesO.foreach { case (a, b) => union(a, b) }
    kbO.foreach { case (s, p, o) => if (Rules.aliasPreds.contains(p)) union(s, o) }
    val mapO = names.map(n => n -> find(n)).filter { case (n, c) => n != c }.toMap
    val keys = mapS.keySet ++ mapO.keySet
    val md = keys.filter(k => mapS.get(k) != mapO.get(k))
    info(s"canon map spark=${mapS.size} oracle=${mapO.size} diffs=${md.size} " +
      s"sample=${md.take(6).map(k => (k, mapS.get(k), mapO.get(k)))}")
  }
}
