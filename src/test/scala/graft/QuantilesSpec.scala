package graft

import graft.datapipe.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Semantics + plan shape of the bounded-cardinality exact quantile. */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** NumPy-linear / quantile_cont reference on a sorted multiset. */
  private def refQuantile(sorted: Vector[Double], p: Double): Double = {
    val h = (sorted.size - 1) * p
    val k = math.floor(h).toInt
    val frac = h - k
    val vk = sorted(k)
    val vk1 = if (k + 1 < sorted.size) sorted(k + 1) else vk
    BigDecimal(vk + frac * (vk1 - vk))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("byKey matches a brute-force sort quantile on fuzzed groups") {
    val rnd = new Random(7)
    // duplicate-heavy 2-decimal values — the bounded-resolution shape
    val rows = (1 to 4000).map { i =>
      val key = s"k${i % 5}"
      (key, math.round(rnd.nextDouble() * 100) / 100.0)
    }
    val df = rows.toDF("source", "v")
    val got = Quantiles.byKey(df, "source", col("v"), Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val byKey = rows.groupBy(_._1)
    for ((k, vs) <- byKey) {
      val sorted = vs.map(_._2).sorted.toVector
      val (n, q50, q90) = got(k)
      assert(n === sorted.size.toLong)
      assert(math.abs(q50 - refQuantile(sorted, 0.5)) < 1e-9, s"$k q50")
      assert(math.abs(q90 - refQuantile(sorted, 0.9)) < 1e-9, s"$k q90")
    }
  }

  test("degenerate groups: single row, and all-equal values") {
    val df = Seq(("a", 3.0), ("b", 1.0), ("b", 1.0), ("b", 1.0))
      .toDF("source", "v")
    val got = Quantiles.byKey(df, "source", col("v"), Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") === ((3.0, 3.0)))
    assert(got("b") === ((1.0, 1.0)))
  }

  test("keepAboveQuantile keeps exactly the rows at/above their key's threshold") {
    val rnd = new Random(11)
    val rows = (1 to 1000).map(i => (s"s${i % 3}", i.toLong,
      math.round(rnd.nextDouble() * 1000) / 1000.0))
    val df = rows.toDF("source", "doc_id", "v")
    val kept = Quantiles.keepAboveQuantile(df, "source", col("v"), 0.9)
      .select("doc_id").as[Long].collect().toSet
    val thr = rows.groupBy(_._1).map { case (k, vs) =>
      k -> refQuantile(vs.map(_._3).sorted.toVector, 0.9)
    }
    val expect = rows.filter { case (k, _, v) =>
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= thr(k)
    }.map(_._2).toSet
    assert(kept === expect)
  }

  test("plan: corpus pass is a two-phase hash aggregate; threshold join broadcasts") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("source", "v")
    val pq = Quantiles.byKey(df, "source", col("v"), Seq(0.5))
      .queryExecution.executedPlan.toString
    // count-by-value first phase must partial-aggregate map-side (absorbs a
    // hot value the way chunkDedup's first-occurrence agg does)
    assert(pq.contains("partial_count") || pq.contains("partial count"),
      s"no map-side partial count:\n$pq")
    val pk = Quantiles.keepAboveQuantile(df, "source", col("v"), 0.5)
      .queryExecution.executedPlan.toString
    assert(pk.contains("BroadcastHashJoin"),
      s"threshold join back to corpus is not broadcast:\n$pk")
  }
}
