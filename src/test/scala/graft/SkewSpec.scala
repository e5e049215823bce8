package graft

import graft.core.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting contract: result parity with the plain join/agg, and the hot
  * key's rows actually spread across salt sub-keys. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // planted skew: one hot key owns 60% of the big side
  private def big = (0L until 5000L).map { i =>
    (if (i % 5 < 3) "hot" else s"k${i % 97}", i)
  }.toDF("key", "row_id")

  private def small = Seq(("hot", "H"), ("k3", "A"), ("k7", "B"))
    .toDF("key", "tag")

  test("salted join ≡ plain join, including non-matching keys") {
    val plain = big.join(small, Seq("key")).select("key", "row_id", "tag")
    val salted = Skew.saltedJoin(big, small, "key", col("row_id"), salts = 8)
      .select("key", "row_id", "tag")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("left join semantics survive salting") {
    val plain = big.join(small, Seq("key"), "left").select("key", "row_id", "tag")
    val salted = Skew.saltedJoin(big, small, "key", col("row_id"),
      salts = 4, joinType = "left").select("key", "row_id", "tag")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("the hot key spreads over all salt sub-keys") {
    val spread = big.withColumn("s", Skew.salt(col("row_id"), 8))
      .filter(col("key") === "hot")
      .groupBy("s").count().collect()
    assert(spread.length === 8, "hot key not fanned over every salt")
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.sum, "one salt still owns everything")
  }

  test("parity-unsafe join types are rejected, semi/anti accepted") {
    // right/full outer would emit each unmatched small-side row once per
    // salt — the API refuses instead of silently duplicating
    Seq("right", "full", "full_outer", "right_outer").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, small, "key", col("row_id"), salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("parity"), s"wrong error for $jt")
    }
    val semi = Skew.saltedJoin(big, small, "key", col("row_id"),
      salts = 4, joinType = "left_semi")
    val plainSemi = big.join(small, Seq("key"), "left_semi")
    assert(semi.except(plainSemi).isEmpty && plainSemi.except(semi).isEmpty)
  }

  test("salted count ≡ plain count per key") {
    val plain = big.groupBy("key").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(big, "key", col("row_id"), salts = 8)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
