package graft

import graft.datapipe.Packing
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing (concat-and-chunk): the two-phase distributed prefix
  * sum must equal the sequential reference, be invariant to where the
  * range partitioner cuts, and never plan a single-reducer global window.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // token counts by whitespace split: 3, 5, 1, 4, 2, 1, 6 — the shared
  // tokenizer convention (split of trim) yields [""] for whitespace-only
  // text, i.e. ONE token, identically in Spark and the DuckDB oracle
  private def docs = Seq(
    (10L, "a b c"),
    (11L, "a b c d e"),
    (12L, "solo"),
    (13L, "w x y z"),
    (14L, "p q"),
    (15L, "   "),
    (16L, "s t u v w x"))
    .toDF("doc_id", "text")

  test("packIndex matches the sequential concat-and-chunk reference") {
    val L = 4L
    val got = Packing.packIndex(docs, "doc_id", "text", L, parts = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

    // sequential reference: cumulative offsets over doc_id order
    val toks = Seq(10L -> 3L, 11L -> 5L, 12L -> 1L, 13L -> 4L, 14L -> 2L,
      15L -> 1L, 16L -> 6L)
    var off = 0L
    val want = toks.map { case (id, n) =>
      val start = off; off += n
      val first = start / L; val last = (start + n - 1) / L
      (id, n, start, first, last, last - first + 1)
    }
    assert(got === want)
    // doc 11 (start 3, 5 tokens, L=4) straddles seqs 0..1
    assert(want.find(_._1 == 11L).get._6 === 2)
  }

  test("result is invariant to the partition count (prefix sums compose)") {
    val a = Packing.packIndex(docs, "doc_id", "text", 4L, parts = 2)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packIndex(docs, "doc_id", "text", 4L, parts = 5)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("no single-reducer stage: the plan never funnels to one partition") {
    val plan = Packing.packIndex(docs, "doc_id", "text", 4L, parts = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global-window fallback detected:\n$plan")
  }

  test("shuffleOrder: a seeded total permutation, partition-invariant, no single reducer") {
    val ids = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Packing.shuffleOrder(ids, "doc_id", seed = 42L, parts = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // a total permutation: positions are exactly 0..n-1
    assert(a.map(_._2).sorted === (0L until 300L))
    // deterministic under a different partition count AND input layout
    val b = Packing.shuffleOrder(ids.repartition(7), "doc_id",
        seed = 42L, parts = 5)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    // the sequential reference: rank by (md5-prefix key, id)
    def key(id: Long) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"42#$id".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 15), 16)
    val want = (0L until 300L).sortBy(i => (key(i), i))
      .zipWithIndex.map { case (id, p) => (id, p.toLong) }.sortBy(_._1)
    assert(a === want)
    // a different seed is a different permutation
    val c = Packing.shuffleOrder(ids, "doc_id", seed = 7L, parts = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(c !== a)
    // never a global-window single reducer
    val plan = Packing.shuffleOrder(ids, "doc_id", seed = 42L, parts = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global-rank fallback detected:\n$plan")
  }

  test("packIncremental: two daily batches == one-shot packing of the union") {
    val root = java.nio.file.Files.createTempDirectory("graft-packinc").toString
    val io = new graft.core.TableIO(spark, root)
    val all = docs
    val batch1 = docs.where($"doc_id" <= 13)
    val batch2 = docs // deliberately includes already-committed ids: the
                      // id high-water mark must drop them, not repack them
    Packing.packIncremental(io, "pack", batch1, "doc_id", "text", 4L, parts = 3)
    val acc = Packing.packIncremental(io, "pack", batch2, "doc_id", "text", 4L,
      parts = 3)
    val got = acc
      .select("doc_id", "n_tokens", "start_offset", "seq_first", "seq_last",
        "n_seqs")
      .orderBy("doc_id").collect().toSeq
    val want = Packing.packIndex(all, "doc_id", "text", 4L, parts = 3)
      .orderBy("doc_id").collect().toSeq
    assert(got === want)
    // a third run with nothing new appends no snapshot and changes nothing
    val before = io.lastCommitted("pack")
    Packing.packIncremental(io, "pack", batch2, "doc_id", "text", 4L, parts = 3)
    assert(io.lastCommitted("pack") === before)
    assert(io.counterOf("pack", "token_high_water_mark") === Some(22L))
  }

  test("writeShards: boundary docs land in every intersecting shard") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val idx = Packing.packIndex(docs, "doc_id", "text", 4L, parts = 3)
    val stats = Packing.writeShards(idx, s"$out/shards", 4L, seqsPerShard = 2L)
      .orderBy("shard_id").as[(Long, Long, Long, Long)].collect().toSeq
    // 22 tokens, 8 per shard → shards 0..2 own 8/8/6 token slots
    assert(stats === Seq((0L, 2L, 8L, 2L), (1L, 4L, 8L, 2L), (2L, 1L, 6L, 2L)))
    // each shard is self-contained: its rows alone cover its token range
    val shard1 = spark.read.parquet(s"$out/shards").where($"shard_id" === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(shard1 === Set(12L, 13L, 14L, 15L))
  }

  test("randomized parity: packIndex == sequential reference on 300 docs") {
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 300).map { i =>
      // ids shuffled into a sparse, unordered range; token counts 1..40
      (rnd.nextInt(100000).toLong * 300 + i, "w " * (1 + rnd.nextInt(40)))
    }
    val df = rows.toDF("doc_id", "text")
    val L = 32L
    val got = Packing.packIndex(df, "doc_id", "text", L, parts = 7)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    var off = 0L
    val want = rows.map { case (id, t) => (id, t.trim.split("\\s+").length.toLong) }
      .sortBy(_._1)
      .map { case (id, n) =>
        val s = off; off += n
        (id, n, s, s / L, (s + n - 1) / L, (s + n - 1) / L - s / L + 1)
      }
    assert(got === want)
  }

  test("shard layout contract: one parquet file per shard directory") {
    val out = java.nio.file.Files.createTempDirectory("graft-shard1f").toString
    val idx = Packing.packIndex(docs, "doc_id", "text", 4L, parts = 3)
    Packing.writeShards(idx, s"$out/shards", 4L, seqsPerShard = 2L)
    val dirs = new java.io.File(s"$out/shards").listFiles()
      .filter(_.getName.startsWith("shard_id="))
    assert(dirs.length === 3)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${d.getName} has ${files.length} files — sliver layout regressed")
    }
  }

  test("packStats conserves tokens and fills every non-final sequence") {
    val L = 4L
    val idx = Packing.packIndex(docs, "doc_id", "text", L, parts = 3)
    val stats = Packing.packStats(idx, L)
      .orderBy("seq_id").as[(Long, Long, Long)].collect().toSeq
    val total = 3L + 5 + 1 + 4 + 2 + 1 + 6 // 22 tokens → seqs 0..5
    assert(stats.map(_._3).sum === total)
    assert(stats.map(_._1) === (0L until 6L))
    assert(stats.dropRight(1).forall(_._3 == L), s"non-full interior seq: $stats")
    assert(stats.last._3 === total % L)
    // seq 0 holds doc 10 (3 tokens) + the head of doc 11
    assert(stats.head._2 === 2)
  }
}
