package graft

import graft.functions.{Base62Expr, CosineSim, HasSpanKind, SignBucket, SpanFields, TextCounts}
import graft.stages.Mentions
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Every native expression evaluated with codegen failure made LOUD.
  *
  * Spark's default posture is to log-and-fall-back when generated Java
  * fails to compile — the query still returns correct rows, interpreted,
  * so a broken `doGenCode` is invisible to every correctness test while
  * silently shedding the whole performance reason the expression exists
  * (exactly what happened when HasSpanKind's codegen called a companion
  * helper whose static forwarder was suppressed by a name collision with
  * Expression.eval). This suite pins the codegen path itself:
  * `spark.sql.codegen.fallback=false` turns whole-stage-codegen compile
  * failures into thrown errors, and `CODEGEN_FACTORY_MODE=CODEGEN_ONLY`
  * does the same for non-WSCG projections. CodegenFallback expressions
  * (SpanFields) stay legal — their generated wrapper must still compile. */
class CodegenStrictSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    // without this, literal-backed inputs are folded by ConvertToLocalRelation
    // through an INTERPRETED projection at optimize time — the codegen path
    // this suite exists to pin would never run
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    s
  }

  private val spanType = ArrayType(StructType(Seq(
    StructField("kind", StringType), StructField("text", StringType),
    StructField("media_ref", StringType), StructField("offset", IntegerType))))

  private def spansDf(rows: Seq[Seq[(String, String, String, Integer)]]) = {
    val schema = StructType(Seq(StructField("spans", spanType)))
    val data = rows.map(spans => Row(spans.map(s => Row(s._1, s._2, s._3, s._4))))
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }

  test("HasSpanKind compiles under strict codegen and early-exits correctly") {
    val df = spansDf(Seq(
      Seq(("text", "t", null, 0), ("cid", "c9", null, 1)),
      Seq(("text", "t", null, 0)),
      Seq.empty))
    val got = df.select(HasSpanKind(col("spans"), "cid").as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(true, false, false))
  }

  test("SpanFields' CodegenFallback wrapper still compiles in strict mode") {
    val df = spansDf(Seq(Seq(("text", "first", null, 1), ("cid", "c", null, 2))))
    val r = df.select(SpanFields(col("spans")).as("sf")).select("sf.*").collect()(0)
    assert(r.getAs[String]("text_text") === "first")
  }

  test("TextCounts compiles under strict codegen") {
    val df = spark.createDataFrame(java.util.List.of(
      Row("the quick brown fox!")),
      StructType(Seq(StructField("text", StringType))))
    val r = df.select(TextCounts(col("text")).as("tc")).select("tc.*").collect()(0)
    assert(r.getAs[Long]("token_count") === 4L)
  }

  test("TrieMatch compiles under strict codegen") {
    val bc = spark.sparkContext.broadcast(Mentions.buildTrie(Seq("fox", "佛教")))
    val df = spark.createDataFrame(java.util.List.of(
      Row("quick fox likes 佛教")),
      StructType(Seq(StructField("text", StringType))))
    val got = df.select(Mentions.trieMatch(col("text"), bc).as("m"))
      .select(explode(col("m")).as("w")).collect().map(_.getString(0)).toSet
    assert(got === Set("fox", "佛教"))
  }

  test("SignBucket + CosineSim compile under strict codegen") {
    val df = spark.createDataFrame(java.util.List.of(
      Row(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))),
      StructType(Seq(
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
    val r = df.select(
      CosineSim(col("a"), col("b")).as("cos"),
      SignBucket(col("a"), 4).as("bkt")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
  }

  test("base62 mid codec compiles under strict codegen (roundtrip)") {
    val df = spark.createDataFrame(java.util.List.of(Row("4419234098953795")),
      StructType(Seq(StructField("mid", StringType))))
    val r = df.select(
      Base62Expr.decodeMid(Base62Expr.encodeMid(col("mid"))).as("rt")).collect()(0)
    assert(r.getString(0) === "4419234098953795")
  }

  test("BestCell + VecNormalize compile under strict codegen") {
    val centType = ArrayType(StructType(Seq(
      StructField("cid", LongType),
      StructField("cv", ArrayType(DoubleType)))))
    val df = spark.createDataFrame(java.util.List.of(
      Row(Seq(3.0, 4.0), Seq(Row(0L, Seq(1.0, 0.0)), Row(1L, Seq(0.0, 1.0))))),
      StructType(Seq(
        StructField("v", ArrayType(DoubleType)),
        StructField("cents", centType))))
    val r = df.select(
      graft.functions.BestCell(col("v"), col("cents")).as("b"),
      graft.functions.VecNormalize(col("v")).as("nv")).collect()(0)
    val b = r.getStruct(0)
    assert(b.getLong(0) === 1L) // cos vs (0,1) = 0.8 > 0.6
    assert(math.abs(b.getDouble(1) - 0.8) < 1e-9)
    val nv = r.getSeq[Double](1)
    assert(math.abs(nv(0) - 0.6) < 1e-12 && math.abs(nv(1) - 0.8) < 1e-12)
  }
}
