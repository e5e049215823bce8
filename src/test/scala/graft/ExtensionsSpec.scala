package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the native codec expressions resolve from SQL and stay
  * out of the UDF path (no ScalaUDF in the plan). */
class ExtensionsSpec extends AnyFunSuite {

  test("encode_mid/decode_mid resolve as native SQL functions via extensions") {
    // ensure the shared context exists, then create a FRESH session with
    // the extensions conf (getOrCreate would silently reuse the shared
    // session and skip extension injection); never stop() — that would
    // kill the JVM-shared SparkContext under the other suites
    val shared = TestSpark.spark
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf — honored when the
      // SparkContext is created (spark-submit --conf); over an existing
      // test context the programmatic builder hook is the equivalent
      val spark = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions()(_))
        .getOrCreate()
      assert(spark ne shared)
      val row = spark.sql(
        "SELECT encode_mid('4418719168191891') AS c, " +
          "decode_mid(encode_mid('4418719168191891')) AS back")
      val r = row.collect()(0)
      assert(r.getString(1) === "4418719168191891")
      assert(r.getString(0).length === 9) // 1 + 4 + 4 coded segments
      val plan = row.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF"), s"codec fell back to a UDF:\n$plan")

      // the ANN natives resolve from SQL too, same values as the column API
      // — written with DECIMAL literals (the natural SQL spelling): the
      // implicit-cast input types must coerce them, not crash at runtime
      val ann = spark.sql(
        "SELECT round(cosine_sim(array(1.0, 0.0), array(1.0, 1.0)), 6) AS c, " +
          "sign_bucket(array(1.0, 0.5, -2.0), 8) AS b").collect()(0)
      assert(math.abs(ann.getDouble(0) - 0.707107) < 1e-6)
      import org.apache.spark.sql.functions._
      val viaCol = spark.range(1)
        .select(graft.datapipe.Similarity.signBucket(
          array(lit(1.0), lit(0.5), lit(-2.0)), 8).as("b"))
        .collect()(0).getLong(0)
      assert(ann.getLong(1) === viaCol)

      // the fused one-walk natives resolve from SQL too — whole struct
      // surface, same values as the DataFrame API
      val tc = spark.sql(
        "SELECT text_counts('The quick fox. The fox!').token_count AS t, " +
          "text_counts('The quick fox. The fox!').distinct_tokens AS d, " +
          "text_counts('The quick fox. The fox!').stopword_count AS s, " +
          "text_counts('The quick fox. The fox!').punct_count AS p").collect()(0)
      assert(tc.getInt(0) === 5 && tc.getInt(1) === 4)
      assert(tc.getInt(2) === 2) // 'The' ×2 (case-insensitive stopword)
      assert(tc.getInt(3) === 2) // one '.' + one '!'
      val tcPlan = spark.sql("SELECT text_counts('x').char_count AS c")
        .queryExecution.executedPlan.toString
      assert(!tcPlan.contains("ScalaUDF"), s"text_counts fell back to a UDF:\n$tcPlan")

      val sf = spark.sql(
        "SELECT span_fields(array(" +
          "named_struct('kind', 'text', 'text', 'hello world', 'media_ref', CAST(NULL AS STRING), 'offset', 3), " +
          "named_struct('kind', 'uname', 'text', 'bob', 'media_ref', CAST(NULL AS STRING), 'offset', 1), " +
          "named_struct('kind', 'text', 'text', 'later span', 'media_ref', CAST(NULL AS STRING), 'offset', 9)" +
          ")) AS f").select("f.text_text", "f.text_off", "f.uname_text", "f.is_comment")
        .collect()(0)
      assert(sf.getString(0) === "hello world") // min-offset text span wins
      assert(sf.getInt(1) === 3)
      assert(sf.getString(2) === "bob")
      assert(!sf.getBoolean(3))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
