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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
