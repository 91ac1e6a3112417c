package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-based injection path (`spark.sql.extensions`): a session
  * built with GraftExtensions must resolve every native function in SQL
  * with no imperative ensureRegistered call. Reuses the suite-wide
  * SparkContext — only the session (and its function registry) is new. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a GraftExtensions session resolves all native functions in SQL") {
    SparkSpec.session // ensure the shared context exists first
    val prev = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    // getOrCreate returns the active/default session as-is (extensions are
    // applied only at session construction) — clear both so a NEW session
    // is built on the existing context with the extensions config
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // .config("spark.sql.extensions", "graft.GraftExtensions") is the
      // production route, but it is a STATIC conf — only honored when the
      // SparkContext itself is new. Reusing the suite's context, the
      // equivalent injection point is builder.withExtensions.
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT
          |  repetition_ratio('a b a b a b a b', 3) AS rr,
          |  simhash16('x y') AS sh,
          |  octet_length(binary_stride(encode('abcdef', 'UTF-8'), 2)) AS bs,
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
          |  vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |             CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS vc
          |""".stripMargin).collect()(0)
      assert(r.getDouble(0) === 0.333333)
      assert(r.getString(1).length === 16)
      assert(r.getInt(2) === 3)
      assert(r.getDouble(3) === 11.0)
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
      val agg = s2.sql(
        "SELECT kmv_distinct(x, 64) FROM VALUES (1), (2), (3), (2) AS t(x)")
        .collect()(0).getLong(0)
      assert(agg === 3L)
      val e = intercept[Exception](s2.sql("SELECT simhash16('a', 'b')").collect())
      assert(e.getMessage.contains("expects 1 argument"))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
