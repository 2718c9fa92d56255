package graft

import org.apache.spark.sql.SparkSession

/** The extension path must expose the native functions without any
  * driver-side register() call. getOrCreate reuses the default session (and
  * ignores new confs), so temporarily clear it; the new session shares the
  * JVM-wide SparkContext and must NOT be stopped (that would stop the
  * context for every other suite). */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=graft.GraftExtensions exposes the native functions in SQL") {
    spark.sparkContext // ensure the shared session/context exist first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // the spark.sql.extensions STATIC conf is only read at SparkContext
      // creation, which already happened in this test JVM — exercise the
      // same injector through the public withExtensions builder hook
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val row = s2.sql(
        """SELECT cosine_sim(array(1d, 2d), array(2d, 4d)) AS c,
          |       word_ngrams(array('a', 'b', 'c', 'd'), 3) AS g,
          |       minhash_signatures(array('a', 'b'), 2) AS m""".stripMargin).head
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
      assert(row.getSeq[Long](2).length == 2)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
