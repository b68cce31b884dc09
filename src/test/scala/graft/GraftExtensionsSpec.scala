package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, size}
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions registration: the native expressions are
  * reachable from pure SQL in a session built with
  * `spark.sql.extensions=graft.GraftExtensions`, and SQL results are
  * bit-identical to the Scala-API forms (same Expression class behind
  * both). The extension session shares the JVM's SparkContext; the
  * suite restores the shared default session afterward. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("SQL surface: graft_dot/sqdist/simhash/shingles/nfc/gopher " +
    "resolve and match the Scala-API expressions") {
    val s = spark
    import s.implicits._
    Seq((1L, "The Quick brown fox jumps over the lazy dog tonight."))
      .toDF("id", "text").createOrReplaceTempView("docs")
    Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")

    val row = s.sql(
      "SELECT graft_dot(a, b) AS d, graft_sqdist(a, b) AS q FROM vecs").head
    assert(row.getDouble(0) == 32.0 && row.getDouble(1) == 27.0)

    val sh = s.sql(
      """SELECT graft_simhash(text, 64) AS h,
        |       size(graft_shingles(text, 3)) AS n3,
        |       graft_nfc(text) AS nfc,
        |       graft_gopher(text).tok AS w
        |FROM docs""".stripMargin).head

    // parity with the Scala API on the same input
    val api = Seq("The Quick brown fox jumps over the lazy dog tonight.")
      .toDF("text")
      .select(
        graft.functions.SimHash.simhashNative(col("text"), 64).as("h"),
        size(graft.functions.MinHashShingles
          .shingleArrayNative(col("text"), 3)).as("n3"))
      .head
    assert(sh.getLong(0) == api.getLong(0))
    assert(sh.getInt(1) == api.getInt(1))
    assert(sh.getString(2).nonEmpty)
    assert(sh.getAs[Number](3).longValue > 0)

    // literal contract: a non-literal bits argument fails loudly
    val e = intercept[Exception](
      s.sql("SELECT graft_simhash(text, CAST(id AS INT)) FROM docs").head)
    assert(e.getMessage.contains("INT literal") ||
      Option(e.getCause).exists(_.getMessage.contains("INT literal")))

    // jaro-winkler through the SQL surface = the Scala API value
    val jw = s.sql(
      "SELECT round(graft_jaro_winkler('martha', 'marhta'), 6) AS j").head
    assert(jw.getDouble(0) == 0.961111)

    // winnowing through the SQL surface = the Scala kernel verbatim
    val wn = s.sql(
      "SELECT graft_winnow('the winnowing of documents', 8, 4) AS f").head
    val kernel = graft.dedup.Winnow
      .winnowScalar("the winnowing of documents", 8, 4).toSeq
    assert(wn.getSeq[Long](0) == kernel && kernel.nonEmpty)
    // graft_sorted_intersect: the set-join verify kernel over SQL
    val si = s.sql(
      "SELECT graft_sorted_intersect(array(1L, 3L, 5L), array(2L, 3L, 5L, 9L)) AS n")
      .head.getLong(0)
    assert(si == 2L)
    // graft_md5_prefix60: the KMV unit hash — equal to the hex chain,
    // null-propagating
    val mp = s.sql(
      "SELECT graft_md5_prefix60('kmv|k1') AS h, " +
        "CAST(conv(substring(md5('kmv|k1'), 1, 15), 16, 10) AS BIGINT) AS c, " +
        "graft_md5_prefix60(CAST(NULL AS STRING)) AS nl").head
    assert(mp.getLong(0) == mp.getLong(1) && mp.isNullAt(2))
  }
}
