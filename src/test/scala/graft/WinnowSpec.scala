package graft

import org.apache.spark.sql.functions._

import graft.dedup.Winnow

/** Winnowing (Schleimer 2003): the coverage guarantee — any shared
  * substring of length ≥ w+k−1 yields a shared fingerprint — plus
  * selection density and the degenerate-bucket guard. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 4

  test("docs sharing a >= w+k-1 substring share a fingerprint; disjoint docs don't") {
    val shared = "zqxjvkwpbyfmg" // 13 chars >= w+k-1 = 11, alphabet unused below
    val docs = Seq(
      (1L, s"aaaa bbbb cccc dddd $shared eeee ffff"),
      (2L, s"gggg hhhh iiii $shared jjjj kkkk llll"),
      (3L, "mmmm nnnn oooo pppp qqqq rrrr ssss tttt uuuu")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, k = k, w = w)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "planted shared substring must collide")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
    val pairs = Winnow.fingerprintPairs(docs, k = k, w = w, minShared = 1)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("selection density ~ 2/(w+1) and short docs emit nothing") {
    val text = ('a' to 'z').mkString("") * 20 // 520 chars, highly varied grams
    val docs = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val n = Winnow.fingerprints(docs, k = k, w = w)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!n.contains(2L))
    // periodic text collapses distinct fingerprints; just check the
    // selected set is a small fraction of all k-gram positions
    assert(n(1L) < text.length / 2 && n(1L) > 0)
  }

  test("fingerprint maxBucket guard drops boilerplate buckets") {
    val clones = spark.range(0, 30)
      .select($"id".as("doc_id"), lit("identical boilerplate text here").as("text"))
    assert(Winnow.fingerprintPairs(clones, minShared = 1).count() == 30L * 29 / 2)
    assert(Winnow.fingerprintPairs(clones, minShared = 1, maxBucket = 5).count() == 0)
  }
}
