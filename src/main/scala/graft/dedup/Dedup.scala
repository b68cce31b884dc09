package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the 100 TB story):
  *  - Exact dedup is a hash-groupBy — one shuffle on a 32-hex-char key,
  *    uniformly distributed by construction.
  *  - MinHash/LSH never compares all pairs: shingle → k min-hashes →
  *    band signatures → self-join ON band bucket. Candidate pairs are
  *    only generated inside buckets, so the join is an equi-join Catalyst
  *    executes as a shuffled hash join on the band key.
  *  - All hashes are md5-derived so results are engine-independent
  *    (reproducible against the DuckDB oracle and across Spark versions —
  *    no dependence on Spark's internal Murmur3 seeds).
  */
object Dedup {

  /** Exact duplicate groups: md5 over normalized text, keep the lowest id
    * as canonical. Returns (content_key, canonical_id, dup_count). */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_key", md5(lower(trim(col(textCol)))))
      .groupBy("content_key")
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))

  /** Exact-dedup projection: keep one row per distinct content. */
  def dropExactDuplicates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(lower(trim(col(textCol))))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Word-level shingles of size n as an array column (null-free).
    * transform over a slide of the word array — no explode needed. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val words = split(trim(regexp_replace(lower(textCol), "[^a-z0-9 ]", " ")), "\\s+")
    val count = size(words) - (n - 1)
    // guard: sequence(0, -1) would generate a DESCENDING range, not empty
    when(count > 0,
      transform(
        sequence(lit(0), count - 1),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array())
  }

  /** One MinHash value: the lexicographic min of md5(salt || shingle) —
    * a universal-ish hash family indexed by salt, engine-independent. */
  def minhash(shingleArr: Column, salt: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(salt.toString + "|"), s))))

  /** MinHash signatures + LSH band keys. numHashes = bands × rowsPerBand.
    * Band key b = md5 of the concatenated minhashes in that band. */
  def withMinhashBands(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    val sh = shingles(col(textCol), shingleSize)
    val withSh = docs.withColumn("__sh", sh).where(size(col("__sh")) > 0)
    val mh = (0 until bands * rowsPerBand).map(i => minhash(col("__sh"), i))
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => mh(b * rowsPerBand + r))
      md5(concat_ws("|", slice: _*)).as(s"band_$b")
    }
    withSh.select(col(idCol) +: bandCols: _*)
  }

  /** LSH candidate pairs: ids sharing any band bucket (deduplicated).
    * Each band is an equi-self-join on its bucket key; the union of bands
    * is then distinct-ed. Bucket sizes are data-dependent — salting is
    * unnecessary because md5 buckets only collide for near-duplicates. */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    val sig = withMinhashBands(docs, idCol, textCol, shingleSize, bands, rowsPerBand)
      .persist()
    val pairs = (0 until bands).map { b =>
      val l = sig.select(col(idCol).as("id_a"), col(s"band_$b").as("__bk"))
      val r = sig.select(col(idCol).as("id_b"), col(s"band_$b").as("__bk"))
      l.join(r, "__bk").where(col("id_a") < col("id_b")).select("id_a", "id_b")
    }
    pairs.reduce(_ unionByName _).distinct()
  }

  /** n-gram (word-shingle) Jaccard similarity for a candidate pair —
    * |A∩B| / |A∪B| over distinct shingles. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val union = (size(ad) + size(bd)).cast("double") - inter
    when(union > 0, inter / union).otherwise(0.0)
  }

  /** Full near-dup pipeline: LSH candidates → verify with exact Jaccard ≥
    * threshold. Returns (id_a, id_b, jaccard). The verify join re-reads
    * only candidate rows — at scale the candidate set is ≪ n². */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, shingleSize, bands, rowsPerBand)
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__shb")), "id_b")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash (Charikar 2002): 32-bit fingerprint where bit i is the sign
    * of the sum over words of ±1 according to bit i of md5(word).
    * Hamming-near fingerprints ⇒ similar documents. Pure column algebra:
    * per-word 32-bit value from the first 8 md5 hex chars, then a
    * bit-count aggregate per position. */
  def simhash(textCol: Column, bits: Int = 32): Column = {
    val words = array_distinct(
      split(trim(regexp_replace(lower(textCol), "[^a-z0-9 ]", " ")), "\\s+"))
    val hashes = transform(words, w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { i =>
      // votes for bit i: +1 when set, −1 when clear; MSB of the fingerprint
      val votes = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column, bits: Int = 32): Column =
    (0 until bits)
      .map(i => shiftright(a.bitwiseXOR(b), i).bitwiseAND(1L))
      .reduce(_ + _)

  /** Embedding-cosine near-duplicates within blocking buckets: candidate
    * pairs share a coarse bucket (provided column), verified by cosine ≥
    * threshold. For unblocked ANN use [[graft.sim.Similarity]]. */
  def embeddingNearDuplicates(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      bucketCol: String,
      threshold: Double): DataFrame = {
    val l = embs.select(col(idCol).as("id_a"), col(vecCol).as("__va"), col(bucketCol).as("__bk"))
    val r = embs.select(col(idCol).as("id_b"), col(vecCol).as("__vb"), col(bucketCol).as("__bk"))
    l.join(r, "__bk")
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.sim.Similarity.cosine(col("__va"), col("__vb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Canonical-fingerprint dedup (word-order-insensitive exact dup). */
  def canonicalGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.canonicalFingerprint(col(textCol)))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))
}
