package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram,
  * slide a w-wide window over the hash sequence, and keep each
  * window's MINIMUM hash. The guarantee: any shared substring of
  * length ≥ w + k − 1 between two documents yields at least one shared
  * fingerprint, while only ~2/(w+1) of all k-grams are kept — the
  * character-level complement to the word-shingle families
  * ([[Dedup.minhashCandidates]] probabilistic, [[SetJoin]] exact-set,
  * [[Dedup.exactSubstringGroups]] exact-substring).
  *
  * Plan shape: k-gram hashing AND window-min selection happen inside
  * ONE per-row array expression chain (transform + slice + array_min —
  * codegen, zero shuffle, no per-position explode of the corpus); only
  * the ~2/(w+1)-selected fingerprints are exploded. The pair stage is
  * the usual bucketed equi-join with a `winnow_buckets` maxBucket
  * drop+observe guard, so pair mass ∝ shared-fingerprint collisions.
  *
  * Determinism: the hash is an explicit Horner polynomial
  * (base 257 mod 2³¹−1) over character code points — plain integer
  * arithmetic either engine reproduces exactly; no engine-internal
  * hash function is in the result path.
  */
object Winnow {

  private val Base = 257L
  private val Mod = 2147483647L // 2^31 - 1

  /** Distinct winnowed fingerprints per document: `(id, fingerprint)`.
    * Documents shorter than w + k − 1 characters emit nothing. */
  def fingerprints(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 8,
      w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    // Materialize the per-character CODE ARRAY once per row (split
    // scans the string linearly); the k-gram hash then reads it by
    // O(1) `element_at`. The first formulation took each character via
    // `substr(i, 1)` — a UTF-8 seek from the string start, O(i) per
    // character and O(k·L²) per document: 39 s at sf0.1 for wn1 vs
    // ~1.5 s for this shape (the round-6 honest-bench catch). Same
    // hash values — only the access pattern changed.
    val cs = col("__cs")
    // Horner hash of the k-gram at 1-based position i. The reduction is
    // applied every THIRD step and at the end — congruent to per-step
    // mod (reducing less often never changes the residue), and the
    // worst intermediate is Mod·257³ ≈ 3.6e16, comfortably inside a
    // long. One-third the modulo ops on the hot path.
    def hAt(i: Column): Column =
      (0 until k).foldLeft(lit(0L)) { (h, j) =>
        val step = h * Base + element_at(cs, i + j).cast("long")
        if (j % 3 == 2 || j == k - 1) step % Mod else step
      }
    val hashes = transform(sequence(lit(1), size(cs) - (k - 1)), i => hAt(i))
    // windows of w consecutive hashes; keep each window's min; distinct
    val fps = array_distinct(transform(
      sequence(lit(0), size(col("__hs")) - w),
      j => array_min(slice(col("__hs"), j + 1, lit(w)))))
    docs
      .select(col(idCol).as("__id"), lower(col(textCol)).as("__lt"))
      .where(length(col("__lt")) >= w + k - 1)
      // slice to exactly L entries: Java regex split with limit −1
      // (Spark's behavior) appends a trailing "" element
      .withColumn("__cs", transform(
        slice(split(col("__lt"), ""), lit(1), length(col("__lt"))), c => ascii(c)))
      .withColumn("__hs", hashes)
      .select(col("__id").as(idCol), explode(fps).as("fingerprint"))
  }

  /** Document pairs sharing ≥ `minShared` winnowed fingerprints:
    * `(doc_a, doc_b, shared)`. Fingerprint buckets above `maxBucket`
    * (boilerplate shared by everything) are dropped before pair
    * expansion — observable via `winnow_buckets`. */
  def fingerprintPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 8,
      w: Int = 4,
      minShared: Int = 2,
      maxBucket: Int = 10000): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("fingerprint")))
      .observe("winnow_buckets",
        sum(when(col("__n") > maxBucket, 1L).otherwise(0L)).as("rows_in_overflow"),
        max(col("__n")).as("max_bucket"))
      .where(col("__n") <= maxBucket)
      .localCheckpoint(eager = false)
    fps.select(col("fingerprint"), col(idCol).as("__a"))
      .join(fps.select(col("fingerprint"), col(idCol).as("__b")), Seq("fingerprint"))
      .where(col("__a") < col("__b"))
      .groupBy(col("__a").as("doc_a"), col("__b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
