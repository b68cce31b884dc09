package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (AllPairs,
  * Bayardo et al., WWW 2007 "Scaling Up All Pairs Similarity Search";
  * the length + prefix filters of PPJoin, Xiao et al., WWW 2008).
  *
  * Complements the probabilistic [[Dedup.minhashCandidates]] pipeline:
  * MinHash+LSH trades recall for speed (a pair above threshold can miss
  * every band), while the prefix filter is LOSSLESS — every pair with
  * Jaccard ≥ θ is guaranteed to collide on at least one prefix token,
  * so the output is exactly the θ-similarity join, suitable when the
  * dedup decision must be auditable (legal takedowns, benchmark
  * decontamination with a hard guarantee).
  *
  * Why it scales: each document keeps only its `p = s − ⌈θ·s⌉ + 1`
  * GLOBALLY RAREST tokens as join keys (ordering tokens by ascending
  * corpus frequency — the canonical AllPairs ordering — makes prefix
  * buckets the rare-token buckets), so candidate mass is
  * Σ_rare-token C(df, 2), not C(n, 2). The expensive exact verify runs
  * only on candidate pairs that also pass the length filter
  * (min(s_a,s_b) ≥ θ·max(s_a,s_b)). All joins are shuffle equi-joins on
  * (token) and (doc id) — no cartesian anywhere; at 100 TB the token
  * frequency join and the prefix self-join shuffle ∝ corpus tokens and
  * ∝ collision mass respectively.
  *
  * Degenerate-data guard: a token that is simultaneously globally
  * frequent AND in many docs' prefixes (only possible when θ is low or
  * docs are tiny) would concentrate O(m²) candidate pairs in one task.
  * Prefix buckets above `maxBucket` are dropped before pair expansion
  * and surface in the `prefix_buckets` observe metric
  * (`rows_in_overflow` MUST be 0 for the exactness contract to hold —
  * a non-zero value says raise θ or the shingle width, it does not
  * silently pass).
  *
  * Cross-engine determinism: the θ comparisons are integer
  * (`inter·10⁶ ≥ round(θ·10⁶)·union`), so no float threshold sits in
  * the filter path; the reported `jaccard` is a single per-row IEEE
  * division.
  */
object SetJoin {

  /** Distinct word-`width`-gram shingle set of `textCol`, lowercase,
    * split on single spaces (the corpus' own delimiter). Docs with
    * fewer than `width` words produce an empty set and drop out. */
  private def shingles(textCol: Column, width: Int): Column = {
    val ws = split(lower(textCol), " ")
    // sequence(0, n) DESCENDS when n < 0 (then element_at(…, 0) throws),
    // so short docs must short-circuit to an empty set before transform
    when(size(ws) >= width,
      array_distinct(transform(
        sequence(lit(0), size(ws) - width),
        i => concat_ws(" ", (0 until width).map(j => element_at(ws, (i + j + 1).cast("int"))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** All pairs (id_a < id_b) with shingle-set Jaccard ≥ `theta`:
    * (doc_a, doc_b, inter_size, union_size, jaccard). Exact — no
    * sampling, no hashing — provided the `prefix_buckets` overflow
    * metric stays 0 (see object doc). */
  def prefixFilterJoin(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      theta: Double = 0.5,
      shingleWidth: Int = 3,
      maxBucket: Int = 100000): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta must be in (0, 1], got $theta")
    val thetaMicro = math.round(theta * 1e6)

    // (doc, token) pairs — evaluated by three consumers (doc freq,
    // prefix, verify sets), so truncate the shingling work once.
    val tok = docs
      .select(col(idCol).as("__id"), explode(shingles(col(textCol), shingleWidth)).as("__t"))
      .localCheckpoint(eager = false)

    // Canonical AllPairs ordering: ascending corpus frequency, token
    // string as the total-order tiebreaker. Kept as a SORT KEY inside
    // each doc's array — no global rank materialization (a global
    // row_number over the vocabulary would be a single-partition
    // window; struct sort gives the same order for free).
    val docFreq = tok.groupBy("__t").agg(count(lit(1)).as("__df"))

    val sorted = tok
      .join(docFreq, "__t")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__st"),
        count(lit(1)).as("__s"))
    // p = s − ⌈θ·s⌉ + 1 rarest tokens are the doc's join keys
    val prefixed = sorted.select(
      col("__id"), col("__s"),
      slice(col("__st.__t"), lit(1),
        (col("__s") - ceil(col("__s") * theta) + 1).cast("int")).as("__pfx"))

    val prefixTok = prefixed
      .select(col("__id"), col("__s"), explode(col("__pfx")).as("__t"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__t")))
      .observe("prefix_buckets",
        sum(when(col("__n") > maxBucket, 1L).otherwise(0L)).as("rows_in_overflow"),
        max(col("__n")).as("max_bucket"))
      .where(col("__n") <= maxBucket)

    // candidate pairs: share a prefix token + two-sided length filter
    val a = prefixTok.select(col("__t"), col("__id").as("__ida"), col("__s").as("__sa"))
    val b = prefixTok.select(col("__t"), col("__id").as("__idb"), col("__s").as("__sb"))
    val cands = a.join(b, Seq("__t"))
      .where(col("__ida") < col("__idb") &&
        least(col("__sa"), col("__sb")) * lit(1000000L) >= lit(thetaMicro) * greatest(col("__sa"), col("__sb")))
      .select("__ida", "__idb").distinct()

    // exact verify on candidates only: |A∩B| via array_intersect over
    // the docs' (bounded-length) shingle sets
    val sets = tok.groupBy("__id")
      .agg(collect_list(col("__t")).as("__set"), count(lit(1)).as("__s"))
    val verified = cands
      .join(sets.select(col("__id").as("__ida"), col("__set").as("__seta"), col("__s").as("__sa")), "__ida")
      .join(sets.select(col("__id").as("__idb"), col("__set").as("__setb"), col("__s").as("__sb")), "__idb")
      .select(col("__ida").as("doc_a"), col("__idb").as("doc_b"),
        size(array_intersect(col("__seta"), col("__setb"))).cast("long").as("inter_size"),
        col("__sa"), col("__sb"))
      .withColumn("union_size", col("__sa") + col("__sb") - col("inter_size"))
      .where(col("inter_size") * lit(1000000L) >= lit(thetaMicro) * col("union_size"))

    verified.select(col("doc_a"), col("doc_b"), col("inter_size"), col("union_size"),
      (col("inter_size").cast("double") / col("union_size")).as("jaccard"))
  }
}
