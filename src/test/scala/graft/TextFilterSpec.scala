package graft

import org.apache.spark.sql.functions._

import graft.text.{Pii, TextAnalysis}

/** Gopher-style repetition filters and PII scrubbing. The oracle query
  * (tx8/tx9) pins cross-engine parity on the corpus; these goldens pin
  * the semantics the corpus can't exercise — multi-line boilerplate,
  * bullet/ellipsis lines, and each PII pattern individually.
  */
class TextFilterSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head.get(0)

  test("dupLineFraction: repeated nav/footer lines, blank lines ignored") {
    val doc = "Home | About\nreal content here\n\nHome | About\nmore content"
    // 4 non-blank lines, 3 distinct -> 1/4 duplicated
    assert(one(doc, TextAnalysis.dupLineFraction(col("text"))) == 0.25)
    assert(one("single line", TextAnalysis.dupLineFraction(col("text"))) == 0.0)
    assert(one("", TextAnalysis.dupLineFraction(col("text"))) == 0.0)
  }

  test("bullet and ellipsis line fractions") {
    val doc = "- item one\n* item two\nplain line\nteaser ends here...\nanother…"
    assert(one(doc, TextAnalysis.bulletLineFraction(col("text"))) == 0.4)
    assert(one(doc, TextAnalysis.ellipsisLineFraction(col("text"))) == 0.4)
  }

  test("top/dup n-gram fractions: golden on a crafted doc") {
    // words: a b a b c -> bigrams: [a b, b a, a b, b c]; top "a b" = 2/4
    val doc = "a b a b c"
    assert(one(doc, TextAnalysis.topNgramFraction(col("text"), 2)) == 0.5)
    // trigrams: [a b a, b a b, a b c] all distinct -> dup 0
    assert(one(doc, TextAnalysis.dupNgramFraction(col("text"), 3)) == 0.0)
    // fully repetitive: "x y x y x y" bigrams [x y, y x, x y, y x, x y]
    // -> 3 distinct? no: 2 distinct of 5 -> dup = 0.6
    assert(one("x y x y x y", TextAnalysis.dupNgramFraction(col("text"), 2)) == 0.6)
    // shorter than n -> empty gram array -> 0
    assert(one("solo", TextAnalysis.topNgramFraction(col("text"), 2)) == 0.0)
  }

  test("topNgramFraction sorted-run form equals the naive quadratic " +
    "count on randomized docs") {
    val words = Seq("alpha", "beta", "gamma", "delta", "x1", "y2")
    val rnd = new scala.util.Random(42)
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40) + 1)(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    def naive(g: org.apache.spark.sql.Column) =
      when(size(g) > 0,
        round(array_max(transform(g, x => size(filter(g, y => y === x))))
          .cast("double") / size(g), 6)).otherwise(0.0)
    val out = docs.select(
      TextAnalysis.topNgramFraction(col("text"), 2).as("fast"),
      naive(TextAnalysis.wordNgrams(col("text"), 2)).as("slow"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native GopherSignals is value-identical to the column reference " +
    "forms on edge cases and randomized docs") {
    val words = Seq("alpha", "beta", "gamma", "Delta", "x9", "#tag", "it's")
    val rnd = new scala.util.Random(7)
    val edge = Seq(
      "", " ", "   ", "\t", "\n\n", "!!!", "a", "a b",
      "- bullet one\n- bullet two\nplain",
      "truncated line...\nanother…\nplain line",
      "dup\ndup\ndup\nother",
      "# lots # of # symbols # here # now",
      "repeat repeat repeat repeat repeat repeat",
      "line with trailing spaces   \n   leading spaces",
      "ends with newline\n", "Ünïcodé tëxt with áccents",
      "a  b   c    d") // multi-space runs
    val random = Seq.tabulate(40) { _ =>
      Seq.fill(rnd.nextInt(60) + 1) {
        if (rnd.nextInt(8) == 0) "\n" else words(rnd.nextInt(words.size))
      }.mkString(" ")
    }
    val docs = (edge ++ random).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val g = TextAnalysis.gopherSignals(col("text"))
    val out = docs.select(
      col("doc_id"),
      g.getField("tok").as("n_tok"),
      g.getField("mwl").as("n_mwl"),
      g.getField("top2gram_frac").as("n_top2"),
      g.getField("dup3gram_frac").as("n_dup3"),
      g.getField("dup_line_frac").as("n_dupl"),
      g.getField("bullet_line_frac").as("n_bul"),
      g.getField("ellipsis_line_frac").as("n_ell"),
      g.getField("symbol_ratio").as("n_sym"),
      g.getField("keep").as("n_keep"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("r_tok"),
      TextAnalysis.meanWordLength(col("text")).as("r_mwl"),
      TextAnalysis.topNgramFraction(col("text"), 2).as("r_top2"),
      TextAnalysis.dupNgramFraction(col("text"), 3).as("r_dup3"),
      TextAnalysis.dupLineFraction(col("text")).as("r_dupl"),
      TextAnalysis.bulletLineFraction(col("text")).as("r_bul"),
      TextAnalysis.ellipsisLineFraction(col("text")).as("r_ell"),
      round(TextAnalysis.symbolWordRatio(col("text")), 6).as("r_sym"),
      TextAnalysis.gopherKeep(col("text")).as("r_keep"))
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == r.getLong(10), s"tok doc $id")
      assert(r.getDouble(2) == r.getDouble(11), s"mwl doc $id")
      assert(r.getDouble(3) == r.getDouble(12), s"top2 doc $id")
      assert(r.getDouble(4) == r.getDouble(13), s"dup3 doc $id")
      assert(r.getDouble(5) == r.getDouble(14), s"dup_line doc $id")
      assert(r.getDouble(6) == r.getDouble(15), s"bullet doc $id")
      assert(r.getDouble(7) == r.getDouble(16), s"ellipsis doc $id")
      assert(r.getDouble(8) == r.getDouble(17), s"symbol doc $id")
      assert(r.getBoolean(9) == r.getBoolean(18), s"keep doc $id")
    }
  }

  test("gopherKeep drops short, repetitive, and symbol-heavy docs") {
    val good = (1 to 30).map(i => s"alpha$i beta$i gamma$i delta$i").mkString(" ")
    val short = "too short to keep"
    val repetitive = Seq.fill(40)("buy now buy now").mkString(" ")
    val hashy = (1 to 30).map(i => s"## header$i #tag").mkString(" ")
    val df = Seq(good, short, repetitive, hashy).toDF("text")
      .select(TextAnalysis.gopherKeep(col("text")).as("k"))
    assert(df.as[Boolean].collect().toSeq == Seq(true, false, false, false))
  }

  test("NFC normalization composes decomposed glyphs; cleanText strips " +
    "controls and collapses runs idempotently (tx11)") {
    val decomposed = "cafe\u0301 and A\u030A"
    val composed = "café and Å"
    assert(one(decomposed, TextAnalysis.nfcNormalize(col("text"))) == composed)
    // already-NFC text passes through unchanged
    assert(one(composed, TextAnalysis.nfcNormalize(col("text"))) == composed)
    val messy = "  a\u0007b  c\t\td  \nline2  "
    assert(one(messy, TextAnalysis.cleanText(col("text"))) == "ab c d \nline2")
    // idempotent: cleaning clean text is the identity
    val once = one(messy, TextAnalysis.cleanText(col("text"))).asInstanceOf[String]
    assert(one(once, TextAnalysis.cleanText(col("text"))) == once)
    // CRLF and LF encodings of the same content clean identically
    assert(one("line1\r\nline2\r\n", TextAnalysis.cleanText(col("text"))) ==
      one("line1\nline2\n", TextAnalysis.cleanText(col("text"))))
  }

  test("PII counts and typed redaction") {
    val doc = "mail bob.smith+x@corp.example.org, host 192.168.0.1, " +
      "call 415-555-0042 or ssn 078-05-1120 end"
    val row = Seq(doc).toDF("text").select(
      Pii.emailCount(col("text")).as("e"),
      Pii.ipv4Count(col("text")).as("i"),
      Pii.phoneCount(col("text")).as("p"),
      Pii.ssnCount(col("text")).as("s"),
      Pii.redact(col("text")).as("r")).head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == ((1L, 1L, 1L, 1L)))
    assert(row.getString(4) ==
      "mail <EMAIL>, host <IP>, call <PHONE> or ssn <SSN> end")
  }

  test("PII: no false hits on clean text; redact is identity") {
    val clean = "plain words 12 34 and a-b-c nothing to scrub"
    assert(one(clean, Pii.piiCount(col("text"))) == 0L)
    assert(one(clean, Pii.redact(col("text"))) == clean)
  }

  test("charEntropy: histogram goldens, uniform vs constant text, " +
    "empty docs dropped") {
    val docs = Seq(
      (1L, "aabb"),   // 2×a + 2×b: H = ln4 − (4·ln2)/4 = ln2
      (2L, "aaaa"),   // single symbol: H = 0
      (3L, ""))       // no chars → dropped
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 4L)
    assert(out(1L)._2 == 0.693147) // ln 2 @ 6dp via the micro-nat path
    assert(out(2L) == ((4L, 0.0)))
  }

  test("script census: per-range counts, dominance priority, empty text " +
    "(tx19)") {
    val df = Seq(
      (1L, "abc привет"),     // latin 3, cyrillic 6 → cyrillic dominates
      (2L, "hello world 123"), // latin 10, digits 3 → latin
      (3L, "你好世界"),         // cjk 4
      (4L, "مرحبا abcde"),     // arabic 5 = latin 5 → tie → latin priority
      (5L, ""))
      .toDF("doc_id", "t")
    val counts = TextAnalysis.scriptCounts(col("t")).toMap
    val out = df.select(col("doc_id"),
      counts("latin").as("l"), counts("cyrillic").as("c"),
      counts("cjk").as("k"), counts("arabic").as("a"),
      counts("digit").as("d"),
      TextAnalysis.nonSpaceChars(col("t")).as("n"),
      TextAnalysis.dominantScript(col("t")).as("dom"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("l") == 3 && out(1L).getAs[Long]("c") == 6)
    assert(out(1L).getAs[String]("dom") == "cyrillic")
    assert(out(2L).getAs[Long]("d") == 3 && out(2L).getAs[String]("dom") == "latin")
    assert(out(3L).getAs[Long]("k") == 4 && out(3L).getAs[String]("dom") == "cjk")
    assert(out(4L).getAs[Long]("a") == 5 && out(4L).getAs[String]("dom") == "latin")
    assert(out(5L).getAs[Long]("n") == 0 && out(5L).getAs[String]("dom") == "none")
    assert(out(1L).getAs[Long]("n") == 9) // space excluded
  }

  test("typeTokenRatio: diversity ratio, repetition lowers it, empty 0 " +
    "(tx20)") {
    val df = Seq(
      (1L, "all words are fully distinct"),
      (2L, "spam spam spam spam"),
      (3L, ""),
      (4L, "Mixed CASE mixed case")) // normalization folds case
      .toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      TextAnalysis.typeTokenRatio(col("t")).as("ttr"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.25)
    assert(out(3L) == 0.0)
    assert(out(4L) == 0.5)
  }

  test("encoding damage: replacement/control/mojibake counts and the " +
    "suspect verdict (tx24)") {
    val df = Seq(
      (1L, "caf�e"),               // decoder gave up
      (2L, "clean text, nothing odd"),
      (3L, "weird\u0001byte\ttab ok"),  // C0 control (tab exempt)
      (4L, "SÃ£o Paulo Ã© Ã³timo hÃ¡"), // 4 double-decode hits
      (5L, "SÃo alone"))                // 1 hit: below tolerance
      .toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      TextAnalysis.replacementCharCount(col("t")).as("r"),
      TextAnalysis.controlCharCount(col("t")).as("c"),
      TextAnalysis.mojibakeCount(col("t")).as("m"),
      TextAnalysis.encodingSuspect(col("t")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((1, 0, 0, true)))
    assert(out(2L) == ((0, 0, 0, false)))
    assert(out(3L) == ((0, 1, 0, true)))
    assert(out(4L)._3 == 4 && out(4L)._4)
    assert(out(5L) == ((0, 0, 1, false)))
  }

  test("fleschReadingEase: exact counts, vowel-group syllables, null " +
    "for wordless text (tx23)") {
    val df = Seq(
      (1L, "Hello world. Quick test!"),
      (2L, "no terminator here"),
      (3L, "..."),
      (4L, ""))
      .toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      TextAnalysis.sentenceCount(col("t")).as("s"),
      TextAnalysis.syllableEstimate(col("t")).as("syl"),
      TextAnalysis.fleschReadingEase(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // 2 sentences, 4 words, 5 vowel groups (e,o | o | ui | e)
    assert(out(1L).getAs[Int]("s") == 2)
    assert(out(1L).getAs[Int]("syl") == 5)
    val expected = 206.835 - 1.015 * (4.0 / 2) - 84.6 * (5.0 / 4)
    assert(math.abs(out(1L).getAs[Double]("f") - expected) < 1e-6)
    // no terminal punctuation: one sentence
    assert(out(2L).getAs[Int]("s") == 1)
    // punctuation-only / empty text: no words → null score
    assert(out(3L).isNullAt(out(3L).fieldIndex("f")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("f")))
  }

  test("negativeSamples: exactly k draws per example, deterministic " +
    "across reruns, and frequencies track the unigram^0.75 masses") {
    import graft.text.Sampling
    // "hot" appears 64× per doc, "cold" once: mass ratio 64^0.75 ≈ 22.6
    val docs = (1L to 400L)
      .map(i => (i, (Seq.fill(64)("hot") :+ "cold").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Sampling.negativeSamples(docs, k = 5)
      .as[(Long, Int, String)].collect()
    assert(out.length == 400 * 5)
    assert(out.map(r => (r._1, r._2)).distinct.length == 2000) // 1 word/draw
    val hot = out.count(_._3 == "hot").toDouble
    val ratio = hot / (out.length - hot)
    // expected 64^0.75 ≈ 22.6; allow wide slack for 2000 draws
    assert(ratio > 10 && ratio < 50, s"ratio $ratio")
    // determinism: the same call yields the same rows
    val again = Sampling.negativeSamples(docs, k = 5)
      .as[(Long, Int, String)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
