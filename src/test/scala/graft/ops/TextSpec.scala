package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a b"),            // shorter than trigram
    (3L, "x y z"),          // exactly one trigram
    (4L, "the cat sat on the mat") // dup of 1
  ).toDF("doc_id", "text")

  test("shingles: exact trigram set, distinct") {
    val sh = docs.filter($"doc_id" === 1)
      .select(explode(Text.shingles($"text", 3)).as("s"))
      .as[String].collect().toSet
    assert(sh == Set("the cat sat", "cat sat on", "sat on the", "on the mat"))
  }

  test("shingles: doc shorter than n yields empty array, not a descending sequence") {
    val sh = docs.select(size(Text.shingles($"text", 3)).as("n")).as[Int].collect()
    assert(sh.toSeq == Seq(4, 0, 1, 4))
  }

  test("wordCount aggregates corpus-wide") {
    val wc = Text.wordCount(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("the") == 4)
    assert(wc("cat") == 2)
    assert(wc("x") == 1)
  }

  test("tokenStats counts tokens, chars, distinct tokens") {
    val row = Text.tokenStats(docs, "doc_id", "text")
      .filter($"doc_id" === 1).collect().head
    assert(row.getInt(1) == 6)  // n_tokens
    assert(row.getInt(2) == 22) // n_chars
    assert(row.getInt(3) == 5)  // unique ("the" twice)
  }

  test("bpeish tokens split letter/digit/punct runs, skip spaces") {
    import spark.implicits._
    val out = Seq("ab2 c!! de-7").toDF("text")
      .select(Text.bpeishTokens($"text")).as[Seq[String]].collect().head
    assert(out == Seq("ab", "2", "c", "!!", "de", "-", "7"))
  }

  test("qualityScore: diversity and stopword ratio") {
    val row = Text.qualityScore(docs, "doc_id", "text")
      .filter($"doc_id" === 1).collect().head
    assert(row.getDouble(1) == 0.8333)                        // lexical_diversity, rounded 4dp
    assert(math.abs(row.getDouble(3) - 2.0 / 6) < 1e-3)       // "the" x2 of 6
  }

  test("languageId picks argmax marker overlap") {
    val markers = Map(
      "en" -> Seq("the", "cat"),
      "xx" -> Seq("zzz")
    )
    val out = Text.languageId(docs, "doc_id", "text", markers)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
  }

  test("stratified hash sampling honors per-class fractions within tolerance") {
    // the registered c23_sample_stratified path (content-stable
    // md5-threshold per stratum, not seeded sampleBy — whose kept set is
    // a function of partition layout, the opposite of reproducible)
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = Map("en" -> 0.5, "es" -> 0.2)
    val sampled = graft.ops.Relational.stratifiedHashSample(docs, "lang", "doc_id", fracs)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet.subsetOf(Set("en", "es")), "unlisted classes must be excluded")
    val enFrac = sampled.getOrElse("en", 0L).toDouble / totals("en")
    assert(math.abs(enFrac - 0.5) < 0.15, s"en fraction $enFrac")
  }

  test("stratified hash sampling is content-stable: membership survives re-layout and growth") {
    // the property that justifies replacing sampleBy: the kept-id set is
    // a pure function of (id, stratum, frac) — identical after an
    // arbitrary repartition AND unchanged for old rows when new rows land
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
    val fracs = Map("en" -> 0.5, "es" -> 0.2)
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Relational.stratifiedHashSample(df, "lang", "doc_id", fracs)
        .select("doc_id").as[Long].collect().toSet
    val base = ids(docs)
    assert(ids(docs.repartition(7)) == base, "membership changed under re-layout")
    val shifted = docs.columns.map(c =>
      if (c == "doc_id") (col("doc_id") + 100000L).as("doc_id") else col(c))
    val grown = docs.unionAll(docs.select(shifted: _*))
    assert((ids(grown) & base) == base, "growth flipped existing members")
  }

  test("repetition signals: duplicate n-gram fractions match a hand count") {
    val rep = Seq(
      (1L, "go go go go go"),                 // bigrams: 4 total, 1 distinct
      (2L, "a b c d e"),                      // all distinct
      (3L, "x y x y x y"),                    // bigrams: 5 total, 2 distinct
      (4L, "one")                             // shorter than any n-gram
    ).toDF("doc_id", "text")
    val out = Text.repetitionSignals(rep, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == ((1.0 - 1.0 / 4).round4, (1.0 - 1.0 / 3).round4))
    assert(out(2L) == ((0.0, 0.0)))
    assert(out(3L) == ((1.0 - 2.0 / 5).round4, (1.0 - 2.0 / 4).round4))
    assert(out(4L) == ((0.0, 0.0)))
  }

  test("every text operator tolerates null and empty text without throwing") {
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "one real doc here"))
      .toDF("doc_id", "text")
    // projections: null in -> null out (or defined default), never a crash
    val proj = weird.select($"doc_id",
      Text.fingerprint($"text").as("fp"),
      Text.scrubPii($"text").as("scrub"),
      size(Text.shingles($"text", 3)).as("n_sh"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(proj(1L).isNullAt(1) && proj(1L).isNullAt(2))
    assert(!proj(3L).isNullAt(1))
    // aggregating ops: null/empty docs drop or default, real docs survive
    assert(Text.compressionRatios(weird, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap.apply(2L) == 1.0)
    val bn = Text.bigramNll(weird, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(bn == Set(3L)) // only the doc with >= 2 tokens has bigrams
    val ld = graft.ops.Dedup.lineDedup(weird.filter($"text".isNotNull), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(ld == Set(2L, 3L)) // empty string is a legal (dedupable) line
  }

  private implicit class R4(d: Double) {
    def round4: Double = math.rint(d * 1e4) / 1e4
  }

  test("fingerprint is order-sensitive and equal for identical docs") {
    val fps = docs.select($"doc_id", Text.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(4L))
    val rev = Seq((9L, "mat the on sat cat the")).toDF("doc_id", "text")
      .select(Text.fingerprint($"text")).as[Long].collect().head
    assert(rev != fps(1L))
  }

  test("bigramNll matches a hand-computed conditional MLE") {
    // corpus bigrams: "a b" x2 (docs 1, 2), "b a" x1, "a c" x1
    // c(a·)=3, c(b·)=1; P(b|a)=2/3, P(a|b)=1, P(c|a)=1/3
    val corpus = Seq(
      (1L, "a b a c"), // bigrams: (a,b), (b,a), (a,c)
      (2L, "a b"),     // bigrams: (a,b)
      (3L, "solo")     // no bigram -> absent from output
    ).toDF("doc_id", "text")
    val out = Text.bigramNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r4(d: Double) = math.rint(d * 1e4) / 1e4
    assert(out(1L)._1 == 3)
    assert(out(1L)._2 == r4(-math.log(2.0 / 3) - math.log(1.0) - math.log(1.0 / 3)))
    assert(out(2L) == ((1L, r4(-math.log(2.0 / 3)))))
    assert(!out.contains(3L))
  }

  test("compression ratio separates degenerate from diverse text") {
    val rnd = new scala.util.Random(11)
    val looping = (1L, Seq.fill(200)("buy now click here").mkString(" "))
    val diverse = (2L, Seq.fill(200)(rnd.alphanumeric.take(8).mkString).mkString(" "))
    val empty = (3L, "")
    val out = Text.compressionRatios(
        Seq(looping, diverse, empty).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < 0.1, s"looping text should crush: ${out(1L)}")
    assert(out(2L) > 0.5, s"high-entropy text should not: ${out(2L)}")
    assert(out(1L) < out(2L))
    assert(out(3L) == 1.0)
  }

  test("scrubPii redacts emails, IPs, and phone runs — and only those") {
    val cases = Seq(
      ("mail me at jo.na+x@sub.example.org thanks", "mail me at [EMAIL] thanks"),
      ("server 192.168.001.200 is up", "server [IP] is up"),
      ("call +1 (555) 010-4321 now", "call [PHONE] now"),
      // email first: its digits must not be half-eaten by the phone rule
      ("a1234567890@nums.example.com", "[EMAIL]"),
      // ip before phone: octets must not become [PHONE]
      ("10.0.0.1 then 555 010 99887", "[IP] then [PHONE]"),
      ("no pii here, just words and the year 2024", "no pii here, just words and the year 2024")
    )
    val out = cases.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", Text.scrubPii($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(out(i.toLong) == want, s"input <$in>: got <${out(i.toLong)}>")
    }
  }

  test("scrubPii is idempotent (replacement tokens never re-match)") {
    val rnd = new scala.util.Random(17)
    val texts = (1L to 30L).map { i =>
      val junk = Seq.fill(8)(rnd.alphanumeric.take(6).mkString).mkString(" ")
      (i, s"$junk user$i@ex${i}.com +1 555 010 99$i at 10.$i.0.1 end")
    }
    val out = texts.toDF("id", "text")
      .select($"id", Text.scrubPii($"text").as("s1"))
      .select($"id", $"s1", Text.scrubPii($"s1").as("s2"))
      .collect()
    out.foreach(r => assert(r.getString(1) == r.getString(2),
      s"not a fixed point: <${r.getString(1)}> -> <${r.getString(2)}>"))
  }

  test("rolling hash matches the HOF xxhash64 chain bit-for-bit") {
    // the codegen RollingTokenHash must reproduce Spark's own
    // aggregate(tokens, 0L, (acc, w) => xxhash64(acc, w)) exactly, so a
    // Spark upgrade that changes xxhash64 folding surfaces here
    val df = (docs union Seq((5L, ""), (6L, "solo"), (7L, "a a a a a a a a"))
      .toDF("doc_id", "text"))
    val both = df.select(
      Text.fingerprint($"text").as("fused"),
      aggregate(Text.tokens($"text"), lit(0L), (acc, w) => xxhash64(acc, w)).as("hof"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("chunkDocs matches brute-force windows; every token covered exactly") {
    val rnd = new scala.util.Random(23)
    val window = 7; val overlap = 3; val stride = window - overlap
    // lengths straddling the boundary cases: < window, == window, == window+1,
    // exact multiple of stride, and a long tail
    val corpus = (1L to 40L).map { i =>
      val n = Seq(1, 3, 6, 7, 8, 11, 12, 13, 25, 60)(rnd.nextInt(10))
      (i, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    val got = Text.chunkDocs(corpus.toDF("doc_id", "text"), "doc_id", "text",
        window, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val want = corpus.flatMap { case (id, text) =>
      val ws = text.split(" ")
      val nc = if (ws.length <= window) 1
               else (ws.length - window + stride - 1) / stride + 1
      (0 until nc).map(i =>
        (id, i) -> ws.slice(i * stride, i * stride + window).mkString(" "))
    }.toMap
    assert(got == want)
    // coverage: reassembling chunk heads (first `stride` tokens of each chunk
    // plus the tail of the last) gives back the document
    corpus.foreach { case (id, text) =>
      val ws = text.split(" ")
      val chunks = want.collect { case ((d, i), c) if d == id => (i, c) }
        .toSeq.sortBy(_._1).map(_._2.split(" ").toSeq)
      val rebuilt = chunks.init.map(_.take(stride)).flatten ++ chunks.last
      assert(rebuilt == ws.toSeq, s"doc $id not covered")
    }
  }

  test("tfidf broadcast and shuffled-hash vocab paths agree") {
    // round-5 verdict weak #2: "vocabulary ≪ corpus" fails at 100 TB, so
    // the df-table join back is now count-gated. vocabBroadcastLimit = 0
    // forces the SHUFFLE_HASH probe; results must be identical.
    def run(limit: Long) =
      Text.tfidf(docs, "doc_id", "text", vocabBroadcastLimit = limit)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val viaBroadcast = run(Dedup.HotShingleBroadcastLimit)
    val viaShuffle = run(0L)
    assert(viaBroadcast == viaShuffle, s"$viaBroadcast vs $viaShuffle")
    assert(viaBroadcast.nonEmpty)
    // and the forced scale path really does plan a shuffled-hash probe
    val plan = Text.tfidf(docs, "doc_id", "text", vocabBroadcastLimit = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"forced scale path still broadcasts the vocab:\n$plan")
  }

  test("unigramNll broadcast and shuffled-hash vocab paths agree") {
    def run(limit: Long) =
      Text.unigramNll(docs, "doc_id", "text", vocabBroadcastLimit = limit)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val viaBroadcast = run(Dedup.HotShingleBroadcastLimit)
    val viaShuffle = run(0L)
    assert(viaBroadcast == viaShuffle, s"$viaBroadcast vs $viaShuffle")
    assert(viaBroadcast.nonEmpty)
    val plan = Text.unigramNll(docs, "doc_id", "text", vocabBroadcastLimit = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"forced scale path still broadcasts the vocab:\n$plan")
  }

  test("perplexityBuckets: exact tercile sizes, predictable text lands in head") {
    // 9 docs: three highly templated (every token from one repeated word —
    // maximal corpus probability, lowest NLL), three mixed, three of
    // unique rare tokens (each token count 1 — highest NLL)
    val low = (1L to 3L).map(i => (i, Seq.fill(8)("the").mkString(" ")))
    val mid = (4L to 6L).map(i => (i, s"the of doc$i word$i the of common$i x$i"))
    val high = (7L to 9L).map(i =>
      (i, (1 to 8).map(j => s"rare${i}_$j").mkString(" ")))
    val corpus = (low ++ mid ++ high).toDF("doc_id", "text")
    val out = Text.perplexityBuckets(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"tercile sizes: $out")
    assert((1L to 3L).forall(out(_) == "head"), s"templated docs not head: $out")
    assert((7L to 9L).forall(out(_) == "tail"), s"rare-token docs not tail: $out")
  }

  test("perplexityBucketsByLang: per-language terciles from language-local models") {
    // lang a: 6 docs (terciles 2/2/2), lang b: 3 docs (1/1/1) — a global
    // split would give 3/3/3 over the 9 docs, so exact per-lang sizes
    // prove the rank is within-language
    val docs = (
      (1L to 6L).map(i => (i, "a",
        s"common tokens shared across and rare$i unique$i extra$i")) ++
      (7L to 9L).map(i => (i, "b", s"other tongue words rare$i unique$i"))
    ).toDF("doc_id", "lang", "text")
    val byLang = Text.perplexityBucketsByLang(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    val sizes = byLang.map(r => (r._1, r._3)).groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(
      ("a", "head") -> 2, ("a", "middle") -> 2, ("a", "tail") -> 2,
      ("b", "head") -> 1, ("b", "middle") -> 1, ("b", "tail") -> 1),
      s"per-lang tercile sizes: $sizes")
    // bucket order tracks ppl within each language
    for (lang <- Seq("a", "b")) {
      val ps = byLang.filter(_._1 == lang).sortBy(_._2)
      val order = ps.map(_._3).distinct.toSeq
      assert(order == Seq("head", "middle", "tail").take(order.length),
        s"$lang bucket order: ${ps.toSeq}")
    }
    // vocab gate paths agree (broadcast vs SHUFFLE_HASH (lang, token) probe)
    def gated(limit: Long) =
      Text.perplexityBucketsByLang(docs, "doc_id", "text", "lang",
          vocabBroadcastLimit = limit)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(gated(0L) == gated(Long.MaxValue), "vocab gate paths diverge")
  }

  test("lineRules: one planted violation per rule, clean doc passes all") {
    val good = "A first proper sentence sits here.\nAnother full sentence follows it.\n" +
      "And one more line closes the page."
    val docs = Seq(
      (1L, good),                                                    // passes all 6
      (2L, "no punctuation here at all\nnor on this line either\nnor here"), // term punct 0
      (3L, "- item alpha beta\n- item gamma delta\nOne real sentence."),     // bullets 2/3
      (4L, "ok\nhm\nA single proper sentence line survives here."),          // short 2/3
      (5L, good + "\nLorem Ipsum dolor sit amet sentence."),                 // lorem flag
      (6L, good + "\nPlease enable JavaScript to continue reading."),        // js flag
      (7L, good + "\nfunction f() { return 1; }")                            // curly flag
    ).toDF("doc_id", "text")
    val out = Text.lineRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
          r.getInt(7), r.getBoolean(8)))).toMap
    assert(out(1L)._8, s"clean doc failed: ${out(1L)}")
    assert(out(1L)._7 == 0)
    // each planted doc fails EXACTLY its one rule
    assert(out(2L)._1 == 0.0 && out(2L)._7 == 1 && !out(2L)._8, s"${out(2L)}")
    assert(out(3L)._2 > 0.5 && out(3L)._7 == 1, s"${out(3L)}")
    assert(out(4L)._3 > 0.5 && out(4L)._7 == 1, s"${out(4L)}")
    assert(out(5L)._4 && out(5L)._7 == 1, s"${out(5L)}")
    assert(out(6L)._5 && out(6L)._7 == 1, s"${out(6L)}")
    assert(out(7L)._6 && out(7L)._7 == 1, s"${out(7L)}")
    // the one-column verdict agrees with the table row-for-row
    val viaKept = docs.select($"doc_id", Text.lineRulesKept($"text").as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaKept == out.map { case (k, v) => k -> v._8 })
  }

  test("bigramInterpNll matches a hand-computed interpolated mixture, gate paths agree") {
    // corpus bigrams: (a,b)x2, (b,a)x1, (a,c)x1; unigram counts over ALL
    // tokens: a=3, b=2, c=1, solo=1, N=7.
    // P(b|a) = 0.7*2/3 + 0.3*2/7, P(a|b) = 0.7*1 + 0.3*3/7,
    // P(c|a) = 0.7*1/3 + 0.3*1/7 (λ arithmetic in IEEE double: 1.0-0.7)
    val corpus = Seq(
      (1L, "a b a c"),
      (2L, "a b"),
      (3L, "solo") // no bigram -> absent from output
    ).toDF("doc_id", "text")
    val out = Text.bigramInterpNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(d: Double) = math.rint(d * 1e4) / 1e4
    val lam = 0.7
    val om = 1.0 - lam
    def p(c12: Double, c1: Double, cu: Double) = lam * c12 / c1 + om * cu / 7.0
    assert(out(1L)._1 == 3)
    assert(out(1L)._2 == r4(-math.log(p(2, 3, 2)) - math.log(p(1, 1, 3)) - math.log(p(1, 3, 1))))
    assert(out(2L) == ((1L, r4(-math.log(p(2, 3, 2))))))
    assert(!out.contains(3L))
    // smoothing pulls sparse bigrams toward the unigram floor: every
    // interpolated P < MLE P when MLE = 1, so NLL(interp) > NLL(mle) there
    val mle = Text.bigramNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L)._2 > mle(1L))
    // unigram-vocab gate: broadcast and shuffled-hash probes agree
    def gated(limit: Long) =
      Text.bigramInterpNll(corpus, "doc_id", "text", vocabBroadcastLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(gated(0L) == gated(Long.MaxValue), "unigram gate paths diverge")
  }

  test("bigramKnNll matches the hand-computed Kneser-Ney mixture, gate paths agree") {
    // corpus bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> 3 distinct TYPES;
    // c1: a.=3, b.=1; N1+(a.)=2, N1+(b.)=1; N1+(.b)=1, N1+(.a)=1, N1+(.c)=1
    val corpus = Seq(
      (1L, "a b a c"),
      (2L, "a b"),
      (3L, "solo") // no bigram -> absent from output
    ).toDF("doc_id", "text")
    val out = Text.bigramKnNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(d: Double) = math.rint(d * 1e4) / 1e4
    val d = 0.75
    // the operator's left-associative evaluation order, replayed exactly
    def p(c12: Double, c1: Double, n1f: Double, n1b: Double) =
      math.max(c12 - d, 0.0) / c1 + d * n1f / c1 * (n1b / 3.0)
    assert(out(1L)._1 == 3)
    assert(out(1L)._2 == r4(-math.log(p(2, 3, 2, 1)) - math.log(p(1, 1, 1, 1))
      - math.log(p(1, 3, 2, 1))))
    assert(out(2L) == ((1L, r4(-math.log(p(2, 3, 2, 1))))))
    assert(!out.contains(3L))
    // continuation-vocab gate: broadcast and shuffled-hash probes agree
    def gated(limit: Long) =
      Text.bigramKnNll(corpus, "doc_id", "text", vocabBroadcastLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(gated(0L) == gated(Long.MaxValue), "continuation gate paths diverge")
  }

  test("per-language JM LM on a single-language corpus equals the global LM") {
    // perplexityBucketsByLang(lmOrder=2) and bigramInterpNll now share
    // interpNllCore; a one-language corpus makes them the same model, so
    // the per-doc scores must agree EXACTLY (and the keyed pipeline
    // cannot drift from the global one)
    val corpus = Seq(
      (1L, "en", "a b a c a b"),
      (2L, "en", "a b x y"),
      (3L, "en", "c a b a")
    ).toDF("doc_id", "lang", "text")
    val global = Text.bigramInterpNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val perLang = Text.perplexityBucketsByLang(corpus, "doc_id", "text", "lang",
        lmOrder = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(global.keySet == perLang.keySet)
    global.foreach { case (doc, (nBig, sumNll)) =>
      val expectedPpl = math.rint(sumNll / nBig * 1e6) / 1e6
      assert(perLang(doc) == expectedPpl,
        s"doc $doc: per-lang ${perLang(doc)} vs global-derived $expectedPpl")
    }
  }

  test("KN backs off to continuation diversity where JM backs off to frequency") {
    // hub follows 3 DISTINCT contexts; spoke is MORE frequent (4 vs 3
    // occurrences) but context-locked (2 distinct predecessors). The
    // probe bigrams (a1,hub) and (b1,spoke) share c12=1, c1=1, N1+(w1.)=1,
    // so only the backoff term separates them: KN (continuation) must
    // score the hub doc better, JM (frequency) the spoke doc.
    val corpus = Seq(
      (1L, "a1 hub"), (2L, "a2 hub"), (3L, "a3 hub"),
      (4L, "b1 spoke"), (5L, "s spoke s spoke s spoke")
    ).toDF("doc_id", "text")
    val kn = Text.bigramKnNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val jm = Text.bigramInterpNll(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kn(1L) < kn(4L), s"KN must prefer the diverse-context word: $kn")
    assert(jm(4L) < jm(1L), s"JM must prefer the frequent word: $jm")
  }

  test("lmOrder=2 buckets: terciles over the bigram score, short docs drop") {
    // Under a CONDITIONAL bigram LM the ranking differs from unigram:
    // a chain of corpus-unique words is maximally predictable
    // (c(w1·)=1 ⇒ P_MLE(w2|w1)=1, NLL ≈ −ln(0.7·1 + ε)) — so the
    // "rare" docs land in HEAD; "the the…" repeats score well but share
    // c(the·) with the mixed docs' (the, of) bigrams (MLE 21/27), and
    // the mixed docs' one-off continuations of common words (P(of|the)
    // small) push them to TAIL.
    val low = (1L to 3L).map(i => (i, Seq.fill(8)("the").mkString(" ")))
    val mid = (4L to 6L).map(i => (i, s"the of doc$i word$i the of common$i x$i"))
    val high = (7L to 9L).map(i =>
      (i, (1 to 8).map(j => s"rare${i}_$j").mkString(" ")))
    val short = Seq((10L, "solo")) // no bigram -> excluded from the split
    val corpus = (low ++ mid ++ high ++ short).toDF("doc_id", "text")
    val out = Text.perplexityBuckets(corpus, "doc_id", "text", lmOrder = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!out.contains(10L), "bigram-less doc must drop from the order-2 split")
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"tercile sizes: $out")
    assert((7L to 9L).forall(out(_) == "head"), s"unique-chain docs not head: $out")
    assert((1L to 3L).forall(out(_) == "middle"), s"templated docs not middle: $out")
    assert((4L to 6L).forall(out(_) == "tail"), s"mixed docs not tail: $out")
  }

  test("bpeTrain learns the classic merge sequence with deterministic tie-breaks") {
    // Sennrich et al. 2016's worked example, word counts via repetition:
    // low×5, lower×2, newest×6, widest×3. Hand-computed merge table:
    // (e,s)=9, (es,t)=9, (est,</w>)=9 — three ties at 9, broken
    // lexicographically on (left, right) — then (l,o)=7, (lo,w)=7.
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = Text.bpeTrain(docs, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)), s"merge table: $got")
  }

  test("bpeTrain: overlapping runs merge left-to-right; exhaustion stops early") {
    // aaaa + (a,a) must yield [aa, aa] (two pairs), not three overlapping
    // ones — so the learned count for (a,a) is 3 per word occurrence
    // (4 chars → 3 adjacencies) and after one merge the pair (aa,aa)
    // exists once per word
    val docs = Seq(Seq.fill(4)("aaaa").mkString(" ")).toDF("text")
    val got = Text.bpeTrain(docs, "text", numMerges = 50)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    // merge 1: (a,a)=3 adjacencies × 4 words = 12 → [aa,aa,</w>]
    // merge 2: tie at 4 between (aa,aa) and (aa,</w>) — '<' sorts below
    //          'a', so (aa,</w>) wins → [aa, aa</w>]
    // merge 3: (aa, aa</w>)=4 → [aaaa</w>], no pairs left → loop stops
    assert(got == Seq(
      ("a", "a", 12L),
      ("aa", "</w>", 4L),
      ("aa", "aa</w>", 4L)), s"merge table: $got")
  }

  test("bpeTrain gate paths agree: driver-local incremental == distributed iterative") {
    // a real corpus slice (not the worked examples): tie-breaks, stale
    // heap entries, and the greedy fold all get exercised, and the
    // distributed path is forced via vocabBroadcastLimit = 0
    val docs = graft.engine.Tables.read(spark, sf0001, "documents")
      .filter($"doc_id" < 60)
    def table(limit: Long) =
      Text.bpeTrain(docs, "text", numMerges = 12, vocabBroadcastLimit = limit)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val local = table(Long.MaxValue)
    val dist = table(0L)
    assert(local == dist, s"gate paths diverge:\nlocal $local\ndist  $dist")
    assert(local.map(_._1) == (1 to 12), s"ranks not 1..12: $local")
    // merging can only shrink pair counts, so the argmax sequence is
    // non-increasing — a cheap invariant over the incremental recounts
    val cnts = local.map(_._5)
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"pair counts increased across merges: $cnts")
  }

  test("bpeTrain symbols are code points: supplementary chars stay whole on all paths") {
    // a per-Char split would shear U+1F600 into two lone surrogates and
    // shift every pair count; code-point splitting keeps it one symbol
    // on the local path, the distributed path, AND matches DuckDB's
    // string_split(w, '') for the oracle
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq(Seq.fill(3)(emoji + "ab").mkString(" ")).toDF("text")
    def table(vocabLimit: Long, charLimit: Long) =
      Text.bpeTrain(docs, "text", numMerges = 3,
        vocabBroadcastLimit = vocabLimit, localCharBudget = charLimit)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val local = table(Long.MaxValue, Long.MaxValue)
    // code-point tie-break: 'a' < 'b' < U+1F600, so (a,b) merges first
    assert(local == Seq(
      (1, "a", "b", "ab", 3L),
      (2, "ab", "</w>", "ab</w>", 3L),
      (3, emoji, "ab</w>", emoji + "ab</w>", 3L)), s"table $local")
    assert(table(0L, Long.MaxValue) == local, "row gate path diverges")
    assert(table(Long.MaxValue, 0L) == local, "char-budget gate path diverges")
  }

  test("bpeTrainBytes: UTF-8 byte symbols via bytes-to-unicode; gate paths agree; ASCII == char-level") {
    // café's é is two UTF-8 bytes (0xC3 0xA9 → 'Ã' '©' under the GPT-2
    // table) — byte-level splits it where char-level keeps one symbol
    assert(Text.byteMapString("café") == "cafÃ©")
    // non-printable bytes map into U+0100.. in byte order: NUL (the
    // first) lands on U+0100, space (0x20, the 33rd) on U+0120 -- the
    // GPT-2 '\u0120' every byte-level vocab is full of
    assert(Text.byteMapString("\u0000") == "\u0100")
    assert(Text.byteMapString(" ") == "\u0120")
    val docs = Seq(Seq.fill(3)("café").mkString(" ")).toDF("text")
    def table(vocabLimit: Long) =
      Text.bpeTrainBytes(docs, "text", numMerges = 3,
        vocabBroadcastLimit = vocabLimit)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    // hand-derived: [c a f Ã © </w>]×3 — (a,f) wins rank 1 on the l
    // tie-break, then (af,Ã), then (afÃ,©)
    val local = table(Long.MaxValue)
    assert(local == Seq(
      (1, "a", "f", "af", 3L),
      (2, "af", "Ã", "afÃ", 3L),
      (3, "afÃ", "©", "afÃ©", 3L)), s"table $local")
    assert(table(0L) == local, "iterative in-plan byte mapping diverges")
    // printable-ASCII corpus: every byte maps to itself, so the
    // byte-level table equals the char-level one on both paths
    val ascii = Seq((Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).mkString(" ")).toDF("text")
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(tuples(Text.bpeTrainBytes(ascii, "text", numMerges = 6)) ==
      tuples(Text.bpeTrain(ascii, "text", numMerges = 6)),
      "byte-level diverged from char-level on printable ASCII")
  }

  test("byte-level BPE equals char-level on random printable-ASCII corpora (property)") {
    // the identity the GPT-2 table guarantees (printable bytes map to
    // themselves) must hold for ANY ascii corpus, not just the fixed
    // case — and a divergence would localize a bug in the byte mapping
    // or the in-plan byteMapColumn arithmetic
    val rnd = new scala.util.Random(271)
    for (trial <- 1 to 3) {
      val words = Seq.fill(8)(Seq.fill(1 + rnd.nextInt(5))(
        (33 + rnd.nextInt(94)).toChar).mkString)
      val corpus = Seq.fill(20)(words(rnd.nextInt(words.length))).mkString(" ")
      val docs = Seq(corpus).toDF("text")
      def tuples(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(tuples(Text.bpeTrainBytes(docs, "text", numMerges = 8)) ==
        tuples(Text.bpeTrain(docs, "text", numMerges = 8)),
        s"trial $trial: byte-level diverged on ascii corpus $corpus")
    }
  }

  test("bpeEncode: learned merges compress token counts; hand-checked encodes") {
    // train on the classic corpus, encode new text with the table
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val trainDocs = Seq(words.mkString(" ")).toDF("text")
    val table = Text.bpeTrain(trainDocs, "text", numMerges = 5)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // hand-applied merges (es, est, est</w>, lo, low):
    //   "low"    → l o w </w>    → [low, </w>]        = 2
    //   "lowest" → l o w e s t </w> → [low, est</w>]  = 2
    //   "newest" → n e w e s t </w> → [n, e, w, est</w>] = 4
    val docs = Seq((1L, "low lowest newest"), (2L, "low low"))
      .toDF("doc_id", "text")
    val got = Text.bpeEncode(docs, "doc_id", "text", table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 8L, 2L -> 4L), s"token counts: $got")
    // gate paths agree (broadcast vs SHUFFLE_HASH word-length join)
    val shuffled = Text.bpeEncode(docs, "doc_id", "text", table,
        vocabBroadcastLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled == got, "vocab gate paths diverge")
    // an empty merge table degrades to chars+marker counting
    val raw = Text.bpeEncode(docs, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw(2L) == 8L, s"no-merge encode: $raw") // 2×(3 chars + </w>)
    assert(raw(1L) > got(1L), "merges did not compress the token count")
  }

  test("gopherFilter: each rule fires on its planted violation, clean text passes") {
    val cleanBody = ("the quick brown fox jumps over the lazy dog and then " +
      "walks to the nearby market in search of fresh bread with calm " +
      "purpose while the morning sun rises over quiet rooftops again")
    val docs = Seq(
      (1L, cleanBody),                                   // passes everything
      (2L, "too short to keep"),                         // fails token count
      (3L, cleanBody.split(" ").map(w => w.take(1)).mkString(" ") +
        " " + Seq.fill(28)("a b").mkString(" ")),        // fails mean word length (short tokens)
      (4L, Seq.fill(35)("reunion sans mots anglais frequents corpus").mkString(" ")
        .split(" ").take(35).mkString(" ")),             // fails stopword minimum
      (5L, (1 to 35).map(i => s"$i${i * 7}").mkString(" ")), // fails alpha ratio (digits)
      (6L, Seq.fill(20)("spam loop").mkString(" "))      // fails dup-bigram (and stopwords)
    ).toDF("doc_id", "text")
    val out = Text.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((0, true)), s"clean doc flagged: ${out(1L)}")
    (2L to 6L).foreach { id =>
      assert(out(id)._1 >= 1 && !out(id)._2, s"planted violation $id passed: $out")
    }
  }

  test("dsirScores ranks target-like docs above off-target docs") {
    // two disjoint vocabularies: 'sci' (the target style) and 'web' junk
    val sci = "quantum electron proton neutron boson lepton quark photon"
    val web = "click here buy now free offer deal win prize cash"
    val target = (1L to 5L).map(id => (id, sci)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, sci),                                             // pure target-like
      (11L, s"$sci $web"),                                    // mixed
      (12L, web),                                             // pure off-target
      (13L, "singleton")                                      // <2 tokens: drops
    ).toDF("doc_id", "text")
    val scores = Text.dsirScores(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(scores.keySet == Set(10L, 11L, 12L), s"got ${scores.keySet}")
    assert(scores(10L) > scores(11L) && scores(11L) > scores(12L),
      s"ordering broken: $scores")
    // target-like text scores positive (more likely under target than
    // raw), pure junk negative
    assert(scores(10L) > 0 && scores(12L) < 0, s"signs broken: $scores")
  }

  test("dsirScores weights by occurrence count: repeated text amplifies the evidence") {
    // score = Σ n_b·w_b, so repeating a doc's text grows |score| with the
    // gram count (on a corpus this small add-1 smoothing over 256 buckets
    // dominates the ratios and every weight is negative — the sign is
    // irrelevant to the count-weighting property pinned here)
    val target = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val s = Text.dsirScores(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(s(11L).abs > s(10L).abs, s"repetition did not amplify: $s")
    // and the amplification is count-proportional-ish: 7 bigrams vs 3,
    // sharing the same buckets except the junction gram
    assert(s(11L).abs > s(10L).abs * 2, s"got $s")
  }

  test("vocab broadcast gate counts BYTES, not rows: a fat-string table under the row limit still flips (finding 37)") {
    // the x100 curation bug in miniature: few rows, huge payload —
    // 3 rows x ~32MB strings estimate to ~96MB materialized, past the
    // 64MB bound, while the row count sails under any row limit
    val fat = Seq.tabulate(3)(i => (i.toString * (32 << 20), 1L))
      .toDF("token", "c")
    assert(!Text.broadcastableVocab(fat, Seq("token"), rowLimit = 1000L),
      "a 96MB 3-row vocab must not broadcast")
    // and a small table under both bounds still does
    val thin = Seq(("a", 1L), ("b", 2L)).toDF("token", "c")
    assert(Text.broadcastableVocab(thin, Seq("token"), rowLimit = 1000L))
    // the row limit stays a hard knob for specs forcing the shuffle path
    assert(!Text.broadcastableVocab(thin, Seq("token"), rowLimit = 0L))
    // estimate arithmetic: rows*64 overhead + string payload
    val (n, bytes) = Text.tableBroadcastEstimate(thin, Seq("token"))
    assert(n == 2 && bytes == 2 * 64L + 2, s"estimate wrong: ($n, $bytes)")
  }

  test("checkpointTokens materializes under the text-bytes bound and stays lazy past it (finding 37)") {
    val small = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val frame = small.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    def isCheckpointed(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(isCheckpointed(Text.checkpointTokens(small, "text", frame)),
      "a tiny corpus's token frame must checkpoint (the reuse win)")
    // a corpus past the bound returns the SAME lazy frame untouched —
    // fake the size by shrinking the bound? the bound is a val, so
    // instead feed a docs frame whose text column is wide enough: one
    // doc of 65MB crosses the 64MB bound without materializing anything
    val big = Seq((1L, "x" * (65 << 20))).toDF("doc_id", "text")
    val lazyFrame = big.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val out = Text.checkpointTokens(big, "text", lazyFrame)
    assert(out eq lazyFrame, "past the bound the frame must come back untouched")
  }
}
