package graft

import scala.jdk.CollectionConverters._

import graft.llm.{Dedup, Multimodal, Similarity, TextOps}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private lazy val docs = Tables.load(spark, sf001, "documents").cache()
  private lazy val embs = Tables.load(spark, sf001, "embeddings").cache()

  test("minhash LSH finds every strong near-dup pair (recall vs brute force)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 8, 2, 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact) // near-dups here are j≈0.99 ⇒ recall 1; no false pos after verify
  }

  test("simhash catches near-identical docs with low hamming distance") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall $recall of ${exact.size} pairs")
  }

  test("leakage-safe split: no near-dup pair straddles a split boundary") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
    assert(pairs.count() > 0)
    val split = graft.llm.Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), seed = 7L)
    // THE invariant: both ends of every near-dup pair share a split —
    // per-doc hashing provably violates this for some pair at these sizes
    val sa = split.select(col("doc_id").as("id_a"), col("split").as("_sa"))
    val sb = split.select(col("doc_id").as("id_b"), col("split").as("_sb"))
    val straddling = pairs.join(sa, "id_a").join(sb, "id_b")
      .filter(col("_sa") =!= col("_sb")).count()
    assert(straddling === 0L, s"$straddling near-dup pairs cross splits")
    // counter-proof that the guard is load-bearing: the naive per-doc
    // split DOES cross at least one near-dup pair on this corpus
    val naive = graft.llm.Sampling.assignSplit(docs, "doc_id",
      Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), seed = 7L)
    val na = naive.select(col("doc_id").as("id_a"), col("split").as("_sa"))
    val nb = naive.select(col("doc_id").as("id_b"), col("split").as("_sb"))
    val naiveStraddling = pairs.join(na, "id_a").join(nb, "id_b")
      .filter(col("_sa") =!= col("_sb")).count()
    assert(naiveStraddling > 0L,
      "corpus has no cross-split near-dup pairs under the naive split — " +
        "the invariant would be vacuous; grow the pair set")
    // fractions still roughly honored (component-level hashing)
    val n = docs.count().toDouble
    val trainFrac = split.filter(col("split") === "train").count() / n
    assert(trainFrac > 0.8 && trainFrac < 0.98, s"train fraction $trainFrac")
    // overlap report consistency: total cross+within pair counts == pairs
    val overlap = Dedup.crossGroupOverlap(docs, "doc_id", "source", pairs)
    assert(overlap.agg(sum("pair_count")).head().getLong(0) === pairs.count())
  }

  test("duplicatedTextFraction catches offset-shifted duplication passage removal misses") {
    import spark.implicits._
    // B embeds A's full text OFFSET by 7 fresh tokens: fixed-window
    // passage chunks never align, so dropRepeatedPassages sees no repeat —
    // overlapping n-grams catch it at any alignment
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = ((101 to 107).map(i => s"u$i") ++ (1 to 40).map(i => s"w$i")).mkString(" ")
    val c = (201 to 240).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fr = TextOps.duplicatedTextFraction(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(3)))).toMap
    assert(fr(1L)._2 === 1.0, fr.toString) // every A 3-gram occurs in B
    assert(fr(2L)._2 > 0.8, fr.toString)   // B is mostly A
    assert(fr(3L)._2 === 0.0, fr.toString) // unrelated doc untouched
    // counter-proof the overlap matters: the fixed-window passage op sees
    // NO repeated chunk at this offset (documents pass through unedited)
    val kept = TextOps.dropRepeatedPassages(df, "doc_id", "text", windowTokens = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(kept === Map(1L -> a, 2L -> b, 3L -> c),
      "passage removal unexpectedly caught the shifted duplicate")
  }

  test("normalizeUnicode: NFC/NFKC semantics, codegen, and the dedup-leak case") {
    import spark.implicits._
    // escape sequences, NOT literals: source round trips must never
    // silently normalize the fixtures
    val composed = "caf\u00e9 menu"
    val decomposed = "cafe\u0301 menu"
    val ligature = "\ufb01ne print \u00b2"
    val df = Seq((1L, composed), (2L, decomposed), (3L, ligature), (4L, "plain"))
      .toDF("doc_id", "text")
    // janino errors surface instead of silent interpreted fallback
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = df.select(col("doc_id"),
          TextOps.normalizeUnicode(col("text")).as("nfc"),
          TextOps.normalizeUnicode(col("text"), "NFKC").as("nfkc"))
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
      // NFC: both spellings converge on the composed form
      assert(out(1L)._1 === composed)
      assert(out(2L)._1 === composed)
      // NFKC additionally folds compatibility forms
      assert(out(3L)._2 === "fine print 2")
      assert(out(3L)._1 === ligature)            // NFC leaves ligatures alone
      assert(out(4L)._1 === "plain")
      // nulls pass through
      val n = Seq((1L, null: String)).toDF("doc_id", "text")
        .select(TextOps.normalizeUnicode(col("text"))).head
      assert(n.isNullAt(0))
      // the MOTIVATING case: byte-different spellings of the same text leak
      // past exact dedup unnormalized, and collapse once normalized
      val corpus = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
      val rawDedup = Dedup.exactDedup(corpus, "doc_id", col("text"))
      assert(rawDedup.count() === 2, "expected the unnormalized leak")
      val normDedup = Dedup.exactDedup(
        corpus.select(col("doc_id"),
          TextOps.normalizeUnicode(col("text")).as("text")), "doc_id", col("text"))
      assert(normDedup.count() === 1, "normalization failed to collapse the pair")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
    // invalid form refuses at construction
    intercept[IllegalArgumentException](
      TextOps.normalizeUnicode(col("text"), "NFX"))
  }

  test("removeDuplicatedSpans edits the shared span out at any alignment") {
    import spark.implicits._
    // same offset-shift corpus as the fraction test: B embeds A's full
    // text offset by 7 fresh tokens — the whole shared span must be CUT
    // from both docs, B's 7 fresh prefix tokens and all of C survive
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val bPrefix = (101 to 107).map(i => s"u$i").mkString(" ")
    val b = bPrefix + " " + a
    val c = (201 to 240).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = TextOps.removeDuplicatedSpans(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((40L, 40L, "")), out.toString)         // A wholly duplicated
    assert(out(2L) === ((47L, 40L, bPrefix)), out.toString)    // only the fresh prefix survives
    assert(out(3L) === ((40L, 0L, c)), out.toString)           // unrelated doc untouched
    // adjacent duplicated n-grams merged into ONE maximal span: no
    // partial-window stragglers — removed counts are exactly the shared
    // span length, already asserted above. Sub-n-token docs pass through.
    val tiny = Seq((1L, "Only Two"), (2L, "only two")).toDF("doc_id", "text")
    val tout = TextOps.removeDuplicatedSpans(tiny, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(tout === Map(1L -> "only two", 2L -> "only two"))
    // within-doc-only repetition is NOT cross-document duplication: a doc
    // repeating its own phrase stays intact under minDocs = 2
    val solo = Seq((1L, "x y z q x y z"), (2L, "p q r")).toDF("doc_id", "text")
    val sout = TextOps.removeDuplicatedSpans(solo, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(sout === Map(1L -> 0L, 2L -> 0L), sout.toString)
    // the 8-byte-exchange variant (hashGrams) is row-identical to the
    // SQL-replayable string-key default on a real corpus
    val strRes = TextOps.removeDuplicatedSpans(docs, "doc_id", "text", n = 3)
      .collect().map(_.toString).sorted
    val hashRes = TextOps.removeDuplicatedSpans(docs, "doc_id", "text", n = 3,
        hashGrams = true)
      .collect().map(_.toString).sorted
    assert(strRes === hashRes)
  }

  test("removeDuplicatedSpans unit=char catches sub-token-boundary duplication") {
    import spark.implicits._
    // COUNTER-PROOF (Lee et al. ExactSubstr granularity): the shared span
    // is two LONG words glued to different junk at BOTH ends without
    // separators — each copy's first and last tokens differ, so no word
    // n-gram (even n=1 worth of boundary words) is shared, yet a 70-char
    // run is duplicated verbatim
    val w1 = "supercalifragilisticexpialidocious"
    val w2 = "pneumonoultramicroscopicsilicovolcanoconiosis"
    val dfX = Seq(
      (1L, s"aaa$w1 ${w2}ttt plus unique tail material one"),
      (2L, s"bbb$w1 ${w2}zzz and another different ending"),
      (3L, "wholly unrelated text with zero shared content here")
    ).toDF("doc_id", "text")
    val word = TextOps.removeDuplicatedSpans(dfX, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(word === Map(1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"word grams were expected to MISS the glued span: $word")
    // char mode (n chars ≈ ExactSubstr length threshold) cuts it from both
    val ch = TextOps.removeDuplicatedSpans(dfX, "doc_id", "text", n = 20,
        unit = "char")
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
    assert(ch(3L)._1 === 0L, ch.toString)  // clean doc untouched
    val coreLen = (w1 + " " + w2).length
    assert(ch(1L)._1 >= coreLen && ch(2L)._1 >= coreLen,
      s"char mode failed to cut the glued span: $ch")
    assert(!ch(1L)._2.contains(w1) && !ch(2L)._2.contains(w1), ch.toString)
    // raw-text preservation: survivors keep case and spacing
    val cased = Seq((1L, "KeepCase ABCDEFGHIJKLMNOPQRSTUV tail"),
      (2L, "Other ABCDEFGHIJKLMNOPQRSTUV end")).toDF("doc_id", "text")
    val cres = TextOps.removeDuplicatedSpans(cased, "doc_id", "text", n = 20,
        unit = "char")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(cres(1L).contains("KeepCase"), cres.toString)
    // hashGrams parity holds in char mode too
    val cs = TextOps.removeDuplicatedSpans(dfX, "doc_id", "text", n = 20,
      unit = "char").collect().map(_.toString).sorted
    val chh = TextOps.removeDuplicatedSpans(dfX, "doc_id", "text", n = 20,
      unit = "char", hashGrams = true).collect().map(_.toString).sorted
    assert(cs === chh)
    // invalid unit refuses
    intercept[IllegalArgumentException](
      TextOps.removeDuplicatedSpans(dfX, "doc_id", "text", n = 20, unit = "byte"))
  }

  test("graft_normalize SQL function: registered surface matches the Column API") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_normalize('café'), graft_normalize('ﬁne', 'NFKC'), " +
        "graft_normalize(CAST(NULL AS STRING))").head
    assert(r.getString(0) === "café")
    assert(r.getString(1) === "fine")
    assert(r.isNullAt(2))
    // the registry surface and Column API are the same expression
    import spark.implicits._
    val viaCol = Seq("café").toDF("t")
      .select(TextOps.normalizeUnicode(col("t"))).head.getString(0)
    assert(viaCol === r.getString(0))
  }

  test("extractText: adversarial markup battery (nested tags, raw-text " +
      "elements, entities, broken markup)") {
    import spark.implicits._
    def ext(html: String, maxLd: Double = 1.0): String = {
      val r = Seq(Tuple1(html)).toDF("h")
        .select(TextOps.extractText(col("h"), maxLd)).head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // nested + inline tags: block boundaries become line breaks, inline
      // tags vanish without breaking words
      assert(ext("<div><p>a <b>b</b>c</p><p>d</p></div>") === "a bc\nd")
      // script is a RAW-TEXT element: a <p> tag, a comment opener, and
      // entities inside the payload are payload, not markup
      assert(ext("x<script>if (a<b) { s = \"<p>&amp;<!--\"; }</script>y") === "xy")
      assert(ext("x<SCRIPT SRC='a.js'>var a;</ScRiPt >y") === "xy")
      assert(ext("x<style>p > a { }</style>y") === "xy")
      // unterminated raw-text element swallows the rest (browser behavior)
      assert(ext("keep<script>var a = 1; rest never closes") === "keep")
      // comments and CDATA drop wholly, even with tags inside
      assert(ext("a<!-- <p>hidden</p> \n more -->b") === "ab")
      assert(ext("a<![CDATA[ <p>raw</p> ]]>b") === "ab")
      assert(ext("a<!-- never closed") === "a")
      // broken markup: a bare '<' is text (HTML5 recovery); an
      // unterminated tag at EOF truncates
      assert(ext("1 < 2 and 2 > 1") === "1 < 2 and 2 > 1")
      assert(ext("a <5% b") === "a <5% b")
      assert(ext("keep <p then eof never closes") === "keep")
      // entities: named, numeric, hex, unknown-literal, unterminated
      assert(ext("&lt;tag&gt; &amp;&amp; &quot;q&quot; &apos;s&apos;") ===
        "<tag> && \"q\" 's'")
      assert(ext("&#65;&#x42;&#67;") === "ABC")
      assert(ext("&unknown; &amp stays & alone") === "&unknown; &amp stays & alone")
      // single-pass decode: &amp;lt; is the TEXT "&lt;", not "<"
      assert(ext("&amp;lt;") === "&lt;")
      // nbsp becomes a PLAIN space and collapses with neighbours
      assert(ext("a&nbsp; &nbsp;b") === "a b")
      // typographic set decodes
      assert(ext("&mdash;&hellip;&rsquo;") === "—…’")
      // whitespace: runs with a newline collapse to ONE \n, others to ' ';
      // block tags and source newlines are the same line break
      assert(ext("  a \t b \n\n c  ") === "a b\nc")
      assert(ext("<p>a</p>\n<p>b</p>") === "a\nb")
      assert(ext("<ul><li>one</li><li>two</li></ul>") === "one\ntwo")
      // empty / null / tag-only inputs
      assert(ext("") === "")
      assert(ext("<p></p><div></div>") === "")
      assert(ext(null) === null)
      // self-closing raw-text tag has no content to skip
      assert(ext("a<script src='x'/>b<br/>c") === "ab\nc")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
    intercept[IllegalArgumentException](TextOps.extractText(col("t"), 0.0))
    intercept[IllegalArgumentException](TextOps.extractText(col("t"), 1.5))
  }

  test("extractText link-density filter drops nav/footer boilerplate, keeps prose") {
    import spark.implicits._
    val page =
      "<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact</a></nav>" +
        "<p>This is the actual article body with a single " +
        "<a href='x'>inline link</a> among plenty of prose text.</p>" +
        "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>"
    def ext(maxLd: Double) = Seq(Tuple1(page)).toDF("h")
      .select(TextOps.extractText(col("h"), maxLd)).head.getString(0)
    // threshold off: everything survives as three lines
    val all = ext(1.0)
    assert(all.split('\n').length === 3, all)
    // 0.5: the nav and footer lines (≈100% anchor chars) drop; the prose
    // line (small anchor share) stays
    val filtered = ext(0.5)
    assert(filtered === "This is the actual article body with a single " +
      "inline link among plenty of prose text.", filtered)
    // nested <a> and stray </a> don't wedge the depth counter
    val nested = "<p><a><a>all link</a></a> rest</p><p>plain</p></a>"
    val out = Seq(Tuple1(nested)).toDF("h")
      .select(TextOps.extractText(col("h"), 0.5)).head.getString(0)
    assert(out === "plain", out)
  }

  test("graft_extract_text SQL function matches the Column API") {
    graft.functions.registerAll(spark)
    val html = "<p>a &amp; b</p><script>drop()</script><p>c</p>"
    val r = spark.sql(
      s"SELECT graft_extract_text('$html'), " +
        s"graft_extract_text('<nav><a href=x>L</a></nav><p>prose text</p>', 0.5), " +
        "graft_extract_text(CAST(NULL AS STRING))").head
    assert(r.getString(0) === "a & b\nc")
    assert(r.getString(1) === "prose text")
    assert(r.isNullAt(2))
    import spark.implicits._
    val viaCol = Seq(Tuple1(html)).toDF("t")
      .select(TextOps.extractText(col("t"))).head.getString(0)
    assert(viaCol === r.getString(0))
  }

  test("removeDuplicatedSpansToFixedPoint: cut seams expose stragglers, iteration converges") {
    import spark.implicits._
    // A and C agree AROUND the span A shares with B: cutting "d u p" out of
    // A collapses it onto C's seam text, so pass 2 finds duplication pass 1
    // could not see — the reason suffix-array dedup iterates
    // seam halves SHORTER than n on each side: "x y" and "z w" share no
    // 3-gram with C pre-cut, but cutting "d u p" out of A yields exactly C
    val a = "x y d u p z w"
    val b = "k1 k2 d u p k3 k4"
    val c = "x y z w"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val once = TextOps.removeDuplicatedSpans(df, "doc_id", "text", n = 3)
    val fixed = TextOps.removeDuplicatedSpansToFixedPoint(df, "doc_id", "text", n = 3)
    val onceM = once.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val fixedM = fixed.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(onceM !== fixedM.map { case (k, v) => k -> v._3 },
      "single pass already at fixed point — the straggler case is vacuous")
    // the output IS a fixed point: one more pass removes nothing
    val again = TextOps.removeDuplicatedSpans(
      fixed.select(col("doc_id"), col("text")), "doc_id", "text", n = 3)
    assert(again.agg(sum("removed_tokens")).head.getLong(0) === 0L)
    // totals account exactly: original length == kept + removed
    fixedM.foreach { case (id, (nTok, removed, text)) =>
      val kept = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(nTok === kept + removed, s"doc $id: $nTok != $kept + $removed")
    }
    // B only carried the shared span; its seam is unique and survives
    assert(fixedM(2L)._3 === "k1 k2 k3 k4")
  }

  test("removeDuplicatedSpans fuzz: matches an in-memory reference on random corpora") {
    import spark.implicits._
    // tiny vocabulary so cross-document n-gram collisions actually occur
    // at random; the reference recomputes the covered-index union from
    // first principles per doc
    val rnd = new scala.util.Random(12021)
    for (trial <- 1 to 4) {
      val n = 2 + rnd.nextInt(2) // 2 or 3
      val vocabSize = 6 + rnd.nextInt(6)
      val corpus = (1L to 30L).map { id =>
        val len = rnd.nextInt(30) // includes len 0 and len < n
        (id, Vector.fill(len)(s"t${rnd.nextInt(vocabSize)}").mkString(" "))
      }
      val tokd = corpus.map { case (id, text) => id -> text.split(" ", -1).toVector }.toMap
      val gramDocs = scala.collection.mutable.Map[String, Set[Long]]()
      tokd.foreach { case (id, ts) =>
        if (ts.size >= n) ts.sliding(n).foreach { g =>
          val k = g.mkString(" ")
          gramDocs(k) = gramDocs.getOrElse(k, Set.empty) + id
        }
      }
      val dup = gramDocs.collect { case (g, s) if s.size >= 2 => g }.toSet
      val expected = tokd.map { case (id, ts) =>
        val cov = scala.collection.mutable.Set[Int]()
        if (ts.size >= n) (0 to ts.size - n).foreach { p =>
          if (dup(ts.slice(p, p + n).mkString(" "))) cov ++= (p until p + n)
        }
        val kept = ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }
        id -> ((ts.size.toLong, cov.size.toLong, kept.mkString(" ")))
      }
      val got = TextOps.removeDuplicatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got === expected, s"trial $trial (n=$n vocab=$vocabSize)")
    }
  }

  test("LSH ANN recall vs brute-force top-5") {
    val qids = LlmQueries.AnnQueryIds
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // explicit numPlanes keeps the REAL multiprobe path engaged (the derived
    // plane count on a 500-vector corpus trips the small-corpus fallback,
    // pinned exact below). 6 planes over 500 vectors is a deliberately
    // over-fine quantizer doing ~0.7x the brute-force work — recall 0.75 is
    // the honest mechanism gate here; scale-derived configs size buckets to
    // ~1M vectors where the probe covers a query's true neighborhood
    val approx = Similarity.lshTopK(embs, "vec_id", "embedding", qids, 5,
        numPlanes = 6)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map { q =>
      exact(q).count(approx.getOrElse(q, Set.empty).contains).toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.75, s"mean recall@5 = $mean (per-query $recalls)")
  }

  test("LSH ANN small-corpus fallback returns the exact result") {
    val qids = LlmQueries.AnnQueryIds
    // derived planes on 500 vectors: probed cells x tables >= bucket space,
    // so lshTopK delegates to bruteForceTopK — results are identical, not
    // merely high-recall
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
    val viaLsh = Similarity.lshTopK(embs, "vec_id", "embedding", qids, 5)
    assert(viaLsh.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(viaLsh).count() === 0)
  }

  test("IVF ANN with nProbe = nLists is exactly brute force; partial probe recall >= 0.9") {
    val qids = LlmQueries.AnnQueryIds
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // probing every list degenerates to an exact scan — results must MATCH
    val full = Similarity.ivfTopK(embs, "vec_id", "embedding", qids, 5,
        nLists = 8, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qids.foreach(q => assert(full(q) === exact(q), s"query $q full-probe != brute force"))
    // partial probe: recall@5 stays high while scanning ~nProbe/nLists
    val approx = Similarity.ivfTopK(embs, "vec_id", "embedding", qids, 5,
        nLists = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map { q =>
      exact(q).count(approx.getOrElse(q, Set.empty).contains).toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"IVF mean recall@5 = $mean (per-query $recalls)")
  }

  test("persisted IVF index: full probe exact, load round-trip, sync on append") {
    import graft.llm.IvfIndex
    val qids = LlmQueries.AnnQueryIds
    val loc = java.nio.file.Files.createTempDirectory("graft-ivfidx-")
      .toString + "/idx"
    val idx = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 8)
    // the index table is identity-partitioned by list with frozen centroids
    assert(idx.table.meta.spec.fields.map(_.name) === Seq("list"))
    assert(idx.centroids.size === 8)
    // full probe through the persisted index == brute force
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val full = idx.topK(qids, 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qids.foreach(q => assert(full(q) === exact(q), s"query $q full-probe != brute force"))
    // partial probe recall stays high, probe-only (no re-fit)
    val approx = idx.topK(qids, 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map { q =>
      exact(q).count(approx.getOrElse(q, Set.empty).contains).toDouble / exact(q).size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"persisted-IVF recall ${recalls.sum / recalls.size}")
    // load round-trip: centroids and properties survive
    val loaded = IvfIndex.load(spark, loc)
    assert(loaded.centroids === idx.centroids)
    assert(loaded.idCol === "vec_id" && loaded.vecCol === "embedding")
    // sync: an appended vector gets an assignment (and only new ids append)
    val before = loaded.table.newScan().toDF.count()
    val novel = embs.filter(col("vec_id") === 7L)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    assert(loaded.sync(novel.unionByName(embs.limit(3))) === 1L)
    assert(loaded.table.newScan().toDF.count() === before + 1)
    // the synced vector is findable: probing near its own embedding returns
    // its duplicate (vec_id 7) as a top neighbor
    val dup = loaded.topK(Seq(1000007L), k = 1, nProbe = 8).collect().head
    assert(dup.getLong(2) === 7L, s"expected synced twin, got $dup")
    assert(dup.getDouble(3) === 1.0)
  }

  test("IVF refresh: incremental catch-up, drift refit, changelog DML path") {
    import graft.llm.IvfIndex
    import graft.meta.Schema
    val qids = LlmQueries.AnnQueryIds
    // corpus as a graft TABLE so refresh can plan the appended delta
    val base = java.nio.file.Files.createTempDirectory("graft-ivfr-").toString
    val corpus = graft.table.IceTable.create(spark, s"$base/corpus",
      Schema.fresh(embs.schema))
    corpus.append(embs)
    val idx0 = IvfIndex.buildFrom(spark, corpus, "vec_id", "embedding",
      s"$base/idx", nLists = 8)
    assert(idx0.table.meta.properties.get(IvfIndex.CorpusSnapProp)
      === corpus.meta.currentSnapshotId.map(_.toString))
    // no corpus change → no-op
    val same = IvfIndex.refresh(spark, corpus, s"$base/idx")
    assert(same.appended === 0L && !same.refit)

    // 1% -ish delta: refresh takes the INCREMENTAL path (no refit)
    val delta = embs.limit(5).withColumn("vec_id", col("vec_id") + 2000000L)
    corpus.append(delta)
    val r1 = IvfIndex.refresh(spark, corpus, s"$base/idx")
    assert(!r1.refit, "small delta must not refit")
    assert(r1.appended === 5L)
    assert(r1.index.table.meta.properties(IvfIndex.CorpusSnapProp)
      === corpus.meta.currentSnapshotId.get.toString)
    // refreshed FULL probe is row-identical to a from-scratch rebuild at
    // the same nProbe (both equal brute force over the grown corpus)
    val rebuilt = IvfIndex.buildFrom(spark, corpus, "vec_id", "embedding",
      s"$base/idx_rebuild", nLists = 8)
    def full(ix: IvfIndex) = ix.topK(qids, 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val a = full(r1.index); val b = full(rebuilt)
    qids.foreach(q => assert(a(q) === b(q), s"query $q refreshed != rebuilt"))
    // partial-probe recall holds on the refreshed index
    val exact = Similarity.bruteForceTopK(corpus.toDF, "vec_id", "embedding",
      qids, 5).select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = r1.index.topK(qids, 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map(q =>
      exact(q).count(approx.getOrElse(q, Set.empty).contains).toDouble / exact(q).size)
    assert(recalls.sum / recalls.size >= 0.9,
      s"refreshed-index recall ${recalls.sum / recalls.size}")

    // drift: a delta above the refit share triggers a full re-fit
    val big = embs.withColumn("vec_id", col("vec_id") + 3000000L)
    corpus.append(big)
    val r2 = IvfIndex.refresh(spark, corpus, s"$base/idx", refitShare = 0.2)
    assert(r2.refit, "drifted corpus must refit")
    assert(r2.index.table.meta.properties(IvfIndex.CorpusSnapProp)
      === corpus.meta.currentSnapshotId.get.toString)

    // DML (delete + fresh appends) in range: the CHANGELOG path reconciles
    // WITHOUT a refit (r12b) — net deletes leave the index, fresh ids
    // arrive against the frozen centroids, one MERGE commit
    val wmBeforeDml = corpus.meta.currentSnapshotId.get
    corpus.delete(graft.meta.expr.Exprs.greaterThan("vec_id", 3000400L))
    corpus.append(embs.limit(2).withColumn("vec_id", col("vec_id") + 4000000L))
    val r3 = IvfIndex.refresh(spark, corpus, s"$base/idx", refitShare = 0.99)
    assert(!r3.refit, "small DML delta must take the changelog path, not refit")
    assert(r3.deleted === 99L && r3.appended === 2L, s"${r3.deleted}/${r3.appended}")
    // the refreshed index reflects the delete: the removed ids are gone
    assert(r3.index.table.newScan().toDF
      .filter(col("vec_id") > 3000400L and col("vec_id") < 4000000L).count() === 0L)
    assert(r3.index.table.meta.properties(IvfIndex.CorpusSnapProp)
      === corpus.meta.currentSnapshotId.get.toString)
    // full probe row-identical to a from-scratch rebuild over the DML'd
    // corpus (both are exhaustive at nProbe = nLists)
    val rebuilt3 = IvfIndex.buildFrom(spark, corpus, "vec_id", "embedding",
      s"$base/idx_rebuild3", nLists = 8)
    val a3 = full(r3.index); val b3 = full(rebuilt3)
    qids.foreach(q => assert(a3(q) === b3(q), s"query $q changelog-refreshed != rebuilt"))
    // crash-window rerun CONVERGES: force the watermark back to the
    // pre-DML snapshot (the state a crash between the MERGE and the
    // watermark commit leaves) and refresh again — replayed deletes match
    // nothing, replayed upserts rewrite the same values, no duplicates
    val countAfter = r3.index.table.newScan().toDF.count()
    r3.index.table.updateProperties(
      Map(IvfIndex.CorpusSnapProp -> wmBeforeDml.toString))
    val r3b = IvfIndex.refresh(spark, corpus, s"$base/idx", refitShare = 0.99)
    assert(!r3b.refit)
    val after = r3b.index.table.newScan().toDF
    assert(after.count() === countAfter, "rerun changed the row count")
    assert(after.groupBy("vec_id").count().filter(col("count") > 1).count() === 0L,
      "rerun introduced duplicate ids")
  }

  test("quantized IVF probe ranks on persisted codes, recall@5 >= 0.9") {
    import graft.llm.IvfIndex
    val qids = LlmQueries.AnnQueryIds
    val loc = java.nio.file.Files.createTempDirectory("graft-ivfq-")
      .toString + "/idx"
    val idx = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 8)
    // codes + qscale are persisted index columns, filled for every row
    assert(idx.table.meta.schema.columnNames.contains("codes"))
    assert(idx.table.newScan().toDF
      .filter(col("codes").isNull || col("qscale").isNull).count() === 0)
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // full probe + rescore: int8 ranking then exact math on survivors
    val quant = idx.topKQuantized(qids, 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map { q =>
      exact(q).count(quant.getOrElse(q, Set.empty).contains).toDouble / exact(q).size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"quantized-probe recall ${recalls.sum / recalls.size} (per-query $recalls)")
    // synced rows get codes too (no null codes sneaking past the probe)
    val novel = embs.filter(col("vec_id") === 3L)
      .withColumn("vec_id", col("vec_id") + 2000000L)
    assert(idx.sync(novel) === 1L)
    assert(idx.table.newScan().toDF.filter(col("codes").isNull).count() === 0)
  }

  test("PQ probe: exact under full rescore, recall@5 >= 0.9, codes verified") {
    import graft.llm.IvfIndex
    val qids = LlmQueries.AnnQueryIds
    val loc = java.nio.file.Files.createTempDirectory("graft-ivfpq-")
      .toString + "/idx"
    val idx = IvfIndex.buildPq(spark, embs, "vec_id", "embedding", loc,
      nLists = 8, m = 16, ks = 64)
    val books = idx.pq.getOrElse(fail("PQ index lost its codebooks"))
    assert(books.books.size === 16 && books.ks === 64)
    assert(books.books.forall(b => b.size == 64 && b.forall(_.length == 4)))
    // every row carries an M-byte code
    val withLen = idx.table.newScan().toDF
      .select(col("vec_id"), col("pqcodes"), col("embedding"), col("list"))
    assert(withLen.filter(col("pqcodes").isNull ||
      length(col("pqcodes")) =!= 16).count() === 0)
    // kernel pin: persisted codes equal a from-scratch driver re-encode
    // (residual against the row's coarse centroid, L2-nearest per subspace,
    // ties to the larger index) for a sample of rows
    val cents = idx.centroids
    withLen.orderBy("vec_id").limit(20).collect().foreach { r =>
      val v = r.getSeq[Float](2).map(_.toDouble)
      val list = r.getInt(3)
      val code = r.getAs[Array[Byte]](1)
      val res = v.indices.map(i => v(i) - cents(list)(i))
      (0 until 16).foreach { m =>
        val slice = res.slice(m * 4, m * 4 + 4)
        var best = 0; var bestD = Double.PositiveInfinity
        books.books(m).zipWithIndex.foreach { case (w, c) =>
          val d = slice.zip(w).map { case (x, y) => (x - y) * (x - y) }.sum
          if (d <= bestD) { best = c; bestD = d }
        }
        assert((code(m) & 0xff) === best,
          s"row ${r.getLong(0)} subspace $m: persisted ${code(m) & 0xff} != $best")
      }
    }
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .select("query_id", "rank", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // EXACTNESS pin: full probe + a rescore window covering the whole
    // corpus means ADC only ORDERS survivors that all survive — the exact
    // rescore must then reproduce brute force row for row
    val full = idx.topKPq(qids, 5, nProbe = 8, rescoreFactor = 200)
      .select("query_id", "rank", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(full.sortBy(t => (t._1, t._2)) === exact.sortBy(t => (t._1, t._2)),
      "full-rescore PQ probe diverged from brute force")
    // the production shape: ADC ranking + small rescore window — the PQ
    // approximation must still surface the true neighbors
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val pq = idx.topKPq(qids, 5, nProbe = 8, rescoreFactor = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map { q =>
      exactSets(q).count(pq.getOrElse(q, Set.empty).contains).toDouble /
        exactSets(q).size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"PQ-probe recall ${recalls.sum / recalls.size} (per-query $recalls)")
    // synced rows are PQ-encoded too, and a non-PQ fallback still answers
    val novel = embs.filter(col("vec_id") === 3L)
      .withColumn("vec_id", col("vec_id") + 3000000L)
    assert(idx.sync(novel) === 1L)
    assert(idx.table.newScan().toDF.filter(col("pqcodes").isNull).count() === 0)
  }

  test("Bm25Index: persisted postings score exactly like the one-shot op") {
    import graft.llm.Bm25Index
    val loc = java.nio.file.Files.createTempDirectory("graft-bm25i-")
      .toString + "/idx"
    val idx = Bm25Index.build(spark, docs, "doc_id", "text", loc, nBuckets = 8)
    val q = spark.createDataFrame(Seq(
      (1L, "hash join merge"), (2L, "fast scan filter"),
      (3L, "customer order data"), (4L, ""), (5L, "zzz_not_a_term")))
      .toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaIndex = rows(idx.query(q, "qid", "qtext", k = 10))
    val oneShot = rows(TextOps.bm25(docs, "doc_id", "text", q, "qid", "qtext",
      k = 10))
    assert(viaIndex === oneShot, "index scores diverge from the one-shot op")
    // stats props match a direct corpus computation; postings bucket-pruned
    assert(idx.docCount === docs.count())
    assert(idx.table.meta.spec.fields.map(_.transform.name) ===
      Seq("bucket[8]"))
    // all-unknown-terms and empty-text queries answer empty, loudly typed
    assert(idx.query(q.filter(col("qid") >= 4L), "qid", "qtext", 5).count() === 0)
    // the batch JOIN path (no driver term collect) is row-identical to
    // query() on the same batch — including the degenerate queries
    val viaJoin = rows(idx.queryJoin(q, "qid", "qtext", k = 10))
    assert(viaJoin === viaIndex, "queryJoin diverges from query()")
    assert(idx.queryJoin(q.filter(col("qid") >= 4L), "qid", "qtext", 5)
      .count() === 0)
    // corpus-as-queries (the table-to-table shape the driver-collect path
    // is not meant for): 500 queries × top-3, row-identical to query() —
    // at test scale the collect path is still feasible, so it oracles the
    // join path on the exact shape queryJoin exists for
    val corpusQ = docs.select(col("doc_id").as("qid"), col("text").as("qtext"))
    assert(rows(idx.queryJoin(corpusQ, "qid", "qtext", k = 3)) ===
      rows(idx.query(corpusQ, "qid", "qtext", k = 3)),
      "corpus-scale queryJoin diverges from the collect path")
  }

  test("Bm25Index refresh: append path, changelog DML path, convert composes") {
    import graft.llm.Bm25Index
    import graft.table.IceTable
    import graft.meta.Schema
    val base = java.nio.file.Files.createTempDirectory("graft-bm25r-").toString
    val corpus0 = docs.select(col("doc_id"), col("text"))
    val ct = IceTable.create(spark, s"$base/corpus", Schema.fresh(corpus0.schema))
    ct.append(corpus0)
    Bm25Index.buildFrom(spark, ct, "doc_id", "text", s"$base/idx", nBuckets = 8)
    val q = spark.createDataFrame(Seq(
      (1L, "hash join merge"), (2L, "customer order data"))).toDF("qid", "qtext")
    def rows(i: Bm25Index) = i.query(q, "qid", "qtext", k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    def rebuilt(tag: String) = Bm25Index.buildFrom(spark, ct, "doc_id", "text",
      s"$base/idx_$tag", nBuckets = 8)
    // 1) append-only range → one atomic append+stats transaction
    ct.append(corpus0.limit(20).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" hash join merge")).as("text")))
    val r1 = Bm25Index.refresh(spark, ct, s"$base/idx")
    assert(!r1.rebuilt && r1.upserted === 20L && r1.deleted === 0L)
    assert(rows(r1.index) === rows(rebuilt("a")),
      "append-refreshed index diverges from a from-scratch rebuild")
    assert(r1.index.docCount === rebuilt("a2").docCount &&
      r1.index.totalTokens === rebuilt("a2").totalTokens)
    // 2) DML range → changelog path: eq deletes on doc + fresh postings.
    // The range carries BOTH a delete and an insert so the crash-window
    // replay below exercises insert convergence too.
    val wmAfterR1 = ct.meta.currentSnapshotId.get
    val statsAfterR1 = (r1.index.docCount, r1.index.totalTokens)
    ct.delete(graft.meta.expr.Exprs.in("doc_id",
      (100001L to 100010L).map(Long.box): _*))
    ct.append(corpus0.limit(5).select(
      (col("doc_id") + 200000L).as("doc_id"),
      concat(col("text"), lit(" customer order data")).as("text")))
    spark.conf.set("spark.sql.catalog.gbm", "graft.spark.GraftCatalog")
    val r2 = Bm25Index.refresh(spark, ct, s"$base/idx")
    assert(!r2.rebuilt && r2.deleted === 10L && r2.upserted === 5L)
    assert(rows(r2.index) === rows(rebuilt("b")),
      "changelog-refreshed index diverges from a from-scratch rebuild")
    assert(r2.index.docCount === rebuilt("b2").docCount &&
      r2.index.totalTokens === rebuilt("b2").totalTokens)
    // the refresh wrote equality deletes; converting them to position
    // deletes (the new maintenance action) must not change scores
    val eqBefore = r2.index.table.newScan().planDeletes()
      .count(_._1.content == graft.meta.model.FileContent.EqualityDeletes)
    assert(eqBefore >= 1, "DML refresh should leave eq deletes")
    val (cv, _) = r2.index.table.convertEqualityDeletes()
    assert(cv === eqBefore)
    assert(rows(Bm25Index.load(spark, s"$base/idx")) === rows(rebuilt("c")),
      "convert_equality_deletes changed index scores")
    // 3) crash-window rerun converges: a crash between the postings
    // commit and the properties commit leaves the POSTINGS applied but
    // watermark AND stats stale (they ride one properties commit) —
    // recreate exactly that state and refresh again: the replayed eq
    // deletes kill the first attempt's appended postings before
    // re-appending (strictly-older-sequence), and the stats deltas apply
    // once, from the stale base they were computed against
    val wmNow = ct.meta.currentSnapshotId.get
    val idxT = graft.table.IceTable.load(spark,
      r2.index.table.location) // fresh handle at the current metadata
    idxT.updateProperties(Map(
      Bm25Index.CorpusSnapProp -> wmAfterR1.toString,
      Bm25Index.DocCountProp -> statsAfterR1._1.toString,
      Bm25Index.TotalTokensProp -> statsAfterR1._2.toString))
    val r3 = Bm25Index.refresh(spark, ct, s"$base/idx")
    assert(!r3.rebuilt)
    assert(ct.meta.currentSnapshotId.get === wmNow)
    assert(rows(r3.index) === rows(rebuilt("d")), "rerun diverged")
    assert(r3.index.docCount === r2.index.docCount &&
      r3.index.totalTokens === r2.index.totalTokens, "rerun drifted stats")
    // 4) changed share past the cap → rebuild
    ct.delete(graft.meta.expr.Exprs.lessThan("doc_id", 100000L))
    val r4 = Bm25Index.refresh(spark, ct, s"$base/idx", maxChangedShare = 0.2)
    assert(r4.rebuilt)
    assert(rows(r4.index) === rows(rebuilt("e")))
  }

  test("indexes over an encrypted corpus are keyed: sealed on disk, plaintext refuses") {
    import graft.llm.{Bm25Index, IvfIndex}
    import graft.table.{AesGcmEncryptionManager, FileIO, IceTable, TableOperations}
    import graft.meta.Schema
    import spark.implicits._
    val manager = new AesGcmEncryptionManager(
      "0123456789abcdef0123456789abcdef".getBytes("UTF-8"), "idx-key")
    val base = java.nio.file.Files.createTempDirectory("graft-encidx-").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val seed = (0L until 30L).map(i => (i,
      s"zanzibar document w${i % 5} about zanzibar topic w${i % 3}",
      (0 until 8).map(j => math.sin(i * 31 + j).toFloat)))
    val corpus = IceTable.createWith(spark,
      new TableOperations(s"$base/corpus", new FileIO(conf, manager)),
      Schema.fresh(seed.toDF("doc_id", "text", "embedding").schema))
    corpus.append(seed.toDF("doc_id", "text", "embedding"))
    // buildFrom inherits the corpus's manager — no extra plumbing
    val bm = Bm25Index.buildFrom(spark, corpus, "doc_id", "text",
      s"$base/bm25", nBuckets = 4)
    val ann = IvfIndex.buildPqFrom(spark, corpus, "doc_id", "embedding",
      s"$base/ann", nLists = 4, m = 8, ks = 16)
    assert(bm.table.io.encryption eq manager)
    assert(ann.table.io.encryption eq manager)
    // queries work through the keyed handles
    val q = Seq((1L, "zanzibar")).toDF("qid", "qtext")
    assert(bm.query(q, "qid", "qtext", k = 5).count() === 5)
    assert(ann.topKPq(Seq(0L), k = 3, nProbe = 4).count() === 3)
    assert(ann.knnJoin(corpus.toDF.limit(3), "doc_id", "embedding", k = 2,
      nProbe = 4, excludeSelf = true).count() === 6)
    // NOTHING plaintext on disk: the distinctive term (in every doc, so
    // any plaintext postings/data/metadata file would carry it) appears
    // nowhere in either index tree; sidecars are sealed too
    val needle = "zanzibar".getBytes("UTF-8")
    def leaks(dir: java.io.File): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dir).filter { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        bytes.indexOfSlice(needle.toIndexedSeq) >= 0 ||
          new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
            .contains("zanzibar")
      }.map(_.getPath)
    }
    assert(leaks(new java.io.File(s"$base/bm25")).isEmpty, "bm25 leak")
    assert(leaks(new java.io.File(s"$base/ann")).isEmpty, "ann leak")
    val sealedHead = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/ann/ix-v1/ann/centroids.json"))
      .take(4), "ISO-8859-1")
    assert(!sealedHead.startsWith("["), "centroids sidecar left plaintext")
    // a plaintext handle refuses both indexes loudly
    intercept[Exception] { Bm25Index.load(spark, s"$base/bm25").docCount }
    intercept[Exception] { IvfIndex.load(spark, s"$base/ann")
      .topK(Seq(0L), 1, 4).count() }
    // refresh stays keyed and incremental
    corpus.append(seed.take(3).map { case (i, t, v) => (i + 1000L, t, v) }
      .toDF("doc_id", "text", "embedding"))
    val rb = Bm25Index.refresh(spark, corpus, s"$base/bm25")
    assert(!rb.rebuilt && rb.upserted === 3L)
    // the RETURNED handle must carry the corpus key: the append path once
    // reloaded with the default plaintext manager, so the first use threw
    assert(rb.index.table.io.encryption eq manager)
    assert(rb.index.query(q, "qid", "qtext", k = 5).count() === 5)
    val ra = IvfIndex.refresh(spark, corpus, s"$base/ann", refitShare = 0.5)
    assert(!ra.refit && ra.appended === 3L)
    assert(leaks(new java.io.File(s"$base/bm25")).isEmpty, "bm25 refresh leak")
    assert(leaks(new java.io.File(s"$base/ann")).isEmpty, "ann refresh leak")
  }

  test("knnJoin: full probe equals brute force, partial probe recalls, self-row") {
    import graft.llm.IvfIndex
    val loc = java.nio.file.Files.createTempDirectory("graft-knnj-")
      .toString + "/idx"
    val idx = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 8)
    val queries = embs.filter(col("vec_id") % 25 === 0)
    val qids = queries.select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(qids.size >= 10)
    // full probe = exact: identical to the driver-side brute force
    val joined = idx.knnJoin(queries, "vec_id", "embedding", k = 3,
        nProbe = 8, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(joined === brute, "full-probe knnJoin != brute force")
    // partial probe: distributed recall stays high (same nProbe=4/8 as the
    // driver-side probe gates; this query set is 4x broader)
    val part = idx.knnJoin(queries, "vec_id", "embedding", k = 3, nProbe = 4,
        excludeSelf = true)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val exact = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = qids.map(q =>
      exact(q).count(part.getOrElse(q, Set.empty).contains).toDouble / exact(q).size)
    // the 0.9 gates elsewhere use the 5-query AnnQueryIds subset; this
    // 20-query sweep includes harder boundary queries (measured 0.78 at
    // 4/8 lists on this corpus) — the gate pins "multiprobe works through
    // the join path", the ranking math itself is pinned exact above
    assert(recalls.sum / recalls.size >= 0.75,
      s"knnJoin recall ${recalls.sum / recalls.size}")
    // without excludeSelf a corpus query's own row ranks first at sim 1.0
    val self = idx.knnJoin(queries.limit(3), "vec_id", "embedding", k = 1,
      nProbe = 8).collect()
    assert(self.forall(r => r.getLong(0) === r.getLong(2) &&
      r.getDouble(3) === 1.0))
  }

  test("knnJoinPq: distributed ADC + distributed rescore matches knnJoin") {
    import graft.llm.IvfIndex
    val loc = java.nio.file.Files.createTempDirectory("graft-knnpq-")
      .toString + "/idx"
    val idx = IvfIndex.buildPq(spark, embs, "vec_id", "embedding", loc,
      nLists = 8, m = 16, ks = 64)
    val queries = embs.filter(col("vec_id") % 25 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    // full probe + corpus-wide rescore window: the ADC phase only orders
    // survivors that ALL survive — must reproduce the float knnJoin
    // (itself pinned == brute force) row for row
    val viaPq = rows(idx.knnJoinPq(queries, "vec_id", "embedding", k = 3,
      nProbe = 8, rescoreFactor = 200, excludeSelf = true))
    val viaFloat = rows(idx.knnJoin(queries, "vec_id", "embedding", k = 3,
      nProbe = 8, excludeSelf = true))
    assert(viaPq === viaFloat, "full-rescore knnJoinPq != knnJoin")
    // production window: ADC ranking must still surface the true top-k
    val part = idx.knnJoinPq(queries, "vec_id", "embedding", k = 3,
        nProbe = 8, rescoreFactor = 4, excludeSelf = true)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val exact = viaFloat.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.keys.toSeq.map(q =>
      exact(q).count(part.getOrElse(q, Set.empty).contains).toDouble /
        exact(q).size)
    assert(recalls.sum / recalls.size >= 0.9,
      s"knnJoinPq recall ${recalls.sum / recalls.size}")
  }

  test("sampled quantizer fit: full-probe exactness holds, recall degrades gracefully") {
    import graft.llm.IvfIndex
    import graft.table.IceTable
    import graft.meta.Schema
    val base = java.nio.file.Files.createTempDirectory("graft-fitsmp-").toString
    val corpus = IceTable.create(spark, s"$base/corpus", Schema.fresh(embs.schema))
    corpus.append(embs.repartition(8)) // several files: file-level sampling bites
    val idx = IvfIndex.buildPqFrom(spark, corpus, "vec_id", "embedding",
      s"$base/idx", nLists = 8, m = 16, ks = 64, fitSampleFraction = 0.5)
    // every vector is INDEXED regardless of the fit sample
    assert(idx.table.newScan().toDF.count() === embs.count())
    val qids = LlmQueries.AnnQueryIds
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // full probe is exact NO MATTER how the quantizer was fitted
    val full = idx.topK(qids, 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qids.foreach(q => assert(full(q) === exact(q), s"query $q sampled-fit full-probe"))
    // the PQ path too (sampled codebooks; corpus-wide rescore => exact)
    val pqFull = idx.topKPq(qids, 5, nProbe = 8, rescoreFactor = 200)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qids.foreach(q => assert(pqFull(q) === exact(q)))
    // approximation quality degrades gracefully, not catastrophically
    val part = idx.topK(qids, 5, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qids.map(q =>
      exact(q).count(part.getOrElse(q, Set.empty).contains).toDouble / exact(q).size)
    // half the fit data on a 500-vector weak-signal corpus measures 0.72
    // at 4/8 lists (full fit: ~0.9) — the gate pins "degrades, not
    // collapses"; at real scale the sample still dwarfs 100× nLists
    assert(recalls.sum / recalls.size >= 0.6,
      s"sampled-fit recall ${recalls.sum / recalls.size}")
    intercept[IllegalArgumentException] {
      IvfIndex.buildFrom(spark, corpus, "vec_id", "embedding", s"$base/bad",
        fitSampleFraction = 0.0)
    }
  }

  test("PQ index survives refresh: delta rows encoded, drift refit keeps PQ") {
    import graft.llm.IvfIndex
    import graft.table.IceTable
    import graft.meta.Schema
    val base = java.nio.file.Files.createTempDirectory("graft-pqrf-").toString
    val corpus = IceTable.create(spark, s"$base/corpus",
      Schema.fresh(embs.schema))
    corpus.append(embs)
    IvfIndex.buildPqFrom(spark, corpus, "vec_id", "embedding", s"$base/idx",
      nLists = 8, m = 16, ks = 64)
    // small append → incremental path; the appended rows carry PQ codes
    corpus.append(embs.limit(7).withColumn("vec_id", col("vec_id") + 5000000L))
    val r1 = IvfIndex.refresh(spark, corpus, s"$base/idx", refitShare = 0.5)
    assert(!r1.refit && r1.appended === 7L)
    assert(r1.index.pq.isDefined)
    assert(r1.index.table.newScan().toDF
      .filter(col("pqcodes").isNull || length(col("pqcodes")) =!= 16)
      .count() === 0)
    // big append past refitShare → refit; the rebuilt index is still PQ
    corpus.append(embs.withColumn("vec_id", col("vec_id") + 6000000L))
    val r2 = IvfIndex.refresh(spark, corpus, s"$base/idx", refitShare = 0.2)
    assert(r2.refit)
    val re = IvfIndex.load(spark, s"$base/idx")
    assert(re.pq.isDefined, "drift refit dropped the product quantizer")
    assert(re.pq.get.books.size === 16 && re.pq.get.ks === 64)
    assert(re.table.newScan().toDF.filter(col("pqcodes").isNull).count() === 0)
    // pq.json round-trips bit-exactly (Double.toString <-> toDouble)
    val rt = IvfIndex.parsePq(IvfIndex.pqJson(re.pq.get))
    assert(rt === re.pq.get)
  }

  test("codegen'd nearest-centroid matches the interpreted HOF oracle bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(4321)
    val dim = 8
    val cents: Seq[Seq[Double]] = Seq.tabulate(5)(i =>
      if (i == 4) Seq.tabulate(dim)(d => if (d == 0) 1.0 else 0.1 * 0) // dup of 3
      else Seq.tabulate(dim)(d => rnd.nextGaussian())
    ).updated(3, Seq.tabulate(dim)(d => if (d == 0) 1.0 else 0.0))
      .updated(4, Seq.tabulate(dim)(d => if (d == 0) 1.0 else 0.0)) // exact tie 3==4
    val vecs = (0 until 200).map(i => (i.toLong,
      if (i == 0) Array.fill(dim)(0.0) // zero vector → all sims NaN
      else if (i == 1) Array.tabulate(dim)(d => if (d == 0) 2.0 else 0.0) // ties 3 vs 4
      else Array.fill(dim)(rnd.nextGaussian())))
    // double-array column AND float-array column (the corpus type)
    val dfD = vecs.toDF("id", "v")
    val dfF = dfD.select(col("id"), col("v").cast("array<float>").as("v"))
    for (df <- Seq(dfD, dfF)) {
      // fallback disabled: a Janino error in doGenCode fails here instead of
      // silently degrading to interpreted eval
      spark.conf.set("spark.sql.codegen.fallback", "false")
      try {
        val got = df.select(col("id"),
            Similarity.nearestList(col("v"), cents).as("n"),
            Similarity.nearestLists(col("v"), cents, 3).as("ns"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
        // the HOF oracle THROWS on the zero vector (ANSI divide-by-zero in
        // the interpreted cosine) — parity is pinned on every non-degenerate
        // row; the expression's zero-vector behavior is pinned separately
        val nonZero = df.filter(col("id") =!= 0L)
        val oracle = nonZero.select(col("id"),
            Similarity.nearestListHof(col("v"), cents).as("n"),
            Similarity.nearestListsHof(col("v"), cents, 3).as("ns"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
        assert(got.filter(_._1 != 0L) === oracle)
        // the documented tie rule is visible: id 1 ties centroids 3 and 4 →
        // the larger index wins; and the zero vector ASSIGNS (NaN sims →
        // last index) instead of crashing the fit like the HOF form did
        got.filter(t => t._1 == 0L || t._1 == 1L).foreach(t =>
          assert(t._2 === 4, s"tie/NaN pick for ${t._1}: $t"))
      } finally spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("codegen'd dot product and sign-bit bucket match the HOF oracles") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    val dim = 16
    val rows = (0 until 300).map { i =>
      (i.toLong,
        Array.fill(dim)(rnd.nextGaussian()),
        Array.fill(dim)(rnd.nextGaussian()))
    }
    val planes = Similarity.hyperplanes(7, dim, seed = 99L)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val dfD = rows.toDF("id", "a", "b")
      // double arrays, float arrays, and int8 code arrays (the persisted-
      // index ranking input) — every element type the probes feed
      val dfF = dfD.select(col("id"), col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
      val dfB = dfD.select(col("id"),
        transform(col("a"), x => least(greatest(round(x * 30), lit(-127L)),
          lit(127L)).cast("tinyint")).as("a"),
        transform(col("b"), x => least(greatest(round(x * 30), lit(-127L)),
          lit(127L)).cast("tinyint")).as("b"))
      for (df <- Seq(dfD, dfF, dfB)) {
        val got = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"),
            Similarity.bucketOf(col("a"), planes).as("bk"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
        val oracle = df.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"),
            Similarity.bucketOfHof(col("a"), planes).as("bk"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
        assert(got === oracle) // bit-exact: same accumulation order
      }
      // HOF null algebra: null element or length mismatch → null dot, and
      // the sign-bit bucket degrades to 0 exactly like when(null >= 0, ...)
      val edge = Seq(
        (1L, Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
        (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)))
        .toDF("id", "a", "b")
      val gotE = edge.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"),
          Similarity.bucketOf(col("a"), planes).as("bk"))
        .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getInt(2))).toSeq
      val oracleE = edge.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("d"),
          Similarity.bucketOfHof(col("a"), planes).as("bk"))
        .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getInt(2))).toSeq
      assert(gotE === oracleE)
      assert(gotE.forall(t => t._2 && t._3 === 0), gotE.toString)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("codegen'd minhash signature matches the HOF oracle bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(31337)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextLong()))
    } :+ (999L, Seq.empty[Long]) // empty shingle set → all-MaxValue signature
    val df = rows.toDF("id", "hs")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.select(col("id"),
          Dedup.minHashSignatureFromHashes(col("hs"), 16).as("sig"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      val oracle = df.select(col("id"),
          Dedup.minHashSignatureFromHashesHof(col("hs"), 16).as("sig"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      assert(got === oracle)
      assert(got.last._2.forall(_ == Long.MaxValue))
      // null shingle hashes are skipped by the hash (seed passes through),
      // exactly like the HOF's xxhash64(null, i)
      val withNull = Seq((1L, Seq[java.lang.Long](5L, null, 7L))).toDF("id", "hs")
      val g = withNull.select(Dedup.minHashSignatureFromHashes(col("hs"), 4))
        .collect().head.getSeq[Long](0)
      val o = withNull.select(Dedup.minHashSignatureFromHashesHof(col("hs"), 4))
        .collect().head.getSeq[Long](0)
      assert(g === o)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("persisted quantized probe matches the one-shot quantized oracle rows") {
    import graft.llm.IvfIndex
    val qids = LlmQueries.AnnQueryIds
    val loc = java.nio.file.Files.createTempDirectory("graft-ivfp-")
      .toString + "/idx"
    val idx = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // nProbe = nLists probes every list → both paths rank the SAME int8
    // codes over the same candidate set and rescore the same survivors:
    // the persisted index must reproduce the one-shot reference rows
    // exactly (this is the cross-implementation parity the scaladocs
    // claim — drift in either quantized path fails here, not just a
    // recall gate)
    val persisted = rows(idx.topKQuantized(qids, 5, nProbe = 8))
    val oneShot = rows(
      Similarity.quantizedTopK(embs, "vec_id", "embedding", qids, 5))
    assert(persisted === oneShot)
  }

  test("external-vector probes find corpus twins (exact and quantized)") {
    import graft.llm.IvfIndex
    val loc = java.nio.file.Files.createTempDirectory("graft-ivfx-")
      .toString + "/idx"
    val idx = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 8)
    // a query vector COPIED from corpus row 7 but labelled with 7 (a
    // colliding external label): external probes must NOT self-exclude —
    // the corpus twin is the correct best match at sim 1.0
    val twin = embs.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    for (df <- Seq(idx.topKForVectors(Seq((7L, twin)), k = 1, nProbe = 8),
        idx.topKQuantizedForVectors(Seq((7L, twin)), k = 1, nProbe = 8))) {
      val top = df.collect().head
      assert(top.getLong(2) === 7L, s"expected corpus twin, got $top")
      assert(top.getDouble(3) === 1.0)
    }
    // external probes agree with the in-index probe on a real corpus query
    val qv = embs.filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    val viaVector = idx.topKForVectors(Seq((999L, qv)), k = 6, nProbe = 8)
      .collect().map(_.getLong(2)).toSeq
    val viaId = idx.topK(Seq(3L), k = 5, nProbe = 8)
      .collect().map(_.getLong(2)).toSeq
    // the vector probe sees row 3 itself as rank 1; the rest must match
    assert(viaVector.head === 3L)
    assert(viaVector.tail === viaId)
    // malformed external input fails fast: wrong dimension, duplicate labels
    intercept[IllegalArgumentException] {
      idx.topKForVectors(Seq((1L, twin ++ Seq(0.0))), k = 1)
    }
    intercept[IllegalArgumentException] {
      idx.topKQuantizedForVectors(Seq((1L, twin), (1L, qv)), k = 1)
    }
  }

  test("IVF publish is crash-atomic: an interrupted build never hides the index") {
    import graft.llm.IvfIndex
    val loc = java.nio.file.Files.createTempDirectory("graft-ivfatomic-")
      .toString + "/idx"
    val io = new graft.table.FileIO(spark.sparkContext.hadoopConfiguration)
    val idx1 = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 4)
    val cents1 = idx1.centroids
    // a build that died mid-way leaves an UNCOMMITTED version dir (no
    // ann.committed marker) — loads must keep serving the old index
    io.mkdirs(s"$loc/ix-v2/metadata")
    io.writeString(s"$loc/ix-v2/metadata/garbage.json", "{not an index}")
    val afterCrash = IvfIndex.load(spark, loc)
    assert(afterCrash.centroids === cents1)
    assert(afterCrash.topK(LlmQueries.AnnQueryIds, 3, nProbe = 4).count() > 0)
    // a completed rebuild commits a higher version and retires the rest
    val idx3 = IvfIndex.build(spark, embs, "vec_id", "embedding", loc, nLists = 4)
    assert(io.exists(s"$loc/ix-v3/ann.committed"))
    assert(!io.exists(s"$loc/ix-v1"), "superseded version not retired")
    assert(IvfIndex.load(spark, loc).centroids === idx3.centroids)
  }

  test("IVF list count scales with corpus size") {
    assert(Similarity.listsFor(500) === 2) // floor
    assert(Similarity.listsFor(10_000_000_000L) === 9537) // ~1M vectors per list
    assert(Similarity.listsFor(100_000_000_000L) === 1 << 14) // hierarchical beyond
    assert(Similarity.listsFor(3L << 20) === 3)
  }

  test("LSH ANN plane count scales with corpus size") {
    assert(Similarity.planesFor(500) === 3) // floor
    assert(Similarity.planesFor(1L << 24) === 4)
    assert(Similarity.planesFor(10_000_000_000L) === 14) // ~100 TB of vectors
    // probe fraction stays bounded: radius-2 probes over 2^14 buckets
    val p = Similarity.planesFor(10_000_000_000L)
    val probes = 1 + p + p * (p - 1) / 2
    assert(probes.toDouble / (1 << p) < 0.01)
  }

  test("PII scrub redacts emails and URLs; repetition flags boilerplate") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to bob@corp.io or visit https://corp.io/a?b=1 today"),
      (2L, "clean text with no contact info at all"),
      (3L, "spam spam spam spam spam spam spam spam"),
      (4L, "see https://host.com/u/bob@mail.com for details")).toDF("id", "t")
    val out = df.select($"id", TextOps.scrubPii($"t").as("s"),
        TextOps.piiCount($"t").as("n"),
        TextOps.repetitionRatio($"t", 3).as("rep"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("s") === "write to <EMAIL> or visit <URL> today")
    assert(out(1L).getAs[Int]("n") === 2)
    assert(out(2L).getAs[String]("s") === "clean text with no contact info at all")
    assert(out(2L).getAs[Int]("n") === 0)
    // "spam"×8 has 6 trigrams, 1 distinct → rep = 1 - 1/6
    assert(out(3L).getAs[Double]("rep") === 0.8333)
    assert(out(2L).getAs[Double]("rep") === 0.0)
    // an email embedded in a URL is ONE redacted span (URL wins)
    assert(out(4L).getAs[String]("s") === "see <URL> for details")
    assert(out(4L).getAs[Int]("n") === 1)
  }

  test("removeDuplicates drops exactly the higher ids of verified pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
    val dupIds = pairs.select("id_b").distinct().count()
    val kept = Dedup.removeDuplicates(docs, "doc_id", pairs)
    assert(kept.count() === docs.count() - dupIds)
  }

  test("exactDedup keeps one row per key") {
    val df = docs.select(col("doc_id"), (col("doc_id") % 7).as("k"))
    val d = Dedup.exactDedup(df, "doc_id", col("k"))
    assert(d.count() === 7)
    assert(d.agg(max("doc_id")).collect()(0).getLong(0) === 6)
  }

  test("decontaminate drops exactly the docs sharing an n-gram with the eval set") {
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val kept = Dedup.decontaminate(corpus, "doc_id", "text", evalSet, "text", 3)
    // truth via STRING shingle intersection (validates the hash shortcut)
    val evalSh = evalSet
      .select(explode(TextOps.shingles(col("text"), 3)).as("sh")).distinct()
    val contaminated = corpus
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("sh"))
      .join(evalSh, Seq("sh"), "left_semi").select("doc_id").distinct()
    assert(contaminated.count() > 0, "test corpus must contain contamination")
    val expect = corpus.join(contaminated, Seq("doc_id"), "left_anti")
    assert(kept.count() === expect.count())
    assert(kept.select("doc_id").exceptAll(expect.select("doc_id")).count() === 0)
  }

  test("exactDedup (skew-safe join form) matches the window form, incl. null keys") {
    val df = docs.select(col("doc_id"),
      when(col("doc_id") % 11 === 0, lit(null)).otherwise(col("doc_id") % 7).as("k"))
    val d = Dedup.exactDedup(df, "doc_id", col("k"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("doc_id"))
    val viaWindow = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    assert(d.count() === viaWindow.count())
    assert(d.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(d).count() === 0)
    // null keys form their own single group
    assert(d.filter(col("k").isNull).count() === 1)
  }

  test("exactDedup drops groups whose ids are all null instead of fabricating rows") {
    import spark.implicits._
    val df = Seq((Some(1L), Some("a")), (None, Some("a")), (None, None))
      .toDF("id", "k")
    val d = Dedup.exactDedup(df, "id", col("k")).collect()
    // group "a" keeps id=1; the (null,null) group has no non-null id — no
    // phantom all-null row may appear
    assert(d.length === 1 && d(0).getLong(0) === 1L)
  }

  test("exactDedup returns one row per key even when ids tie") {
    import spark.implicits._
    val df = Seq((1L, "a", "r1"), (1L, "a", "r2"), (2L, "a", "r3"),
      (5L, "b", "r4")).toDF("id", "k", "payload")
    val d = Dedup.exactDedup(df, "id", col("k"))
    assert(d.count() === 2) // one per key, despite two rows tying at (a, 1)
    assert(d.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 5L))
    assert(d.columns.toSeq === Seq("id", "k", "payload")) // schema unchanged
  }

  test("multimodal: stubbed decode plumbing produces typed metadata + frames") {
    val packed = Multimodal.packFakeMedia(docs.limit(20), "text")
    val meta = Multimodal.extractMeta(packed, "media")
    val rows = meta.select("doc_id", "meta.kind", "meta.size_bytes",
      "meta.width", "meta.height", "meta.checksum").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getString(1) === "image/fake")
      assert(r.getLong(2) > 0)
      assert(r.getInt(3) >= 16 && r.getInt(3) < 256)
      assert(r.getString(5).length === 8)
    }
    // deterministic: second run identical
    val again = Multimodal.extractMeta(packed, "media")
      .select("doc_id", "meta.width").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getInt(3)))
    // frame sampling: every 2nd 100-byte frame
    val frames = Multimodal.sampleFrames(packed, "media", frameBytes = 100, everyN = 2)
    val f = frames.select("doc_id", "frame_idx", "frame").collect()
    assert(f.forall(_.getInt(1) % 2 === 0))
    assert(f.forall(r => r.getAs[Array[Byte]](2).length <= 100))
  }

  test("multimodal: featurize feeds the ANN surface — media search is the text pipeline") {
    val packed = Multimodal.packFakeMedia(docs.limit(50), "text").cache()
    val emb = Multimodal.featurize(packed, "media", dim = 16)
    // contract: fixed dim, unit norm, null payload → null embedding
    val norms = emb.select(col("doc_id"),
      size(col("embedding")).as("d"),
      aggregate(col("embedding"), lit(0.0),
        (s, x) => s + x.cast("double") * x.cast("double")).as("n2")).collect()
    assert(norms.forall(_.getInt(1) === 16))
    norms.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-5))
    val withNull = Multimodal.featurize(
      packed.withColumn("media", lit(null).cast("binary")).limit(1), "media")
    assert(withNull.select("embedding").head().isNullAt(0))
    // deterministic: same payload, same vector
    val e1 = emb.select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val e2 = Multimodal.featurize(packed, "media", dim = 16)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(e1 === e2)
    // and the embeddings flow straight into the similarity surface: an
    // exact byte-duplicate payload is its twin's top-1 at cosine 1
    val ids = packed.select("doc_id").limit(2).collect().map(_.getLong(0))
    val dup = packed.filter(col("doc_id") === ids(0))
      .withColumn("doc_id", lit(9999L))
    val corpus = Multimodal.featurize(packed.unionByName(dup), "media", dim = 16)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val top1 = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        Seq(9999L), k = 1)
      .select("neighbor_id", "sim").head()
    assert(top1.getLong(0) === ids(0))
    assert(math.abs(top1.getDouble(1) - 1.0) < 1e-4)
  }

  test("multimodal: REAL image decode — same pixels under different encodings meet at cosine 1") {
    import spark.implicits._
    // deterministic synthetic images (no fixtures needed): gradient +
    // per-image pattern so the three are visually distinct
    def makeImage(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val r = (x * 4 + seed * 40) % 256
        val g = (y * 5 + seed * 80) % 256
        val b = (x * y * (seed + 1)) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      img
    }
    def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      bos.toByteArray
    }
    val img0 = makeImage(0)
    val png0 = encode(img0, "png")
    val bmp0 = encode(img0, "bmp") // same pixels, entirely different bytes
    assert(!java.util.Arrays.equals(png0, bmp0))
    val rows = Seq((1L, png0), (2L, encode(makeImage(1), "png")),
      (3L, encode(makeImage(2), "png")), (9999L, bmp0))
    val df = spark.createDataset(rows).toDF("doc_id", "media")
    // metadata: true dimensions and sniffed kinds, not the stub fields
    val meta = Multimodal.extractMeta(df, "media")
      .select(col("doc_id"), col("meta.kind"), col("meta.width"),
        col("meta.height")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(meta(1L) === (("image/png", 64, 48)))
    assert(meta(9999L) === (("image/bmp", 64, 48)))
    // the luma-grid embedding sees PIXELS: the byte-different BMP twin is
    // the PNG's top-1 at cosine ≈ 1 — unreachable for any byte-level
    // feature (the two payloads share almost no byte structure)...
    val emb = Multimodal.featurize(df, "media", dim = 64)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val top1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        Seq(9999L), k = 1)
      .select("neighbor_id", "sim").head()
    assert(top1.getLong(0) === 1L, top1.toString)
    assert(math.abs(top1.getDouble(1) - 1.0) < 1e-4, top1.toString)
    // ...and distinct images do NOT collapse together
    val sims = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        Seq(2L), k = 3).select("neighbor_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims.filterNot(_._1 == 2L).values.forall(_ < 0.99), sims.toString)
    // proof the decode is load-bearing: the raw BYTE histograms of the two
    // twin payloads are far apart
    def hist(p: Array[Byte]): Array[Double] = {
      val h = new Array[Double](64)
      p.foreach(b => h((b & 0xff) % 64) += 1)
      val n = math.sqrt(h.map(x => x * x).sum)
      h.map(_ / n)
    }
    val byteCos = hist(png0).zip(hist(bmp0)).map { case (a, b) => a * b }.sum
    assert(byteCos < 0.999, s"byte histograms unexpectedly aligned: $byteCos")
  }

  test("multimodal: animated GIF — frame-sampled temporal pooling, timing-different twins meet") {
    import spark.implicits._
    def makeImage(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val r = (x * 4 + seed * 40) % 256
        val g = (y * 5 + seed * 80) % 256
        val b = (x * y * (seed + 1)) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      img
    }
    // standard ImageIO animated-GIF writing: per-frame metadata carries
    // the GraphicControlExtension delay — two encodings of the SAME
    // frames with different delays are byte-different payloads
    def animatedGif(frames: Seq[java.awt.image.BufferedImage], delayCs: Int): Array[Byte] = {
      import javax.imageio.metadata.IIOMetadataNode
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      val params = writer.getDefaultWriteParam
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(f), params)
        val fmt = meta.getNativeMetadataFormatName
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", delayCs.toString)
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, meta), params)
      }
      writer.endWriteSequence(); ios.close()
      baos.toByteArray
    }
    val frames = Seq(makeImage(0), makeImage(1), makeImage(2))
    val slow = animatedGif(frames, delayCs = 50)
    val fast = animatedGif(frames, delayCs = 5)
    assert(!java.util.Arrays.equals(slow, fast))
    def gif1(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos)); bos.toByteArray
    }
    val static0 = gif1(makeImage(0))
    val other = animatedGif(Seq(makeImage(7), makeImage(8), makeImage(9)), 10)
    val df = spark.createDataset(Seq(
      (1L, slow), (2L, fast), (3L, static0), (4L, other))).toDF("doc_id", "media")
    // metadata: true frame counts, appended field (image columns stable)
    val meta = Multimodal.extractMeta(df, "media")
      .select(col("doc_id"), col("meta.kind"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(meta(1L) === (("image/gif", 3)))
    assert(meta(2L) === (("image/gif", 3)))
    assert(meta(3L) === (("image/gif", 1)))
    // temporal pooling sees FRAMES: the timing-different twin is top-1 at
    // cosine ≈ 1 (byte-different payloads), a different animation is not,
    // and the static first frame does NOT collapse onto the animation
    val emb = Multimodal.featurize(df, "media", dim = 64)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val top1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(1L), k = 1)
      .select("neighbor_id", "sim").head()
    assert(top1.getLong(0) === 2L, top1.toString)
    assert(math.abs(top1.getDouble(1) - 1.0) < 1e-4, top1.toString)
    val sims = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(1L), k = 3)
      .select("neighbor_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(4L) < 0.99, sims.toString)
    assert(sims.getOrElse(3L, 0.0) < 0.999,
      s"static frame collapsed onto the animation: $sims")
    // a static GIF keeps the exact single-image embedding (bit-stable
    // with the pre-animation code path)
    val viaImage = Multimodal.featurize(
        spark.createDataset(Seq((3L, static0))).toDF("doc_id", "media"),
        "media", dim = 64)
      .select("embedding").head().getSeq[Float](0)
    val inMix = Multimodal.featurize(df, "media", dim = 64)
      .where(col("doc_id") === 3L).select("embedding").head().getSeq[Float](0)
    assert(viaImage === inMix)
  }

  test("multimodal: REAL audio decode — WAV and AIFF of the same samples meet at cosine 1") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // deterministic synthetic PCM: per-seed chirp + envelope so clips are
    // audibly (and envelope-) distinct
    def pcm16(seed: Int, frames: Int): Array[Byte] = {
      val out = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val t = i.toDouble / 8000.0
        val env = 0.2 + 0.8 * math.abs(math.sin(t * (1.0 + seed)))
        val s = (math.sin(2 * math.Pi * (200 + 70 * seed + 30 * t) * t) * env
          * 30000).toInt
        out(2 * i) = (s & 0xff).toByte // little-endian signed 16-bit
        out(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
    def container(pcm: Array[Byte], fileType: AudioFileFormat.Type): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, fileType, bos)
      bos.toByteArray
    }
    val pcm0 = pcm16(0, 8000) // one second at 8 kHz
    val wav0 = container(pcm0, AudioFileFormat.Type.WAVE)
    val aiff0 = container(pcm0, AudioFileFormat.Type.AIFF)
    assert(!java.util.Arrays.equals(wav0, aiff0)) // byte-different (endianness + headers)
    val rows = Seq((1L, wav0),
      (2L, container(pcm16(3, 8000), AudioFileFormat.Type.WAVE)),
      (3L, container(pcm16(7, 8000), AudioFileFormat.Type.WAVE)),
      (9999L, aiff0))
    val df = spark.createDataset(rows).toDF("doc_id", "media")
    // metadata: true audio fields, not the stub image fields
    val meta = Multimodal.extractMeta(df, "media")
      .select(col("doc_id"), col("meta.kind"), col("meta.sample_rate"),
        col("meta.channels"), col("meta.duration_ms")).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(meta(1L) === (("audio/wav", 8000, 1, 1000L)))
    assert(meta(9999L) === (("audio/aiff", 8000, 1, 1000L)))
    // the RMS-envelope embedding sees SAMPLES: the byte-different AIFF
    // twin is the WAV's top-1 at cosine ≈ 1 through the same ANN surface
    val emb = Multimodal.featurize(df, "media", dim = 64)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val top1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        Seq(9999L), k = 1)
      .select("neighbor_id", "sim").head()
    assert(top1.getLong(0) === 1L, top1.toString)
    assert(math.abs(top1.getDouble(1) - 1.0) < 1e-4, top1.toString)
    // distinct clips do NOT collapse together
    val sims = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        Seq(2L), k = 3).select("neighbor_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims.filterNot(_._1 == 2L).values.forall(_ < 0.99), sims.toString)
    // non-audio payloads keep the byte-level fallback bit-identical:
    // text bytes still produce the stub meta fields with null audio fields
    val text = Multimodal.extractMeta(
      Multimodal.packFakeMedia(Seq((5L, "hello world")).toDF("doc_id", "text"),
        "text"), "media")
      .select(col("meta.kind"), col("meta.sample_rate")).head()
    assert(text.getString(0) === "image/fake" && text.isNullAt(1))
  }

  test("multimodal: decompression-bomb image falls back instead of OOMing the task") {
    import spark.implicits._
    // a real 8×8 PNG whose IHDR is patched to DECLARE 50000×50000
    // (CRC recomputed so the reader trusts the header): decode must refuse
    // on declared dimensions BEFORE allocating pixels — a ~10 GB
    // BufferedImage would kill the executor with an uncatchable OOM
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bomb = bos.toByteArray.clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putInt(16, 50000) // IHDR width  (signature 8 + len 4 + "IHDR" 4)
    putInt(20, 50000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 4 + 13) // chunk type + IHDR data
    putInt(12 + 4 + 13, crc.getValue.toInt)
    val df = spark.createDataset(Seq((1L, bomb))).toDF("doc_id", "media")
    // meta: the bomb is refused at the header → deterministic fallback
    val meta = Multimodal.extractMeta(df, "media")
      .select("meta.kind", "meta.width").head()
    assert(meta.getString(0) === "image/fake", meta.toString) // fallback path
    // featurize: byte-histogram fallback, still unit-norm — no crash
    val emb = Multimodal.featurize(df, "media", dim = 16)
      .select("embedding").head().getSeq[Float](0)
    assert(emb.length === 16)
    assert(math.abs(emb.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
  }

  test("rolling fingerprints: identical normalized text → identical sketch") {
    val a = TextOps.rollingFingerprints("the  quick\tbrown fox")
    val b = TextOps.rollingFingerprints("the quick brown fox")
    assert(a === b)
    val c = TextOps.rollingFingerprints("a completely different document body")
    assert(a !== c)
  }

  test("langid heuristic is deterministic and covers all labels") {
    val preds = docs.select(TextOps.langId(col("text")).as("p"))
      .groupBy("p").count().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("sequence packing: every doc once, budget held, oversized isolated") {
    val budget = 80
    val packed = graft.llm.Packing.packSequences(
      docs, "doc_id", TextOps.tokenCount(col("text")), budget, shards = 4).cache()
    try {
      // every document lands in exactly one bin
      assert(packed.count() === docs.count())
      assert(packed.select("id").distinct().count() === docs.count())
      val bins = graft.llm.Packing.packedBins(packed, budget).cache()
      // no regular bin exceeds the budget
      assert(bins.filter(!col("oversized") && col("bin_tokens") > budget).count() === 0)
      // oversized docs sit alone, and only docs over the budget are marked
      assert(bins.filter(col("oversized") && col("n_docs") =!= 1).count() === 0)
      val oversized = packed.filter(col("oversized")).count()
      val actualOver = docs.filter(TextOps.tokenCount(col("text")) > budget).count()
      assert(oversized === actualOver)
      // FFD on this corpus should fill regular bins reasonably well
      val fill = bins.filter(!col("oversized"))
        .agg(avg("fill_ratio")).collect()(0).getDouble(0)
      assert(fill >= 0.6, s"mean fill ratio $fill too low for FFD")
    } finally { packed.unpersist(); }
  }

  test("IVF-bucketed embedding near-dup: high recall at a fraction of the cross join") {
    val embs = Tables.load(spark, sf001, "embeddings")
    val exact = Dedup.embeddingCosinePairs(embs, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus must contain near-dup pairs")
    val bucketed = Dedup.embeddingNearDupPairsBucketed(
        embs, "vec_id", "embedding", 0.45, nLists = 8, assignTo = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives: every emitted pair really clears the threshold
    assert(bucketed.subsetOf(exact), s"false pairs: ${bucketed -- exact}")
    val recall = exact.count(bucketed.contains).toDouble / exact.size
    assert(recall >= 0.8, s"bucketed recall $recall of ${exact.size} pairs")
  }

  test("bounded top-k aggregate matches the window ranking exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // duplicate sims force tie-breaks; multiple queries; > k rows per query
    val cands = (for {
      q <- 1L to 5L
      n <- 1L to 200L
    } yield (q, n, math.floor(rnd.nextDouble() * 50) / 50.0))
      .toDF("query_id", "neighbor_id", "sim")
      .repartition(7) // several partitions → partial heaps really merge
    val viaAgg = Similarity.topKPerQuery(cands, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    val viaWindow = cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(viaAgg.sortBy(t => (t._1, t._2)).toSeq ===
      viaWindow.sortBy(t => (t._1, t._2)).toSeq)
    // fewer candidates than k: all rows come back, still ranked
    val tiny = Seq((1L, 10L, 0.5), (1L, 2L, 0.9)).toDF("query_id", "neighbor_id", "sim")
    assert(Similarity.topKPerQuery(tiny, 10).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq === Seq((1, 2L), (2, 10L)))
    // the documented NaN divergence (TopKAggregate scaladoc): Spark's
    // descending sort ranks NaN FIRST, the bounded aggregate SKIPS it —
    // a degenerate vector's broken cosine must never be the "best" match
    val withNaN = Seq((1L, 10L, 0.5), (1L, 2L, 0.9), (1L, 99L, Double.NaN))
      .toDF("query_id", "neighbor_id", "sim")
    assert(Similarity.topKPerQuery(withNaN, 2).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq === Seq((1, 2L), (2, 10L)))
    val nanWindow = withNaN.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1).collect().head.getLong(1)
    assert(nanWindow === 99L, "window baseline should rank NaN first (Spark " +
      "ordering) - if this changes, revisit the documented divergence")
  }

  test("int8-quantized ANN recall@5 vs exact brute force") {
    val embs = Tables.load(spark, sf001, "embeddings")
    val qids = LlmQueries.AnnQueryIds
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", qids, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = Similarity.quantizedTopK(embs, "vec_id", "embedding", qids, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 recall $recall below 0.9")
  }

  test("int8 quantization bounds codes and preserves scale sign") {
    val embs = Tables.load(spark, sf001, "embeddings")
    val q = Similarity.quantizeInt8(embs, "vec_id", "embedding")
    val bad = q.filter(exists(col("codes"), c => abs(c) > 127) || col("qscale") <= 0)
    assert(bad.count() === 0)
  }

  test("mix sampling: zero-weight drops, >1 upsamples, deterministic") {
    val out = graft.llm.Sampling.sampleByDomain(
      docs.select("doc_id", "lang"), "doc_id", "lang",
      Map("en" -> 1.5, "fr" -> 0.25, "zh" -> 0.0), defaultWeight = 1.0, seed = 7L)
    assert(out.filter(col("lang") === "zh").count() === 0)
    val perEn = out.filter(col("lang") === "en").groupBy("doc_id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(perEn.subsetOf(Set(1L, 2L)), s"en copies should be 1 or 2: $perEn")
    val nEn = docs.filter(col("lang") === "en").count()
    val sampledEn = out.filter(col("lang") === "en").count()
    // 1.5× rate: expect ~1.5 copies per doc; residues are near-uniform
    assert(sampledEn > nEn && sampledEn < 2 * nEn)
    // default weight 1.0 keeps every doc of unlisted domains exactly once
    val de = out.filter(col("lang") === "de")
    assert(de.count() === docs.filter(col("lang") === "de").count())
    assert(de.agg(max("copy")).collect()(0).getInt(0) === 0)
    val rerun = graft.llm.Sampling.sampleByDomain(
      docs.select("doc_id", "lang"), "doc_id", "lang",
      Map("en" -> 1.5, "fr" -> 0.25, "zh" -> 0.0), defaultWeight = 1.0, seed = 7L)
    assert(rerun.count() === out.count())
  }

  test("temperature mixing: T=1 is identity, higher T flattens toward uniform") {
    val langs = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.size >= 3, "need several domains")
    val (rare, common) = (langs.minBy(_._2)._1, langs.maxBy(_._2)._1)
    // T = 1: natural proportions — every rate is exactly 1 (identity mix)
    val w1 = graft.llm.Sampling.temperatureWeights(docs, "lang", 1.0)
    w1.values.foreach(r => assert(math.abs(r - 1.0) < 1e-9, w1))
    assert(graft.llm.Sampling.sampleByTemperature(docs, "doc_id", "lang", 1.0)
      .count() === docs.count())
    // higher T: the rare domain is up-weighted relative to the common one
    val w4 = graft.llm.Sampling.temperatureWeights(docs, "lang", 4.0)
    assert(w4(rare) > w4(common), w4)
    // the cap bounds replay: no domain repeats more than maxRate epochs
    assert(w4.values.max <= 4.0 + 1e-9)
    val mixed = graft.llm.Sampling.sampleByTemperature(
      docs, "doc_id", "lang", 4.0).cache()
    try {
      // flatter mix: the rare share strictly grows vs the natural corpus
      val n = mixed.count().toDouble
      val rareShareBefore = langs(rare).toDouble / docs.count()
      val rareShareAfter =
        mixed.filter(col("lang") === rare).count() / n
      assert(rareShareAfter > rareShareBefore,
        s"$rareShareAfter vs $rareShareBefore")
      // deterministic: same seed, same mix
      assert(graft.llm.Sampling.sampleByTemperature(
        docs, "doc_id", "lang", 4.0).count() === mixed.count())
    } finally mixed.unpersist()
    // null domains are their own mixture component, distinct from "" —
    // T=1 identity must hold for them too (review finding: they were
    // silently dropped while still skewing every other domain's rate)
    import spark.implicits._
    val withNulls = Seq((1L, "en"), (2L, null: String), (3L, ""), (4L, "en"))
      .toDF("doc_id", "lang")
    val wN = graft.llm.Sampling.temperatureWeights(withNulls, "lang", 1.0)
    assert(wN.size === 3 && wN.values.forall(r => math.abs(r - 1.0) < 1e-9), wN)
    assert(graft.llm.Sampling.sampleByTemperature(withNulls, "doc_id", "lang", 1.0)
      .count() === 4)
    // the cap clamps ONLY the offending rare domain — a single tiny
    // domain must not rescale the whole mix toward zero
    val skewed = ((1L to 1000L).map(i => (i, "big")) ++ Seq((2000L, "tiny")))
      .toDF("doc_id", "lang")
    val wS = graft.llm.Sampling.temperatureWeights(skewed, "lang", 100.0,
      maxRate = 4.0)
    assert(wS("tiny") === 4.0, wS)
    assert(wS("big") > 0.4, s"common-domain rate collapsed: $wS")
  }

  test("sequence packing fails fast on null token counts") {
    import spark.implicits._
    val withNullText = Seq((1L, "some text"), (2L, null: String))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.llm.Packing.packSequences(withNullText, "doc_id",
        TextOps.tokenCount(col("text")), 80).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null token count")),
      messages(e).mkString("; "))
  }

  test("sequence packing is deterministic across runs") {
    val pack = () => graft.llm.Packing.packSequences(
        docs, "doc_id", TextOps.tokenCount(col("text")), 80, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pack() === pack())
  }

  test("token-quantile trim: approx sketch tracks the exact thresholds") {
    val exact = TextOps.filterByTokenQuantiles(docs, "text", 0.1, 0.9, exact = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val n = docs.count().toDouble
    // nontrivial trim: between 70% and 95% of the corpus survives
    assert(exact.size > n * 0.7 && exact.size < n * 0.95, exact.size)
    val approx = TextOps.filterByTokenQuantiles(docs, "text", 0.1, 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // GK sketch at 0.1% relative error on 500 docs: off by at most a doc
    // or two at each boundary
    assert((exact diff approx).size + (approx diff exact).size <= 10,
      s"approx diverged: exact=${exact.size} approx=${approx.size}")
    // an empty corpus has no quantiles: both modes return it unchanged
    val empty = docs.where(lit(false))
    assert(TextOps.filterByTokenQuantiles(empty, "text", 0.1, 0.9).count() === 0)
    assert(TextOps.filterByTokenQuantiles(empty, "text", 0.1, 0.9, exact = true)
      .count() === 0)
  }

  test("LSH bucket cap drops degenerate buckets; other pairs survive") {
    import spark.implicits._
    val boiler = (0L until 50L).map(i =>
      (i, "the same boilerplate text repeated over and over for every row " * 3))
    val near = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
    val df = (boiler ++ near).toDF("doc_id", "text")
    // identical docs agree in EVERY band, so the degenerate 50-doc bucket is
    // dropped in all bands; the genuine near-dup pair lives in small buckets
    val capped = Dedup.minHashLshPairs(df, "doc_id", "text", 3, 8, 2, 0.6,
        maxBucketSize = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)))
    // uncapped finds all 1225 identical pairs + the near pair
    val uncapped = Dedup.minHashLshPairs(df, "doc_id", "text", 3, 8, 2, 0.6,
      maxBucketSize = 0)
    assert(uncapped.count() === 50L * 49 / 2 + 1)
  }

  // ---- duplicate-cluster connected components ----

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n.toLong).map(v => v -> find(v)).toMap
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 60
      // mixes singletons, long chains (worst case for label propagation),
      // and dense blobs
      val chain = (40L until 59L).map(i => (i, i + 1))
      val random = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val edges = (chain ++ random).distinct
      val expected = unionFind(n, edges)
      // threshold 0 forces the DISTRIBUTED large/small-star loop; the
      // default takes the driver fast path — both must agree with the oracle
      for (threshold <- Seq(0L, 1L << 20)) {
        val got = Dedup.connectedComponents(
            edges.toDF("id_a", "id_b"), maxIterations = 30,
            smallGraphThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        edges.flatMap(e => Seq(e._1, e._2)).distinct.foreach { v =>
          assert(got(v) === expected(v), s"trial $trial node $v threshold $threshold")
        }
      }
    }
  }

  test("connected components release every storage block they pin") {
    import spark.implicits._
    val edges = ((0L until 50L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L))).toDF("id_a", "id_b")
    def pinned(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // without a checkpoint dir, at most the single re-rooted RESULT frame
    // stays pinned (not one frame per loop round)
    assert(spark.sparkContext.getCheckpointDir.isEmpty, "test order assumption")
    val before = pinned()
    val out = Dedup.connectedComponents(edges, smallGraphThreshold = 0L)
    assert(out.count() === 54L) // 51 chain nodes + 3 triple
    assert((pinned() -- before).size <= 1,
      s"more than the result frame pinned: ${pinned() -- before}")
    // with a checkpoint dir (the cluster configuration), the distributed
    // loop must leave ZERO new blocks pinned once the result is consumed
    val cpDir = java.nio.file.Files.createTempDirectory("graft-cc-cp-").toString
    spark.sparkContext.setCheckpointDir(cpDir)
    val before2 = pinned()
    val out2 = Dedup.connectedComponents(edges, smallGraphThreshold = 0L)
    assert(out2.count() === 54L)
    assert(pinned() === before2, s"leaked storage blocks: ${pinned() -- before2}")
    // result stays consumable after the loop frames are gone
    assert(out2.agg(countDistinct("component")).head().getLong(0) === 2L)
  }

  test("small-graph fast path handles a 100k-node chain (no recursion blowup)") {
    import spark.implicits._
    // descending edge order builds worst-case parent chains in union-find
    val edges = (0L until 100000L).map(i => (i, i + 1)).reverse
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .agg(countDistinct("component"), count(lit(1))).head()
    assert(got.getLong(0) === 1L, "one chain = one component")
    assert(got.getLong(1) === 100001L)
  }

  test("fuzzyDedup pipeline: exact copies collapse first, near-dups cluster after") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact copy
      (3L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup
      (4L, "an entirely different document about distributed query engines"),
      (5L, "an entirely different document about distributed query engines"), // exact copy
      (6L, "completely unrelated third topic with its own words and phrases"))
      .toDF("doc_id", "text")
    val kept = Dedup.fuzzyDedup(base, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1,2,3 are one cluster (exact + near) → keep 1; 4,5 → keep 4; 6 alone
    assert(kept === Set(1L, 4L, 6L))
  }

  test("fuzzyDedup persistIntermediate: same result, no pinned blocks after release") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "an entirely different document about distributed query engines"),
      (5L, "an entirely different document about distributed query engines"),
      (6L, "completely unrelated third topic with its own words and phrases"),
      (7L, "a fourth standalone subject mentioning neither foxes nor engines"))
      .toDF("doc_id", "text")
    val plain = Dedup.fuzzyDedup(base, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plain === Set(1L, 4L, 6L, 7L))
    // cluster configuration: reliable checkpoint dir → the persisted run
    // must leave ZERO new storage blocks pinned once it returns
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-fd-cp-").toString)
    def pinned(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = pinned()
    val persisted = Dedup.fuzzyDedup(base, "doc_id", "text", threshold = 0.5,
      persistIntermediate = true)
    assert(persisted.select("doc_id").collect().map(_.getLong(0)).toSet === plain)
    assert(pinned() === before, s"leaked storage blocks: ${pinned() -- before}")
    // the returned frame survives the intermediate's release
    assert(persisted.count() === 4L)
  }

  test("componentIds is transitive; dedupByComponents keeps one doc per cluster") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
    val comp = Dedup.componentIds(docs, "doc_id", pairs)
      .select("doc_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc labeled; component roots are their own component
    assert(comp.size === docs.count())
    comp.values.foreach(c => assert(comp(c) === c))
    // label sets agree with union-find over the same pairs
    val edges = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = unionFind(comp.keys.max.toInt + 1, edges)
    edges.flatMap(e => Seq(e._1, e._2)).distinct.foreach { v =>
      assert(comp(v) === expected(v))
    }
    // keep exactly one (the min) per cluster
    val kept = Dedup.dedupByComponents(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === comp.values.toSet)
    // empty pair set: everything survives, components are the ids
    val none = Dedup.componentIds(docs, "doc_id",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect()
    assert(none.forall(r => r.getAs[Long]("component") === r.getAs[Long]("doc_id")))
  }

  // ---- deterministic shuffle / split ----

  test("shuffleIntoShards: lossless, shard-consistent, partition-sorted, reproducible") {
    val out = graft.llm.Sampling.shuffleIntoShards(docs, "doc_id", 8, seed = 42L)
    val rows = out.select("doc_id", "shard", "sort_key").collect()
    assert(rows.map(_.getLong(0)).toSet === docs.select("doc_id")
      .collect().map(_.getLong(0)).toSet)
    // shard is a pure function of (id, seed) — spot-check the arithmetic
    rows.foreach { r =>
      val hex = r.getString(2).substring(0, 8)
      assert(r.getInt(1) === (java.lang.Long.parseLong(hex, 16) % 8).toInt)
    }
    // within each output partition rows really are in (shard, sort_key) order
    import spark.implicits._
    val ordered = out.select("shard", "sort_key").mapPartitions { it =>
      val xs = it.map(r => (r.getInt(0), r.getString(1))).toList
      Iterator.single(xs == xs.sorted)
    }.collect()
    assert(ordered.forall(identity))
    // same seed → identical permutation; different seed → different one
    val again = graft.llm.Sampling.shuffleIntoShards(docs, "doc_id", 8, 42L)
      .select("doc_id", "sort_key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === rows.map(r => (r.getLong(0), r.getString(2))).toSet)
    val other = graft.llm.Sampling.shuffleIntoShards(docs, "doc_id", 8, 43L)
      .select("doc_id", "sort_key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(other !== again)
  }

  test("assignSplit: weights normalize, fractions land near targets, deterministic") {
    val splits = graft.llm.Sampling.assignSplit(docs, "doc_id",
        Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), seed = 7L)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(splits.values.sum === n.toLong)
    assert(splits("train") / n > 0.8 && splits("train") / n < 0.97, splits)
    assert(splits.getOrElse("val", 0L) > 0 && splits.getOrElse("test", 0L) > 0)
    // integer weights with the same ratios give the IDENTICAL assignment
    val a = graft.llm.Sampling.assignSplit(docs, "doc_id",
        Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), 7L)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = graft.llm.Sampling.assignSplit(docs, "doc_id",
        Seq(("train", 18.0), ("val", 1.0), ("test", 1.0)), 7L)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  /** Independent sequential BPE reference (Sennrich-style): word counts in
    * a Map, argmax with (freq desc, left, right) tie order, greedy
    * leftmost non-overlapping merge. */
  private def bpeReference(texts: Seq[String], numMerges: Int,
      minFrequency: Long): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view
      .map { case (w, g) =>
        (w.toCharArray.map(_.toString).toVector :+ "</w>") -> g.size.toLong }
      .toMap
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var stop = false
    while (!stop && out.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      val best = counts.toSeq
        .sortBy { case ((l, r), f) => (-f, l, r) }.headOption
      best match {
        case Some(((l, r), f)) if f >= minFrequency =>
          out += ((out.length, l, r, l + r, f))
          words = words.toSeq.map { case (syms, cnt) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            for (x <- syms) {
              if (acc.nonEmpty && acc.last == l && x == r)
                acc(acc.length - 1) = l + r
              else acc += x
            }
            acc.toVector -> cnt
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        case _ => stop = true
      }
    }
    out.toSeq
  }

  test("BPE trainer matches the sequential reference exactly (incl. checkpoint path)") {
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = bpeReference(texts, numMerges = 20, minFrequency = 2L)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // driverMergeMaxWords = 0 forces the DISTRIBUTED loop;
    // checkpointEvery = 3 forces several lineage truncations mid-train
    val got = graft.llm.Bpe.train(docs, "text", numMerges = 20,
        minFrequency = 2L, checkpointEvery = 3, driverMergeMaxWords = 0)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === want)
    assert(got.length === 20)
    // every localCheckpoint the merge loop pinned is released again
    assert(spark.sparkContext.getPersistentRDDs.keySet === before)
    // the default (driver-local merge phase) is bit-identical
    val viaDriver = graft.llm.Bpe.train(docs, "text", numMerges = 20,
        minFrequency = 2L)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(viaDriver === want)
  }

  test("BPE driver-local merge bookkeeping matches the reference on random corpora") {
    // the incremental pair-count/posting-list maintenance is the risky code:
    // fuzz it pure-driver against the quadratic re-count reference
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val alphabet = "abcde".take(2 + rng.nextInt(4))
      val texts = (1 to 30 + rng.nextInt(50)).map { _ =>
        (1 to 1 + rng.nextInt(6)).map { _ =>
          (1 to 1 + rng.nextInt(7)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val nm = 1 + rng.nextInt(30)
      val mf = 1L + rng.nextInt(3)
      val want = bpeReference(texts, nm, mf)
      val wordMap = texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val syms = wordMap.map { case (w, _) =>
        w.toCharArray.map(_.toString) :+ "</w>" }.toArray
      val cnts = wordMap.map(_._2).toArray
      val got = graft.llm.Bpe.driverMerges(syms, cnts, nm, mf)
      assert(got === want, s"trial $trial over '$alphabet' (m=$nm, f=$mf)")
    }
  }

  test("BPE distributed reroots delete superseded reliable-checkpoint files") {
    val cpDir = java.nio.file.Files.createTempDirectory("graft-bpe-cp-")
    spark.sparkContext.setCheckpointDir(cpDir.toString)
    val got = graft.llm.Bpe.train(docs, "text", numMerges = 7,
        minFrequency = 2L, checkpointEvery = 2, driverMergeMaxWords = 0)
      .count()
    assert(got === 7L)
    // every reroot's word-table snapshot was deleted once superseded (and
    // the final one on return): no rdd-* payload dirs may remain
    val leftover = java.nio.file.Files.walk(cpDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("rdd-")).toSeq
    assert(leftover.isEmpty, s"leaked checkpoint files: $leftover")
  }

  test("BPE encode lowercases locale-independently (Turkish dotted-i pin)") {
    import spark.implicits._
    val corpus = Seq("TITLE title Title IIII").toDF("text")
    val merges = graft.llm.Bpe.collectMerges(
      graft.llm.Bpe.train(corpus, "text", numMerges = 5, minFrequency = 1L))
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      val enc = Seq("TITLE").toDF("text")
        .select(graft.llm.Bpe.encode(col("text"), merges).as("e"))
        .head().getSeq[String](0)
      // under an unpinned toLowerCase, tr_TR maps I -> dotless ı and the
      // trained symbols stop matching; Locale.ROOT reproduces train-time
      // tokenization (Spark's locale-independent lower())
      assert(enc.mkString === "title</w>", enc)
    } finally java.util.Locale.setDefault(prev)
  }

  test("BPE mergePair is greedy-leftmost non-overlapping") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("a", "b", "a", "b"), "a", "b", Seq("ab", "ab")),
      (Seq("x", "a", "b", "y"), "a", "b", Seq("x", "ab", "y")),
      (Seq("a", "b"), "b", "a", Seq("a", "b")))
    for ((syms, l, r, want) <- cases) {
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(graft.llm.Bpe.mergePair(col("syms"), l, r).as("m"))
        .head().getSeq[String](0)
      assert(got === want, s"merge $syms by ($l,$r)")
    }
  }

  test("BPE encode: parity with the distributed mergePair fold and a reference encoder") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val mergesDf = graft.llm.Bpe.train(docs, "text", numMerges = 15)
      val pairs = graft.llm.Bpe.collectMerges(mergesDf)
      assert(pairs.length === 15)
      // cross-implementation check: the codegen'd expression vs the
      // distributed column fold the trainer itself uses, word by word
      val words = docs.select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "").distinct().limit(200)
      var syms: org.apache.spark.sql.Column =
        array_append(filter(split(col("w"), ""), s => s =!= ""), lit("</w>"))
      for ((l, r) <- pairs) syms = graft.llm.Bpe.mergePair(syms, l, r)
      val mismatches = words
        .select(col("w"), syms.as("fold"),
          graft.llm.Bpe.encode(col("w"), pairs).as("enc"))
        .filter(col("fold") =!= col("enc")).count()
      assert(mismatches === 0L)
      // sequential reference encoder on a handful of words
      def refEncode(word: String): Seq[String] = {
        var s = word.toCharArray.map(_.toString).toVector :+ "</w>"
        for ((l, r) <- pairs) {
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- s) {
            if (acc.nonEmpty && acc.last == l && x == r)
              acc(acc.length - 1) = l + r
            else acc += x
          }
          s = acc.toVector
        }
        s
      }
      val sample = words.limit(20).collect().map(_.getString(0))
      val enc = Seq(sample.mkString(" ")).toDF("text")
        .select(graft.llm.Bpe.encode(col("text"), pairs).as("t"))
        .head().getSeq[String](0)
      assert(enc === sample.toSeq.flatMap(refEncode))
      // reconstruction: joining a word's symbols reproduces word + </w>
      assert(refEncode("training").mkString === "training</w>")
      // null in → null out; doubled spaces emit nothing
      val edge = Seq(Some("a  b"), None).toDF("text")
        .select(graft.llm.Bpe.encode(col("text"), pairs).as("t")).collect()
      assert(edge.exists(r => r.isNullAt(0)))
      val ab = edge.find(!_.isNullAt(0)).get.getSeq[String](0)
      assert(ab === refEncode("a") ++ refEncode("b"))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("BPE early-stops when the best pair is below minFrequency") {
    import spark.implicits._
    val tiny = Seq("ab ab", "cd").toDF("text")
    // "a b" occurs twice; everything else at most twice too — with
    // minFrequency = 3 nothing qualifies
    val none = graft.llm.Bpe.train(tiny, "text", numMerges = 10,
      minFrequency = 3L)
    assert(none.count() === 0L)
    val some = graft.llm.Bpe.train(tiny, "text", numMerges = 10,
      minFrequency = 2L)
    assert(some.count() > 0L)
  }

  test("gopherRules: each rule trips on its adversarial document, good doc passes") {
    import spark.implicits._
    val filler = (1 to 60).map(i => "the quality of document " +
      "number item " + i).mkString(" ")          // long, stopword-rich, alpha
    val cases = Seq(
      ("good", filler),
      ("short", "the of and too short"),
      ("symbols", (1 to 60).map(_ => "woo### the of...").mkString(" ")),
      ("bullets", (1 to 60).map(i => s"- the bullet of item $i").mkString("\n")),
      ("ellipsis", (1 to 60).map(i => s"the trailing of thought $i...").mkString("\n")),
      ("numeric", (1 to 60).map(i => s"$i 42 7 ${i * 3}").mkString(" ") + " the of"),
      ("nostops", (1 to 60).map(i => s"lorem ipsum dolor amet$i").mkString(" ")))
      .toDF("name", "text")
    val g = cases.select(col("name"),
        graft.llm.TextOps.gopherRules(col("text")).as("g"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    assert(g("good").getAs[Boolean]("passes"))
    assert(!g("short").getAs[Boolean]("passes") &&
      g("short").getAs[Int]("n_words") < 50)
    assert(!g("symbols").getAs[Boolean]("passes") &&
      g("symbols").getAs[Double]("symbol_ratio") > 0.1)
    assert(!g("bullets").getAs[Boolean]("passes") &&
      g("bullets").getAs[Double]("bullet_line_ratio") > 0.9)
    assert(!g("ellipsis").getAs[Boolean]("passes") &&
      g("ellipsis").getAs[Double]("ellipsis_line_ratio") > 0.3)
    assert(!g("numeric").getAs[Boolean]("passes") &&
      g("numeric").getAs[Double]("alpha_word_ratio") < 0.8)
    assert(!g("nostops").getAs[Boolean]("passes") &&
      g("nostops").getAs[Int]("stopword_hits") < 2)
    // empty text: guarded divisions, word-count rule fails, no NaN/null
    val e = Seq("").toDF("text")
      .select(graft.llm.TextOps.gopherRules(col("text")).as("g"))
      .head().getStruct(0)
    assert(!e.getAs[Boolean]("passes") && e.getAs[Int]("n_words") === 0)
    assert(!e.getAs[Double]("mean_word_len").isNaN)
  }

  test("contaminationReport: per-benchmark counts, zero-overlap and short docs report") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely unrelated corpus text about databases and storage"),
      (3L, "the quick brown fox runs far away tonight")
    ).toDF("doc_id", "text")
    val evals = Seq(
      // bA doc 10 shares "the quick brown"/"quick brown fox" with docs 1,3
      ("bA", 10L, "the quick brown fox is a pangram staple"),
      ("bA", 11L, "no overlap whatsoever here right now friends"),
      // bB is untouched by the corpus
      ("bB", 20L, "completely different benchmark content lives here"),
      // bC's only doc is too short to form a 3-gram
      ("bC", 30L, "two words")
    ).toDF("bench", "eval_id", "text")
    val rep = graft.llm.Dedup
      .contaminationReport(corpus, "doc_id", "text", evals, "bench", "eval_id", "text", 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rep("bA") === ((2L, 1L, 2L, 2L, 0.5)))  // 1 of 2 docs, via corpus 1+3, 2 shingles
    assert(rep("bB") === ((1L, 0L, 0L, 0L, 0.0)))
    assert(rep("bC") === ((1L, 0L, 0L, 0L, 0.0)))
  }

  test("corpusReport: planted whitespace-duplicates show in the dup rate") {
    import spark.implicits._
    val df = Seq((1L, "a b", "en", "s"), (2L, "a  b", "en", "s"),
      (3L, "c", "fr", "t")).toDF("id", "text", "lang", "source")
    val r = graft.llm.TextOps.corpusReport(df, "text", "lang", "source").head()
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_langs") === 2L)
    assert(r.getAs[Long]("n_sources") === 2L)
    // docs 1 and 2 normalize to the same fingerprint: 1 − 2/3
    assert(r.getAs[Double]("exact_dup_rate") === 0.3333)
  }

  test("BM25: hand-computed scores, term-match doc ranks first, bounded output") {
    import spark.implicits._
    val corp = Seq(
      (1L, "apple banana apple"),      // tf(apple)=2, dl=3
      (2L, "banana cherry"),
      (3L, "durian durian durian")).toDF("id", "text")
    val q = Seq((10L, "apple")).toDF("qid", "qtext")
    val got = graft.llm.TextOps.bm25(corp, "id", "text", q, "qid", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // only doc 1 contains "apple": one result row
    assert(got.length === 1)
    val (qid, rank, docId, score) = got.head
    assert(qid === 10L && rank === 1 && docId === 1L)
    // idf = ln(1 + (3-1+0.5)/(1+0.5)) = ln(8/3); avgdl = (3+2+3)/3 = 8/3
    // tfTerm = 2*2.2/(2 + 1.2*(0.25 + 0.75*3/(8/3)))
    val idf = math.log(1 + 2.5 / 1.5)
    val tfTerm = 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / (8.0 / 3)))
    assert(score === BigDecimal(idf * tfTerm)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // multi-term query: a doc with both terms outranks single-term docs
    val q2 = Seq((20L, "banana cherry")).toDF("qid", "qtext")
    val top = graft.llm.TextOps.bm25(corp, "id", "text", q2, "qid", "qtext", k = 5)
      .filter(col("rank") === 1).head()
    assert(top.getLong(2) === 2L)
  }

  test("ngram LM: English target scores English docs higher; hand-computed backoff") {
    import spark.implicits._
    val scored = graft.llm.TextOps.ngramLmScore(
      docs, "doc_id", "text", docs.filter(col("lang") === "en"), "text")
    val byLang = scored.filter(col("lm_logprob").isNotNull)
      .groupBy("lang").agg(avg("lm_logprob").as("lp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max,
      s"en should dominate under an en-trained LM: $byLang")
    // hand-computed: target "a b a b", corpus "a b" and "b b" and "x"
    // target: uni a:2 b:2, N=4 V=2; bi "a b":2, "b a":1
    val tgt = Seq(Tuple1("a b a b")).toDF("text")
    val corp = Seq((1L, "a b"), (2L, "b b"), (3L, "x")).toDF("id", "text")
    val got = graft.llm.TextOps.ngramLmScore(corp, "id", "text", tgt, "text")
      .select("id", "lm_logprob").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // "a b": S(b|a) = c(ab)/c(a) = 2/2 = 1 → ln 1 = 0
    assert(got(1L) === Some(0.0))
    // "b b": unseen bigram → backoff 0.4·(c(b)+1)/(N+V) = 0.4·3/6 = 0.2;
    // ln 0.2 = −1.6094 at 4 decimals
    assert(got(2L) === Some(-1.6094))
    // single-token doc: no bigrams → null
    assert(got(3L) === None)
  }

  test("perplexityBuckets: monotone in score, unscorable docs land in the tail") {
    import spark.implicits._
    val tgt = Seq(Tuple1("the cat sat on the mat"),
      Tuple1("the dog sat on the rug")).toDF("text")
    val corp = Seq(
      (1L, "the cat sat on the mat"), // all bigrams seen → best score
      (2L, "the dog sat on the mat"), // mostly seen
      (3L, "cat dog the on sat"),     // seen words, unseen bigrams
      (4L, "zz qq ww ee rr tt"),      // full backoff on unseen words → worst
      (5L, "one"),                    // single token → null score
      (6L, "the cat sat on the rug")
    ).toDF("id", "text")
    def run(n: Int) = graft.llm.TextOps
      .perplexityBuckets(corp, "id", "text", tgt, "text", nBuckets = n,
        exact = true)
      .select("id", "lm_logprob", "ppl_bucket").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getInt(2)))
    val rows = run(3)
    val byId = rows.map(t => t._1 -> t).toMap
    // unscorable doc: null score, tail bucket
    assert(byId(5L)._2.isEmpty && byId(5L)._3 === 3)
    // the head holds the best score, the tail the worst; bucket never
    // improves as the score drops
    val scored = rows.filter(_._2.nonEmpty).sortBy(-_._2.get)
    assert(scored.head._1 === 1L && scored.head._3 === 1)
    assert(scored.last._1 === 4L && scored.last._3 === 3)
    assert(scored.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      scored.mkString(", "))
    assert(rows.forall(t => t._3 >= 1 && t._3 <= 3))
    // deterministic
    assert(run(3).toSeq === rows.toSeq)
    // two-bucket variant: only head/tail labels appear
    assert(run(2).map(_._3).toSet.subsetOf(Set(1, 2)))
    // persistIntermediate: identical rows, no storage blocks left pinned
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val persisted = graft.llm.TextOps
      .perplexityBuckets(corp, "id", "text", tgt, "text", nBuckets = 3,
        exact = true, persistIntermediate = true)
      .select("id", "lm_logprob", "ppl_bucket").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getInt(2)))
    assert(persisted.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
    // only the re-rooted RESULT may remain pinned; the scores intermediate
    // must have been released (at most one new block set)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size <= 1)
  }

  test("DSIR importance: target-language docs score higher; gumbel variant deterministic") {
    import spark.implicits._
    val scored = graft.llm.Sampling.importanceScores(
      docs, "doc_id", "text", docs.filter(col("lang") === "fr"), "text")
    val byLang = scored.groupBy("lang").agg(avg("importance").as("imp"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the French target pulls French docs to the top of the ranking
    assert(byLang("fr") > byLang.filter(_._1 != "fr").values.max,
      s"fr should dominate: $byLang")
    // empty/unknown-token docs: importance defined (0.0), no crash
    val edge = graft.llm.Sampling.importanceScores(
        Seq((1L, ""), (2L, "la le et")).toDF("id", "text"), "id", "text",
        Seq(Tuple1("la le les")).toDF("text"), "text")
      .select("id", "importance").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(edge(1L) === 0.0)
    // gumbel selection: deterministic across runs, differs from greedy at
    // high temperature
    def sel(t: Double) = graft.llm.Sampling.selectByImportance(
        docs, "doc_id", "text", docs.filter(col("lang") === "fr"), "text",
        k = 20, gumbelTemperature = t, seed = 9L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel(50.0) === sel(50.0))
    assert(sel(0.0) !== sel(500.0))
  }

  test("tokenBudgetMix: randomized corpora match the window oracle (5 seeds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(404)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(300)
      val nDoms = 1 + rnd.nextInt(5)
      val budget = 20L + rnd.nextInt(500)
      val seed = rnd.nextLong()
      val buckets = Seq(1, 4, 64)(rnd.nextInt(3))
      val rows = (1L to n.toLong).map(i =>
        (i, "d" + rnd.nextInt(nDoms), rnd.nextInt(9) + 1))
      val df = rows.toDF("id", "dom", "tok")
      val got = graft.llm.Sampling
        .tokenBudgetMix(df, "id", "dom", col("tok"), budget, seed, buckets)
        .select("id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
        .orderBy(graft.llm.Sampling.shuffleBits(col("id"), seed), col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val want = df.withColumn("cum_tokens", sum(col("tok").cast("long")).over(w))
        .filter(col("cum_tokens") <= budget)
        .select("id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want,
        s"trial $trial: n=$n doms=$nDoms budget=$budget buckets=$buckets")
      // per-domain budgets over the same corpus: a random subset of domains
      // gets its own budget, the rest fall to the uniform one as default;
      // the oracle is the same window with a per-domain CASE threshold.
      // broadcastOffsets randomized so the AQE-decided join path is fuzzed
      // with the forced-broadcast one
      val budgets = (0 until nDoms).filter(_ => rnd.nextBoolean())
        .map(dd => ("d" + dd) -> rnd.nextInt(400).toLong).toMap
      val gotDom = graft.llm.Sampling
        .tokenBudgetMix(df, "id", "dom", col("tok"), budgets, budget, seed,
          buckets, broadcastOffsets = rnd.nextBoolean())
        .select("id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val budgetExpr = budgets.foldLeft(lit(budget)) { case (acc, (k, v)) =>
        when(col("dom") === lit(k), lit(v)).otherwise(acc) }
      val wantDom = df
        .withColumn("cum_tokens", sum(col("tok").cast("long")).over(w))
        .filter(col("cum_tokens") <= budgetExpr)
        .select("id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotDom === wantDom,
        s"trial $trial (per-domain): budgets=$budgets default=$budget buckets=$buckets")
    }
  }

  test("tokenBudgetMix per-domain: zero budgets, null domains, unlisted default") {
    import spark.implicits._
    val df = (1L to 200L)
      .map(i => (i, if (i % 4 == 0) null else "d" + (i % 3), (i % 5 + 1).toInt))
      .toDF("id", "dom", "tok")
    val out = graft.llm.Sampling.tokenBudgetMix(df, "id", "dom", col("tok"),
      budgets = Map("d0" -> 0L, "d1" -> 120L), defaultBudget = 60L)
    val byDom = out.groupBy("dom").agg(max("cum_tokens").as("m"), count(lit(1)))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // d0 budgeted to zero: nothing admitted
    assert(!byDom.contains(Some("d0")))
    // d1 admits up to its own budget; d2 and null fall to the default
    assert(byDom(Some("d1")) <= 120L && byDom(Some("d1")) > 60L)
    assert(byDom(Some("d2")) <= 60L)
    assert(byDom(None) <= 60L && byDom(None) > 0L)
  }

  test("sampleByCluster: T=1 identity, composes with temperature sampler, deterministic") {
    val out = graft.llm.Sampling.sampleByCluster(embs, "vec_id", "embedding",
      nLists = 4, temperature = 1.0, seed = 11L)
    // T = 1: every cluster's rate is exactly 1 → one copy of every row
    assert(out.count() === embs.count())
    assert(out.columns.contains("cluster") && out.columns.contains("copy"))
    // compositional parity: same as clustering first, then the temperature
    // sampler over the cluster domain
    val cents = graft.llm.Similarity.ivfFit(embs, "vec_id", "embedding", 4, 2)
    val clustered = embs.withColumn("cluster",
      graft.llm.Similarity.nearestList(col("embedding"), cents))
    val direct = graft.llm.Sampling.sampleByTemperature(
        clustered, "vec_id", "cluster", 3.0, seed = 11L)
      .select("vec_id", "cluster", "copy").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val composed = graft.llm.Sampling.sampleByCluster(embs, "vec_id", "embedding",
        nLists = 4, temperature = 3.0, seed = 11L)
      .select("vec_id", "cluster", "copy").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(composed === direct)
    assert(composed.map(_._2).size > 1) // more than one topic survives
  }

  test("tokenBudgetMix: matches the single-window oracle on a skewed corpus") {
    import spark.implicits._
    // domain "big" holds 90% of the rows — exactly the shape whose
    // single-window form degenerates to one straggler sort at scale
    val df = (1L to 400L)
      .map(i => (i, if (i % 10 == 0) "small" else "big", (i % 7 + 1).toInt))
      .toDF("id", "dom", "tok")
    val got = graft.llm.Sampling
      .tokenBudgetMix(df, "id", "dom", col("tok"), budgetTokens = 300L,
        seed = 3L, rangeBuckets = 8)
      .select("id", "dom", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("dom")
      .orderBy(graft.llm.Sampling.shuffleBits(col("id"), 3L), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("cum_tokens", sum(col("tok").cast("long")).over(w))
      .filter(col("cum_tokens") <= 300L)
      .select("id", "dom", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < 400)      // the budget truncates
    assert(got.exists(_._2 == "big") && got.exists(_._2 == "small"))
    // a budget past the corpus admits everything, in any bucketing
    val all = graft.llm.Sampling
      .tokenBudgetMix(df, "id", "dom", col("tok"), budgetTokens = 1000000L,
        seed = 3L, rangeBuckets = 1)
    assert(all.count() === 400L)
    // null domains form their own admission group (null-safe join)
    val withNull = df.withColumn("dom",
      when(col("id") % 3 === 0, lit(null: String)).otherwise(col("dom")))
    val nullKept = graft.llm.Sampling
      .tokenBudgetMix(withNull, "id", "dom", col("tok"), budgetTokens = 50L,
        seed = 3L, rangeBuckets = 4)
      .filter(col("dom").isNull).count()
    assert(nullKept > 0)
  }

  test("embedding near-dup skew guard: mode-collapsed list splits, recall holds") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(1234)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // ids 0..3 (the k-means init rows): four diverse anchors, so the fit
    // starts from distinct directions and the mode cluster lands in ONE list
    val anchors = (0 until 4).map { i =>
      (i.toLong, unit(Array.tabulate(dim)(d => if (d == i * 4) 1.0 else 0.01)))
    }
    // a broad mode cone around axis 0: everything assigns to the same list
    // but members are NOT near-dups of each other (pairwise cosine ≈ 0.3)
    val u = Array.tabulate(dim)(d => if (d == 0) 1.0 else 0.0)
    val cone = (0 until 450).map { i =>
      (10L + i, unit(u.map(_ + rnd.nextGaussian() * 0.35)))
    }
    // planted strong pairs inside the cone (cosine ≈ 0.9999)
    val planted = (0 until 30).flatMap { i =>
      val base = unit(u.map(_ + rnd.nextGaussian() * 0.35))
      Seq((1000L + 2 * i, base),
        (1001L + 2 * i, unit(base.map(_ + rnd.nextGaussian() * 0.003))))
    }
    val df = (anchors ++ cone ++ planted).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 30, s"corpus must contain the planted pairs, got ${exact.size}")
    val guarded = Dedup.embeddingNearDupPairsBucketed(df, "vec_id", "embedding",
        0.98, nLists = 4, assignTo = 2, maxListSize = 50)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification is exact cosine, so the guard can never invent a pair
    assert(guarded.subsetOf(exact), s"false pairs: ${guarded -- exact}")
    val recall = exact.count(guarded.contains).toDouble / exact.size
    assert(recall >= 0.9, s"skew-guarded recall $recall of ${exact.size} pairs")
    // the bound itself: rebuild the guard's sub-bucketing and check the
    // straggler list really split — no candidate cell near the raw list size
    val cents = Similarity.ivfFit(df, "vec_id", "embedding", 4, 2)
    val assigned = df.select(col("vec_id").as("id"), col("embedding").as("v"),
      explode(Similarity.nearestLists(col("embedding"), cents, 2)).as("list"))
    val sizes = assigned.groupBy("list").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hottest = sizes.values.max
    assert(hottest > 300, s"corpus must mode-collapse one list, sizes=$sizes")
    val plan = Dedup.skewPlanes(sizes, 50)
    assert(plan.nonEmpty && plan.values.max >= 3, s"guard must trigger, plan=$plan")
    val (keyed, _) = Dedup.subBucketed(assigned, plan, cents)
    val cells = keyed.groupBy("list", "_sub").count()
      .collect().map(_.getLong(2))
    assert(cells.max <= hottest / 2,
      s"largest cell ${cells.max} did not split the $hottest-row list")
    val candidateCost = cells.map(c => c * c).sum
    assert(candidateCost <= hottest * hottest / 4,
      s"candidate cost $candidateCost not bounded vs unsplit ${hottest * hottest}")
  }

  test("repeated-passage removal strips corpus boilerplate, keeps document order") {
    import spark.implicits._
    val footer = "subscribe to our newsletter for updates" // 6-token boilerplate
    val df = Seq(
      (1L, s"unique words about gardening here $footer"),
      (2L, s"different unique content on sailing $footer"),
      (3L, s"third document with its own body $footer"),
      (4L, footer), // all boilerplate → drops out entirely
      (5L, "a document with no repeated passages at all whatsoever")).toDF("doc_id", "text")
    val cleaned = TextOps.dropRepeatedPassages(df, "doc_id", "text",
        windowTokens = 6, maxOccurrences = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // docs 1/2 have 5 own tokens, so window 1 = own+"subscribe" (unique,
    // kept) and window 2 = "to our newsletter for updates" (shared by
    // both → dropped); doc 3 has 6 own tokens, so its window 2 is the
    // full footer — shared with doc 4's only window → both dropped
    assert(cleaned(1L) === "unique words about gardening here subscribe")
    assert(cleaned(2L) === "different unique content on sailing subscribe")
    assert(cleaned(3L) === "third document with its own body")
    assert(!cleaned.contains(4L))
    assert(cleaned(5L) === "a document with no repeated passages at all whatsoever")
    // persist knob: identical result, nothing pinned
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-pd-cp-").toString)
    def pinnedRdds(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = pinnedRdds()
    val persisted = TextOps.dropRepeatedPassages(df, "doc_id", "text", 6, 1,
        persistIntermediate = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(persisted === cleaned)
    assert(pinnedRdds() === before, s"leaked: ${pinnedRdds() -- before}")
  }

  test("vocab top-k: counts exact, deterministic tie order, k cap") {
    import spark.implicits._
    val df = Seq(
      (1L, "b a a c"), (2L, "a b c c"), (3L, "d b a")).toDF("doc_id", "text")
    // a:4 b:3 c:3 d:1 — ties (b,c) break lexicographically
    val got = TextOps.vocabTopK(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 4L), ("b", 3L), ("c", 3L)))
    // full-k equals a plain groupBy count on the real corpus
    val full = TextOps.vocabTopK(docs, "text", 1000000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oracle = docs.select(explode(split(lower(col("text")), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full === oracle)
  }

  test("tfidf top terms: hand-computed scores, per-doc cap, rounded-rank determinism") {
    import spark.implicits._
    // doc1: a a b; doc2: b c  =>  N=2, df(a)=1 df(b)=2 df(c)=1
    // tfidf(doc1,a)=2*ln2=1.3863; (doc1,b)=1*ln1=0; (doc2,c)=ln2=0.6931
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(got === Seq(
      (1L, 1, "a", 1.3863), (1L, 2, "b", 0.0),
      (2L, 1, "c", 0.6931), (2L, 2, "b", 0.0)))
    // per-doc cap holds on the real corpus and ranks are dense 1..k
    val caps = TextOps.tfidfTopTerms(docs, "doc_id", "text", 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .agg(max("n"), max("mx")).head()
    assert(caps.getLong(0) <= 3 && caps.getInt(1) <= 3)
    // persistIntermediate: identical rows, zero storage blocks left pinned
    // (reliable checkpoint dir, same cluster configuration as fuzzyDedup's
    // guarantee — local-checkpoint mode keeps the result's own blocks alive)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-tfidf-cp-").toString)
    def pinnedRdds(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = pinnedRdds()
    val persisted = TextOps.tfidfTopTerms(df, "doc_id", "text", 2,
      persistIntermediate = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(persisted.toSeq === got.toSeq)
    assert(pinnedRdds() === before, s"leaked: ${pinnedRdds() -- before}")
  }

  test("tfidf persist knob: capacity guard refuses a LOCAL checkpoint past the cap") {
    import spark.implicits._
    val df = docs.limit(100)
    // no reliable dir → the local-checkpoint path, where the 8 GiB-JVM OOM
    // lives (BASELINE.md round-10) — the guard must refuse past the cap...
    val savedDir = spark.sparkContext.getCheckpointDir
    org.apache.spark.sql.graft.ColumnBridge.clearCheckpointDir(spark.sparkContext)
    try {
      val refusal = intercept[IllegalArgumentException] {
        TextOps.tfidfTopTerms(df, "doc_id", "text", 2,
          persistIntermediate = true, persistMaxEstRows = 10L)
      }
      assert(refusal.getMessage.contains("checkpoint dir"), refusal.getMessage)
      // ...and under the cap the knob works as before
      assert(TextOps.tfidfTopTerms(df, "doc_id", "text", 2,
        persistIntermediate = true).count() > 0)
    } finally savedDir.foreach(spark.sparkContext.setCheckpointDir)
    // a reliable dir spills to storage: NOT capped, any estimate allowed
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-tfidf-cap-").toString)
    assert(TextOps.tfidfTopTerms(df, "doc_id", "text", 2,
      persistIntermediate = true, persistMaxEstRows = 10L).count() > 0)
  }
}
