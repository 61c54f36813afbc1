package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / bpeish counts") {
    val df = Seq("hello, world!  two  spaces").toDF("text")
      .select(size(TextAnalysis.tokens($"text")).as("n"),
        TextAnalysis.bpeishTokenCount($"text").as("b"))
    val r = df.head()
    assert(r.getInt(0) == 4)           // hello, world! two spaces
    assert(r.getInt(1) == 6)           // hello , world ! two spaces
    // Java \s includes vertical tab U+000B (RE2's does not — the DuckDB
    // oracles emulate it with [\s\x0b], r17 divergence class #3): the
    // ENGINE side must split on it and not emit it as a bpeish token
    val vt = Seq("a\u000Bb\u000B\u000Bc").toDF("text")
      .select(size(TextAnalysis.tokens($"text")).as("n"),
        TextAnalysis.bpeishTokenCount($"text").as("b")).head()
    assert(vt.getInt(0) == 3, s"VT token count ${vt.getInt(0)}")
    assert(vt.getInt(1) == 3, s"VT bpeish count ${vt.getInt(1)}")
  }

  test("language ID: script detection + stopword vote") {
    // NOTE: the testdata documents table carries a `lang` label but its
    // text is uniformly English-like synthetic prose, so accuracy-vs-label
    // is untestable there; assert the mechanism on real-language samples.
    val samples = Seq(
      ("zh", "这是一个中文文档的例子 其中包含很多汉字 用于测试语言识别"),
      ("ja", "これは日本語のテキストです ひらがなとカタカナを含みます"),
      ("ru", "Это пример русского текста для определения языка"),
      ("en", "the quick brown fox is on the hill and it was a fine day for all of us"),
      ("de", "der schnelle braune fuchs ist auf dem hügel und es war ein schöner tag für alle"),
      ("fr", "le renard brun est sur la colline et il était une belle journée pour tous les gens"),
      ("es", "el zorro marrón está en la colina y era un buen día para todos los que estaban"),
      ("pt", "a raposa marrom está na colina e era um bom dia para todos os que estavam"),
      ("it", "la volpe marrone è sulla collina ed era una bella giornata per tutti noi"),
      ("nl", "de snelle bruine vos is op de heuvel en het was een mooie dag voor ons allemaal"),
      // the four r16 families (the r15 probe's measured out-of-set leak)
      ("sv", "jag tror att det är en bra dag och vi ska gå ut i parken med hunden"),
      ("pl", "myślę że to jest bardzo dobry dzień i nie chcę po prostu siedzieć w domu"),
      ("tr", "bence bu çok güzel bir gün ve biz parka gitmek için hazırız ama hava soğuk"),
      ("ro", "cred că este o zi bună și nu vreau să stau în casă pentru că vremea este frumoasă")
    ).toDF("expected", "text")
    val got = samples
      .withColumn("_lm", TextAnalysis.langIdWithMargin($"text"))
      .select($"expected", $"_lm.lang".as("pred"), $"_lm.lang_margin".as("m"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got.foreach { case (exp, pred, margin) =>
      assert(pred == exp, s"expected $exp got $pred")
      // every sample is unambiguous: real evidence for the winner beyond
      // the runner-up (script branches report the script ratio itself)
      assert(margin > 0.0, s"$exp predicted with zero margin")
    }
    // engineered EXACT tie: every token sits in both the en and nl
    // stopword lists (en∩nl = {of, in, is, was}), so both ratios are
    // 1.0 — the priority tie-break must pick en (list order), with a
    // zero margin exposing the ambiguity
    val tie = Seq("of in is was").toDF("text")
      .select(TextAnalysis.langIdWithMargin($"text").as("_lm"))
      .select($"_lm.lang", $"_lm.lang_margin").head()
    assert(tie.getString(0) == "en", s"tie broke to ${tie.getString(0)}")
    assert(tie.getDouble(1) == 0.0, s"tie margin ${tie.getDouble(1)}")
    // on the synthetic English-soup corpus, predictions are en/unknown
    val preds = graft.Tables(spark, sfDir).documents
      .select(TextAnalysis.langIdCol($"text").as("p")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "unknown")))
  }

  test("language ID: Turkish dotted İ at sentence starts still votes tr") {
    // İ (U+0130) lowercases under Unicode default casing to i +
    // COMBINING U+0307, so without the tr-family combining-dot strip
    // the capitalized function words below contributed ZERO tr votes
    // (r16 advisory; DuckDB LOWER agrees, p09's oracle mirrors the
    // strip)
    val lowerT = "için ile bence bu çok güzel ama hava soğuk değil"
    val capT = "İçin İle bence bu çok güzel ama hava soğuk değil"
    val got = Seq(lowerT, capT).toDF("text")
      .select(TextAnalysis.langIdWithMargin($"text").as("_lm"))
      .select($"_lm.lang", $"_lm.lang_margin")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.forall(_._1 == "tr"), got.mkString(","))
    // the strip makes İçin/İle equal to için/ile — identical vote
    // ratios, hence identical margins
    assert(got(0)._2 == got(1)._2, got.mkString(","))
    assert(got(0)._2 > 0.0, got.mkString(","))
    // and the strip is tr-SCOPED: a standalone "İ" must not collapse
    // to a bare "i" Italian vote (ItStopwords carries "i")
    val solo = Seq("İ İ İ").toDF("text")
      .select(TextAnalysis.langIdCol($"text")).head().getString(0)
    assert(solo == "unknown", s"standalone İ voted $solo")
  }

  test("language ID fuzz: closed label set, margin bounded, never null") {
    // the text-quality verb's histogram tripwire ("other" warns loudly)
    // assumes langIdWithMargin's label set is CLOSED over arbitrary
    // input; pin that, plus margin ∈ [0,1] and non-nullness, under a
    // seeded unicode fuzz (mixed scripts, combining marks, İ/Σ special
    // casing, emoji, whitespace runs, empties)
    val labels = Set("en", "de", "fr", "es", "pt", "it", "nl", "sv",
      "pl", "tr", "ro", "ja", "zh", "ko", "ru", "ar", "unknown")
    val rng = new scala.util.Random(20260816L)
    val alphabets = Seq(
      "abcdefghij ", "äöüßéàçñ ", "İıŞşĞğ ", "ΑΒΓΔΣΟ ς ",
      "あいうえおカキク ", "汉字文档测试 ", "한국어텍스트 ", "привет мир ",
      "مرحبا بالعالم ", "̇́̈", "🙂🚀💡 ", "0123456789.,!? ",
      "the of und le el ")
    val texts = (1 to 400).map { _ =>
      val n = rng.nextInt(120)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        val a = alphabets(rng.nextInt(alphabets.length))
        sb.append(a.charAt(rng.nextInt(a.length)))
      }
      sb.toString
    } ++ Seq("", "   ", "\t\n", "İ", "Σ", "ß")
    val rows = texts.toDF("text")
      .select(TextAnalysis.langIdWithMargin($"text").as("_lm"))
      .select($"_lm.lang", $"_lm.lang_margin").collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), s"null field in $r")
      val (lang, m) = (r.getString(0), r.getDouble(1))
      assert(labels.contains(lang), s"label '$lang' escaped the closed set")
      assert(m >= 0.0 && m <= 1.0 && !m.isNaN, s"margin $m out of [0,1]")
    }
    // the r18 single-pass vote must count exactly like its 11-traversal
    // differential twin on the same fuzz corpus (the twin is the
    // readable spelling of the semantics; VotePassProbe measures why
    // the single-pass form ships)
    val toks = TextAnalysis.tokens($"text")
    val diff = texts.toDF("text")
      .select(TextAnalysis.langVoteCounts(toks).as("one"),
        TextAnalysis.langVoteCountsMultiPass(toks).as("eleven"))
      .filter(not($"one" <=> $"eleven"))
    assert(diff.isEmpty, s"vote shapes diverged: ${diff.head(3).toSeq}")
  }

  test("word shingles") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextAnalysis.wordShingles(TextAnalysis.tokens($"text"), 3).as("sh"))
    val rows = df.collect().map(_.getAs[scala.collection.Seq[String]]("sh").toSeq)
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq("a b")) // shorter than k → single joined form
  }

  test("language ID: empty and null texts are unknown, not a script guess") {
    val df = Seq(Some(""), None, Some("   ")).toDF("text")
      .select(TextAnalysis.langIdCol($"text").as("p"))
    val preds = df.collect().map(_.getString(0)).toSeq
    // "" and null have no content; "   " has no tokens and no script
    assert(preds(0) == "unknown", s"empty text predicted ${preds(0)}")
    assert(preds(1) == "unknown", s"null text predicted ${preds(1)}")
    assert(preds(2) == "unknown", s"blank text predicted ${preds(2)}")
    // margins of no-evidence texts are 0.0, never null (a NULL margin
    // would poison downstream `lang_margin > x` quality filters)
    val margins = Seq(Some(""), None, Some("   "), Some("zzz qqq xxx"))
      .toDF("text")
      .select(TextAnalysis.langIdWithMargin($"text").getField("lang_margin"))
      .collect().map(r => (r.isNullAt(0), if (r.isNullAt(0)) 0.0 else r.getDouble(0)))
    margins.foreach { case (isNull, m) =>
      assert(!isNull && m == 0.0, s"no-evidence margin was ($isNull, $m)")
    }
  }

  test("fingerprint lowering follows Java full casing incl. Final_Sigma") {
    // The p10 oracle emulates Java String.toLowerCase in DuckDB SQL
    // (İ full mapping + the Final_Sigma context rule with its
    // case-ignorable skips) and tools/casing_parity_probe.py pins that
    // emulation against CPython, which implements the same Unicode
    // rule. This is the ENGINE half of the triangle: Spark's lower()
    // must itself produce the Python/Java-derived expected strings —
    // capital Σ lowers to ς only word-finally (skipping case-ignorables
    // like ' ’ : . and combining marks; uncased letters like 的 are not
    // cased context; Ⅰ ª ⓐ ARE), and a PRE-LOWERED word-final σ stays σ
    // (the r18 fuzz found the oracle's old post-LOWER fix flipping it).
    val cases = Seq(
      ("ΟΔΟΣ ΚΑΙ ΣΑ", "οδος και σα"),
      ("οδοσ οδος ς σ xσ", "οδοσ οδος ς σ xσ"),
      ("Α'Σ κάτι", "α'ς κάτι"),
      ("ΟΔΟΣ’ και", "οδος’ και"),
      ("ΟΣ: x", "ος: x"),
      ("ΟΣ. ΟΣ.Α", "ος. οσ.α"),
      ("ΟΣ, ΟΣ,Α", "ος, ος,α"),
      ("ΑΣ̈ ΑΣ̈Α", "ας̈ ασ̈α"),
      ("ΑΣ᾿Α ΑΣ᾿ ", "ασ᾿α ας᾿"),
      ("的Σ ΟΣ的", "的σ ος的"),
      ("ⅠΣ ªΣ ⓐΣ!", "ⅰς ªς ⓐς!"),
      ("İΣ Σİ", "i̇ς σi̇"),
      ("a\u000bΟΣ\u000bΟΣ", "a ος ος")) // VT: Java \s member
    val got = cases.map(_._1).toDF("text")
      .select(lower(trim(regexp_replace($"text", "\\s+", " "))))
      .collect().map(_.getString(0)).toSeq
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"Spark lower diverged from Java/Python full " +
        s"casing on ${in.map(c => f"\\u${c.toInt}%04x").mkString}: " +
        s"got '$g' want '$want'")
    }
  }

  test("fingerprint ignores leading/trailing whitespace of any kind") {
    val df = Seq("hello  world", "hello world\n", "\thello world ")
      .toDF("text").select(TextAnalysis.fingerprint($"text").as("f"))
    val fps = df.collect().map(_.getLong(0)).toSet
    assert(fps.size == 1, s"whitespace-trimmed variants split into $fps")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog yesterday"), // near dup
    (4L, "completely different text about spark distributed computing engines")
  ).toDF("doc_id", "text")

  test("exact dedup clusters and representative selection") {
    val clusters = Dedup.exactDupClusters(docs).collect()
    assert(clusters.length == 1)
    assert(clusters(0).getAs[Long]("n_copies") == 2)
    val kept = Dedup.exactDedup(docs).select($"doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L)) // min-id representative survives
  }

  test("minhash LSH finds near-dup pair, skips unrelated") {
    val pairs = Dedup.minhashCandidatePairs(docs, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 2L))) // exact dup always collides
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 1.0)
    assert(pairSet.contains((1L, 3L)) || pairSet.contains((2L, 3L))) // near dup
    assert(!pairSet.exists(p => p._2 == 4L && p._1 <= 3L) ||
      pairs.filter(p => p._2 == 4L).forall(_._3 < 0.3)) // unrelated low sim
  }

  test("MinHashSignature expression equals the relational explode+min-agg form, bit-for-bit") {
    // the r2-r11 plan shape, preserved verbatim as the differential twin
    def relationalSigs(d: org.apache.spark.sql.DataFrame, k: Int,
                       numHashes: Int): org.apache.spark.sql.DataFrame = {
      val exploded = d
        .select($"doc_id",
          explode(array_distinct(
            TextAnalysis.wordShingles(TextAnalysis.tokens($"text"), k))).as("_s"))
        .select($"doc_id",
          (conv(substring(md5($"_s"), 1, 12), 16, 10)).cast("long").as("_h1"),
          (conv(substring(md5($"_s"), 13, 12), 16, 10)).cast("long").as("_h2"))
      val aggs = (0 until numHashes).map(i =>
        min($"_h1" + lit(i.toLong) * $"_h2").as(s"_m$i"))
      exploded.groupBy($"doc_id")
        .agg(aggs.head, aggs.tail: _*)
        .select($"doc_id",
          array((0 until numHashes).map(i => col(s"_m$i")): _*).as("_sig"))
    }
    // adversarial texts: empty (→ NO shingles since r18), shorter than
    // k, exact duplicates, duplicate shingles inside one doc
    // (array_distinct on the twin, duplicate-insensitive min on the
    // expression), unicode, collapsible whitespace — plus the sf
    // documents table for volume
    // ids offset past the sf table's id space: a collision would make
    // the twin's groupBy MERGE two docs while the per-row expression
    // keeps them separate — a test artifact, not a semantics difference
    val weird = Seq(
      (9000100L, Some("")), (9000101L, Some("one")),
      (9000102L, Some("one two")),
      (9000103L, Some("a a a a a a a a")), // every shingle identical
      (9000104L, Some("héllo wörld ünïcode tokens again héllo wörld ünïcode")),
      (9000105L, Some("  spaced\tout\n\nwhitespace   forms  here  ")),
      (9000106L, None: Option[String]),   // null text: no shingles
      (9000107L, Some(" \t ")))     // whitespace-only: no shingles
      .toDF("doc_id", "text")
    val corpus = graft.Tables(spark, sfDir).documents
      .select($"doc_id", $"text").union(weird)
      .union(docs.select(($"doc_id" + 9000200L).as("doc_id"), $"text"))
    // r18 no-shingle semantics: the twin's explode emits NO row for an
    // empty/whitespace-only/null text (wordShingles → []/NULL), while
    // the per-row expression keeps the doc with the ALL-NULL signature
    // — both spell "no shingles, excluded from banding". The twin
    // equality therefore holds on the shingle-bearing docs, and every
    // doc the twin drops must be exactly an all-null-signature doc.
    Seq((3, 64), (2, 16), (5, 7)).foreach { case (k, n) =>
      val expected = relationalSigs(corpus, k, n).collect()
        .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
      val got = Dedup.minhashSignatures(corpus, "text", "doc_id", k, n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
      val noShingle = got.keySet -- expected.keySet
      assert(noShingle == Set(9000100L, 9000106L, 9000107L),
        s"no-shingle doc set diverged at k=$k n=$n: $noShingle")
      noShingle.foreach { id =>
        assert(got(id).forall(_ == null),
          s"no-shingle doc $id must carry the all-null signature at k=$k")
      }
      assert((expected.keySet -- got.keySet).isEmpty,
        s"expression dropped docs at k=$k n=$n")
      expected.foreach { case (id, sig) =>
        assert(got(id) == sig, s"signature diverged for doc $id at k=$k n=$n")
      }
    }
    // scale shape: signatures are a bare map over the corpus — no
    // exchange, no aggregate, no generate (explode) in the plan
    val sigDf = Dedup.minhashSignatures(
      graft.Tables(spark, sfDir).documents, "text", "doc_id", 3, 64)
    sigDf.collect()
    val plan = sigDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate") &&
      !plan.contains("Generate"), s"signature plan not a bare map:\n$plan")
  }

  test("minhash_signature SQL registration serves the same signatures") {
    graft.functions.MinHashExpression.register(spark)
    val viaSql = spark.sql(
      "select minhash_signature(array('a', 'b', 'c', 'd'), 3, 4) as s")
      .head().getSeq[Any](0)
    val viaCol = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(graft.functions.MinHashExpression
        .minhashSignature($"t", 3, 4).as("s"))
      .head().getSeq[Any](0)
    assert(viaSql == viaCol)
    assert(viaSql.length == 4)
  }

  test("staged pairs (signatures via parquet) equal the lazy composition") {
    // the scale path the bench decade runs: signatures materialize once,
    // pairs derive from the stored relation — must be bit-identical to
    // minhashCandidatePairs (same hashes, banding, cap, est_jaccard)
    val dir = java.nio.file.Files.createTempDirectory("mh_staged").toFile
    try {
      val sigDir = new java.io.File(dir, "sigs").getPath
      Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64)
        .write.parquet(sigDir)
      val staged = Dedup.minhashCandidatePairsFromSignatures(
        spark.read.parquet(sigDir), maxBucketSize = Some(5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val lazily = Dedup.minhashCandidatePairs(docs, maxBucketSize = Some(5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(staged.toSeq == lazily.toSeq)
      assert(staged.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("verify-join broadcast id-filter equals the shuffled fallback (r18)") {
    // r18: the est_jaccard verification joins read a signature relation
    // reduced by a broadcast semi-join on the pair ids, UNLESS the pair
    // count exceeds spark.graft.minhash.verifyBroadcastMaxPairs (then
    // the pre-r18 full-relation join shape runs). Both branches must be
    // bit-identical — force the fallback with a zero bound and compare.
    def pairsSorted() = Dedup.minhashCandidatePairs(docs, maxBucketSize = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val viaLazy = pairsSorted() // small relation → size gate keeps the lazy shape
    try {
      spark.conf.set("spark.graft.minhash.verifyFilterMinBytes", "0")
      val viaBroadcast = pairsSorted() // forced id-filter path
      spark.conf.set("spark.graft.minhash.verifyBroadcastMaxPairs", "0")
      val viaFallback = pairsSorted() // forced checkpointed shuffled fallback
      assert(viaLazy == viaBroadcast)
      assert(viaLazy == viaFallback)
      assert(viaLazy.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.minhash.verifyFilterMinBytes")
      spark.conf.unset("spark.graft.minhash.verifyBroadcastMaxPairs")
    }
  }

  test("pair generation is bucket-grouped, not a self-join (plan tripwire)") {
    // the grouped shape's whole point: ONE shuffle of the band rows and
    // no join in pair generation. minhash keeps exactly its two
    // est-Jaccard verification joins; simhash (hamming inline from the
    // carried sigs) has ZERO joins. A third/first join appearing here
    // means someone reintroduced the banded self-join (three shuffles,
    // and a 160M-row sort-merge join at 10M docs).
    def joins(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // finalize AQE
      // AdaptiveSparkPlan's toString appends "== Initial Plan ==" —
      // count join nodes in the FINAL plan only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      "Join".r.findAllIn(plan).length
    }
    assert(joins(Dedup.minhashCandidatePairs(docs, maxBucketSize = Some(5))) == 2)
    assert(joins(Dedup.simhashPairs(docs)) == 0)
    // embedding near-dup carries vectors through the bucket groupBy and
    // computes cosine inline — also ZERO joins
    assert(joins(Dedup.embeddingNearDup(
      graft.Tables(spark, sfDir).embeddings.limit(50), 0.5,
      maxBucketSize = Some(50))) == 0)
    // the multi-band form stays join-free too: bands come from ONE scan
    // (posexplode), dedup is an aggregate, not a self-join
    assert(joins(Dedup.embeddingNearDup(
      graft.Tables(spark, sfDir).embeddings.limit(50), 0.5,
      maxBucketSize = Some(50), bands = 3)) == 0)
  }

  test("sorted-run pair-gen is bit-identical to the grouped twin " +
    "(hot buckets, caps, duplicate ids, integral id widths)") {
    // the r13 scale path streams pairs out of a per-partition sort
    // instead of a collect_list groupBy — same bucket key, same i<j
    // emission, so the PAIR SETS must match exactly, including the
    // self-pair a duplicated id produces and the whole-bucket drop an
    // over-cap run triggers
    val rnd = new scala.util.Random(7L)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (1L to 80L).map { id =>
      // ids 1-10 identical (one hot bucket); 11-80 random with shared
      // prefixes so some bands collide
      val text =
        if (id <= 10) "hot hot hot hot hot hot"
        else Vector.fill(6 + rnd.nextInt(4))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      (id, text)
    } :+ ((42L, "duplicate id row duplicate id row")) // dup id 42
    val docs = corpus.toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 2, 16)
    val bands = Dedup.lshBands(
      sigs.filter($"doc_id".isNotNull && $"_sig".isNotNull),
      "_sig", 4, 4, "doc_id")
    def canonPairs(df: org.apache.spark.sql.DataFrame) =
      df.distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (cap <- Seq(None, Some(3), Some(8), Some(500))) {
      val sortedP = canonPairs(Dedup.pairsFromBandsSorted(
        bands, "doc_id", org.apache.spark.sql.types.LongType, cap))
      val groupedP = canonPairs(Dedup.pairsFromBandsGrouped(
        bands, "doc_id", cap))
      assert(sortedP == groupedP, s"pair sets diverge at cap=$cap")
      assert(sortedP.forall { case (a, b) => a <= b })
    }
    // integral non-long ids take the sorted path and keep their type
    val intDocs = corpus.map { case (id, t) => (id.toInt, t) }
      .toDF("doc_id", "text")
    val intPairs = Dedup.minhashCandidatePairs(intDocs, shingleK = 2,
      numHashes = 16, bands = 4, maxBucketSize = Some(8))
    assert(intPairs.schema("id_a").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val longPairs = Dedup.minhashCandidatePairs(docs, shingleK = 2,
      numHashes = 16, bands = 4, maxBucketSize = Some(8))
    assert(intPairs.collect().map(r => (r.getInt(0), r.getInt(1),
        r.getDouble(2))).sorted.toSeq ==
      longPairs.collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getDouble(2))).sorted.toSeq)
  }

  test("sorted-run pair-gen plan: exactly ONE shuffle, zero aggregates " +
    "(tripwire)") {
    // the r13 rework's contract: pair generation is one hash shuffle of
    // the band rows into a per-partition Tungsten sort, then a streaming
    // scan — NO aggregation machinery (the grouped twin's collect_list
    // forced ObjectHashAggregate into sort-based fallback over object
    // buffers at 10M docs) and no join. A second Exchange or any
    // Aggregate appearing here means the scale path regressed to a
    // shuffle-bearing shape.
    val docs = (1L to 60L).map(id => (id, s"tok${id % 7} tok${id % 5} " +
      s"tok${id % 3} tok${id % 2} tok$id")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 2, 16)
    val bands = Dedup.lshBands(
      sigs.filter($"doc_id".isNotNull && $"_sig".isNotNull),
      "_sig", 4, 4, "doc_id")
    // structural node-type walk rather than regex over the plan STRING
    // (r13 advisory: substring counting relies on exact AQE toString
    // markers and also matches ReusedExchange/BroadcastExchange text —
    // a Spark version bump could false-fail or count the wrong section).
    // AQE wraps materialized exchanges in leaf QueryStageExec nodes, so
    // flatten descends into them explicitly.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    def finalNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
      df.collect() // finalize AQE
      flatten(df.queryExecution.executedPlan)
    }
    def checkOneShuffleNoAggNoJoin(nodes: Seq[SparkPlan], tag: String): Unit = {
      val planStr = nodes.headOption.map(_.toString).getOrElse("")
      assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
        s"$tag sorted: not exactly one shuffle:\n$planStr")
      assert(!nodes.exists(_.isInstanceOf[BaseAggregateExec]) &&
        !nodes.exists(_.isInstanceOf[BaseJoinExec]),
        s"$tag sorted grew aggregation/join machinery:\n$planStr")
    }
    checkOneShuffleNoAggNoJoin(finalNodes(Dedup.pairsFromBandsSorted(
      bands, "doc_id", org.apache.spark.sql.types.LongType, Some(50))), "minhash")
    val banded = Dedup.simhashChunkRows(docs
      .withColumn("_sig", graft.functions.SimHashExpression.simhash64(
        TextAnalysis.tokens($"text")))
      .select($"doc_id", $"_sig"), "doc_id", maxHamming = 3)
    checkOneShuffleNoAggNoJoin(finalNodes(Dedup.simhashChunkPairsSorted(
      banded, "doc_id", org.apache.spark.sql.types.LongType, Some(50))), "simhash")
  }

  test("simhash sorted-run pair-gen is bit-identical to the grouped twin") {
    // same pinning as the minhash twin test: identical docs (one hot
    // bucket shared across EVERY chunk), near-dups, a duplicate id, and
    // caps that both spare and drop the hot bucket
    val rnd = new scala.util.Random(11L)
    val words = Vector("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8")
    val corpus = (1L to 70L).map { id =>
      val text =
        if (id <= 8) "hot hot hot identical doc"
        else Vector.fill(5 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      (id, text)
    } :+ ((33L, "dup id text dup id text"))
    val docs = corpus.toDF("doc_id", "text")
    val withSig = docs
      .withColumn("_sig", graft.functions.SimHashExpression.simhash64(
        TextAnalysis.tokens($"text")))
      .select($"doc_id", $"_sig")
    // the production banding itself (a hand-copied reconstruction here
    // would keep pinning a shape production no longer builds)
    val banded = Dedup.simhashChunkRows(withSig, "doc_id", maxHamming = 3)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    for (cap <- Seq(None, Some(3), Some(10), Some(500))) {
      val s = canon(Dedup.simhashChunkPairsSorted(
        banded, "doc_id", org.apache.spark.sql.types.LongType, cap))
      val g = canon(Dedup.simhashChunkPairsGrouped(banded, "doc_id", cap))
      assert(s == g, s"simhash pair sets diverge at cap=$cap")
    }
    // end-to-end: the public surface routes long ids through the sorted
    // path; re-check the full (distinct+hamming-filter) result against
    // a grouped-path rebuild
    val full = Dedup.simhashPairs(docs, maxHamming = 3,
      maxBucketSize = Some(10))
    val fullTwin = Dedup.simhashChunkPairsGrouped(banded, "doc_id",
      Some(10)).distinct().filter($"hamming" <= 3)
    assert(canon(full) == canon(fullTwin))
  }

  test("sorted-run vs grouped pair-gen fuzz: random band tables, " +
    "tiny hash domain, random caps") {
    // stress the run-detection/cap logic directly on synthetic band
    // rows (bypassing real signatures): a TINY band_hash domain forces
    // buckets of every size — singletons, pairs, over-cap floods — and
    // random duplicate ids land inside runs. The two shapes must agree
    // exactly on every draw.
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 131L)
      val nBands = 1 + rnd.nextInt(3)
      val rows = (0 until 300).map { _ =>
        (rnd.nextInt(40).toLong, // ids with duplicates
          rnd.nextInt(nBands), // band_idx
          rnd.nextInt(12).toLong - 6L) // band_hash, incl. negatives
      }
      val bands = rows.toDF("doc_id", "band_idx", "band_hash")
      val cap = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(1 + rnd.nextInt(4))
        case _ => Some(20 + rnd.nextInt(40))
      }
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq
      val s = canon(Dedup.pairsFromBandsSorted(
        bands, "doc_id", org.apache.spark.sql.types.LongType, cap))
      val g = canon(Dedup.pairsFromBandsGrouped(bands, "doc_id", cap))
      assert(s == g, s"seed=$seed cap=$cap: sorted=${s.size} grouped=${g.size}")
    }
    // simhash twin under the same stress (chunk rows carry a sig)
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 733L)
      val rows = (0 until 300).map { _ =>
        (rnd.nextInt(40).toLong, rnd.nextLong(), // doc_id, _sig
          rnd.nextInt(4), rnd.nextInt(10).toLong) // chunk_idx, chunk
      }
      val banded = rows.toDF("doc_id", "_sig", "chunk_idx", "chunk")
      val cap = if (rnd.nextBoolean()) None else Some(1 + rnd.nextInt(12))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      val s = canon(Dedup.simhashChunkPairsSorted(
        banded, "doc_id", org.apache.spark.sql.types.LongType, cap))
      val g = canon(Dedup.simhashChunkPairsGrouped(banded, "doc_id", cap))
      assert(s == g, s"simhash seed=$seed cap=$cap diverged")
    }
  }

  test("grouped pair-gen matches an in-memory twin on random corpora") {
    // independent oracle for the bucket/cap/pair logic (signatures have
    // their own DuckDB oracle): collect the signatures, group by the
    // RAW 4-slot band slice — the semantic bucket key, robust to
    // whatever hash the engine banding uses — cap, emit i<j pairs,
    // estimate jaccard, and the distributed grouped pipeline must
    // agree exactly
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    for (seed <- 1 to 4; cap <- Seq(None, Some(3), Some(8))) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1L to 60L).map { id =>
        val base = Vector.fill(8 + rnd.nextInt(6))(words(rnd.nextInt(words.size)))
        val toks = if (id % 3 == 0) // near-dup family: tail mutation
          base.updated(base.size - 1, words(rnd.nextInt(words.size)))
        else base
        (id, toks.mkString(" "))
      }.toDF("doc_id", "text")

      val sigs = Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 64)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

      val expectedPairs = scala.collection.mutable.Set[(Long, Long)]()
      for (b <- 0 until 16) {
        val groups = sigs.toSeq
          .groupBy { case (_, s) => s.slice(b * 4, b * 4 + 4).toList }
        for ((_, ms) <- groups) {
          val ids = ms.map(_._1).sorted
          if (ids.size >= 2 && cap.forall(ids.size <= _))
            for (i <- ids.indices; j <- (i + 1) until ids.size)
              expectedPairs += ((ids(i), ids(j)))
        }
      }
      val expected = expectedPairs.toSet[(Long, Long)].map { case (a, c) =>
        val est = sigs(a).zip(sigs(c)).count { case (x, y) => x == y } / 64.0
        (a, c, est)
      }

      val got = Dedup.minhashCandidatePairs(corpus, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"seed=$seed cap=$cap")
    }
  }

  test("minhash bucket cap drops pathological all-identical buckets") {
    // 30 byte-identical docs: uncapped → C(30,2)+... pairs; cap 5 → none
    val clones = (1L to 30L).map(i => (i, "same same same text body here"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashCandidatePairs(clones).count()
    assert(uncapped == 30L * 29 / 2)
    val capped = Dedup.minhashCandidatePairs(clones, maxBucketSize = Some(5)).count()
    assert(capped == 0L)
    // the cap must not drop small, legitimate buckets
    val normal = Dedup.minhashCandidatePairs(docs, maxBucketSize = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(normal.contains((1L, 2L)))
  }

  test("simhash hamming distance near-dups") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 == 0) // identical text → distance 0
  }

  test("ngram jaccard exact computation") {
    val df = Seq(("a b c d e", "a b c d x")).toDF("ta", "tb")
      .select(Dedup.ngramJaccard(
        TextAnalysis.tokens($"ta"), TextAnalysis.tokens($"tb"), 3).as("j"))
    // shingles A: {abc,bcd,cde}; B: {abc,bcd,cdx}; inter 2, union 4
    assert(math.abs(df.head().getDouble(0) - 0.5) < 1e-12)
  }

  test("clusterPairs folds transitive near-dups into one component") {
    // chain 1-2, 2-3 plus a separate pair 10-11: transitivity must put
    // {1,2,3} in ONE cluster even though (1,3) was never a pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer path exercises multiple propagation rounds (diameter 4)
    val chain = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("id_a", "id_b")
    val chainLabels = Dedup.clusterPairs(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainLabels.values.toSet == Set(1L))
    // canonical-keep: only each cluster's min id survives, unpaired docs
    // pass through untouched
    val d = Seq(1L, 2L, 3L, 10L, 11L, 99L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(
      d, Dedup.clusterPairs(pairs)).select($"doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 10L, 99L))
  }

  test("clusterPairs fused init equals one propagation round (r18)") {
    // the r18 fused initialization must leave the state the pre-r18
    // shape had after its FIRST join round: every edged node labeled
    // min(self, min(neighbors)). maxRounds=1 stops right after the
    // fused init, so the diameter-2 chain must show the half-propagated
    // labels the old round 1 produced (3 sees only neighbor 2, not 1).
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(chain, maxRounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("clusterPairs matches a union-find oracle on random graphs") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = (1 to 40)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // oracle: union-find keeping the smaller root, so each final root
      // IS its component's minimum id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expect = touched.map(x => x -> find(x.toInt).toLong).toMap
      val got = Dedup.clusterPairs(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"edges=$edges")
    }
  }

  test("embedding near-dup via LSH buckets finds identical vectors") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(100)
    val copies = e.filter($"vec_id" < 5)
      .select(($"vec_id" + 1000).as("vec_id"), $"embedding")
    val pairs = Dedup.embeddingNearDup(e.select($"vec_id", $"embedding").union(copies), 0.999)
    // every copied vector pairs with its source at cosine 1
    assert(pairs.filter($"id_b" >= 1000L && $"cosine" > 0.9999).count() == 5)
  }

  test("simhash bucket cap drops pathological all-identical buckets") {
    // identical docs share ALL maxHamming+1 chunk buckets — the worst
    // quadratic flood the cap exists for. An identical pair (1,2) from
    // the small fixture must survive: it shares all 11 chunks, and a
    // chunk bucket only drops if ≥4 clones collide into it, which
    // cannot happen on every chunk unless the signatures are equal.
    val clones = (1000L to 1029L).map(i => (i, "same same same text body here"))
    val corpus = clones.toDF("doc_id", "text").union(docs)
    val uncapped = Dedup.simhashPairs(corpus, maxHamming = 10).count()
    assert(uncapped >= 30L * 29 / 2)
    val capped = Dedup.simhashPairs(corpus, maxHamming = 10,
      maxBucketSize = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the flood is gone; the small legitimate buckets survive
    assert(!capped.exists(p => p._1 >= 1000L && p._2 >= 1000L))
    assert(capped.contains((1L, 2L)))
  }

  test("embedding bucket cap drops pathological all-identical buckets") {
    // filter, not limit: the corpus appears on two plan branches and a
    // bare limit has no cross-execution determinism guarantee
    val e = graft.Tables(spark, sfDir).embeddings.filter($"vec_id" < 60)
    val flood = e.filter($"vec_id" === 3)
      .crossJoin(spark.range(30).toDF("_r"))
      .select(($"vec_id" * 1000 + $"_r").as("vec_id"), $"embedding")
    val corpus = e.select($"vec_id", $"embedding").union(flood)
    val capped = Dedup.embeddingNearDup(corpus, 0.999, maxBucketSize = Some(10))
    // the 31-member identical-vector bucket (source + 30 clones) drops
    assert(capped.filter($"id_a" >= 1000L || $"id_b" >= 1000L).count() == 0)
  }

  test("embedding grouped pair-gen matches an in-memory twin") {
    // independent oracle for the bucket/cap/pair/cosine logic: collect
    // the vectors, re-derive sign buckets + left-to-right double-fold
    // cosine in literal Scala (the twin of withLshBucket + VectorDot),
    // group, cap, emit i<j pairs — the distributed grouped pipeline
    // must agree on pairs and match cosines to double precision
    // filter, not limit: the twin collects one execution and the engine
    // runs another — a bare limit could hand them different subsets
    val rows = graft.Tables(spark, sfDir).embeddings.filter($"vec_id" < 120)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      if (na > 0 && nb > 0) dot(a, b) / (na * nb) else Double.NaN
    }
    for (cap <- Seq(None, Some(4)); planes <- Seq(6, 12)) {
      val stride = math.max(1, 64 / planes)
      def bucket(v: Seq[Float]): Long =
        (0 until planes).map(i => if (v(i * stride) >= 0) 1L << i else 0L).sum
      val threshold = -2.0 // keep every generated pair visible
      val expected = rows.groupBy { case (_, v) => bucket(v) }.toSeq
        .flatMap { case (_, ms) =>
          if (ms.length >= 2 && cap.forall(ms.length <= _)) {
            val sorted = ms.sortBy(_._1)
            for (i <- sorted.indices; j <- (i + 1) until sorted.length)
              yield (sorted(i)._1, sorted(j)._1,
                cos(sorted(i)._2, sorted(j)._2))
          } else Nil
        }
        // a zero-norm vector's cosine is NULL in the engine (dropped by
        // the threshold filter); the twin's NaN must drop the same way
        .filter { case (_, _, c) => !c.isNaN }
        .map { case (a, b, c) => (a, b, math.round(c * 1e9)) }.toSet
      val got = Dedup.embeddingNearDup(
        graft.Tables(spark, sfDir).embeddings.filter($"vec_id" < 120),
        threshold, planes = planes, maxBucketSize = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
      assert(got == expected, s"cap=$cap planes=$planes")
    }
  }

  test("embedding bands: band-0 sign flip is found only by bands=2") {
    // v2 flips the sign of component 0 — a coordinate band 0 reads
    // (0-based indices 0,5,10,…) and band 1 does not (1,6,11,…). The
    // single-band bucket differs in bit 0, so bands=1 MUST miss the
    // pair; band 1's bucket is identical, so bands=2 MUST find it. The
    // flipped component is tiny (0.01 of 0.1-valued coords), so the
    // cosine stays ≈0.9997 — well over the threshold: the miss is
    // purely the banding, which is exactly the recall gap the dial buys
    // back.
    val v = Array.fill(64)(0.1f); v(0) = 0.01f
    val v2 = v.clone(); v2(0) = -0.01f
    val df = Seq((1L, v.toSeq), (2L, v2.toSeq)).toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDup(df, 0.99).count() == 0)
    val banded = Dedup.embeddingNearDup(df, 0.99, bands = 2).collect()
    assert(banded.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    assert(banded.head.getDouble(2) > 0.99)
  }

  test("embedding bands: bands=2 is a deduped superset of bands=1") {
    val e = graft.Tables(spark, sfDir).embeddings
      .filter($"vec_id" < 120).select($"vec_id", $"embedding")
    def pairs(bands: Int): Seq[(Long, Long)] =
      Dedup.embeddingNearDup(e, 0.9, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p1 = pairs(1)
    val p2 = pairs(2)
    // a pair co-bucketed in both bands appears once, not twice
    assert(p2.distinct.size == p2.size, "duplicate pairs across bands")
    assert(p1.toSet.subsetOf(p2.toSet),
      "multi-band output lost single-band pairs")
    // bands beyond the disjoint-component budget (stride = dim/planes)
    // is a construction-time error, not silent bucket overlap
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDup(e, 0.9, bands = 6) // stride=5 at 12/64
    }
  }

  test("staged embedding buckets reproduce the live path bit-for-bit") {
    // the staged path's contract: pairs derived from a PERSISTED
    // embeddingBuckets relation are byte-identical to the live
    // embeddingNearDup at the same dials — vectors and norms round-trip
    // parquet exactly, buckets are longs, and both paths share
    // vecBucketPairs. Exercise bands=1 (the no-band-column plan shape),
    // multi-band, and a cap.
    val e = graft.Tables(spark, sfDir).embeddings
      .filter($"vec_id" < 150).select($"vec_id", $"embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_staged_bk").toString
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    for ((bands, cap) <- Seq((1, None), (2, None), (3, Some(8)))) {
      val path = s"$dir/bk_$bands"
      Dedup.writeSignatures(Dedup.embeddingBuckets(e, bands = bands), path)
      val staged = spark.read.parquet(path)
      assert(pairSet(Dedup.embeddingNearDupFromBuckets(staged, 0.9,
        maxBucketSize = cap)) ==
        pairSet(Dedup.embeddingNearDup(e, 0.9, maxBucketSize = cap,
          bands = bands)), s"bands=$bands cap=$cap")
    }
    // bands-subset sweep: a relation staged at 3 bands serves a bands=2
    // run (prefix bands are a valid banding by the disjoint-component
    // construction) identically to the live bands=2 path
    val staged3 = spark.read.parquet(s"$dir/bk_3")
    assert(pairSet(Dedup.embeddingNearDupFromBuckets(staged3, 0.9,
      bands = Some(2))) ==
      pairSet(Dedup.embeddingNearDup(e, 0.9, bands = 2)))
    // and the bands=2 slice only READS bucket_0/bucket_1: bucket_2 is
    // pruned at the scan (the sweep's whole point at scale)
    val plan2 = Dedup.embeddingNearDupFromBuckets(staged3, 0.9,
      bands = Some(2)).queryExecution.executedPlan.toString
    assert(!plan2.contains("bucket_2"), plan2)
    // asking for more bands than were staged, or feeding a relation
    // without contiguous bucket_N columns, is a construction error
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupFromBuckets(staged3, 0.9, bands = Some(4))
    }
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupFromBuckets(
        staged3.drop("bucket_1"), 0.9)
    }
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    ).toDF("a", "b").select(Similarity.cosine($"a", $"b").as("c"))
    val c = df.collect().map(_.getDouble(0))
    assert(math.abs(c(0) - 1.0) < 1e-12)
    assert(math.abs(c(1)) < 1e-12)
  }

  test("brute force top-k: ranks by cosine, excludes self, k bounded") {
    val e = graft.Tables(spark, sfDir).embeddings
    val topk = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0), 5).cache()
    assert(topk.count() == 5)
    val rows = topk.orderBy($"rank").collect()
    assert(rows.forall(_.getAs[Long]("neighbor_id") != 0L))
    val cosines = rows.map(_.getAs[Double]("cosine"))
    assert(cosines.sliding(2).forall(p => p(0) >= p(1) - 1e-9)) // descending
  }

  test("LSH top-k returns a subset consistent with brute force scores") {
    val e = graft.Tables(spark, sfDir).embeddings
    val q = e.filter($"vec_id" === 0)
    val lsh = Similarity.lshTopK(e, q, 5, planes = 4).collect()
    assert(lsh.nonEmpty) // bucket contains some candidates
    // every LSH result's cosine matches the exact cosine for that pair
    val brute = Similarity.bruteForceTopK(e, q, 2000).collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cosine")).toMap
    lsh.foreach { r =>
      val nid = r.getAs[Long]("neighbor_id")
      assert(math.abs(brute(nid) - r.getAs[Double]("cosine")) < 1e-9)
    }
  }

  test("similarity domain: zero/NaN/Inf/NULL vectors excluded at every entry (r18)") {
    // Spark orders NaN GREATER than any double, so without the domain
    // filter a NaN vector ranks FIRST in every top-k it reaches; a zero
    // vector has no direction; DuckDB's oracle side hard-errors on such
    // input. The adversarial-embeddings gate found all of these — this
    // pins the engine half (oracle half: the dom CTE + discipline spec).
    val dim = 64
    def const(x: Float) = Seq.fill(dim)(x)
    val nan = const(0.1f).updated(0, Float.NaN)
    val inf = const(0.1f).updated(0, Float.PositiveInfinity)
    val rows = Seq(
      (0L, Option(const(0.1f))),            // valid
      (1L, Option(const(0.2f))),            // valid, parallel to 0 → cos 1
      (2L, Option(const(0.0f))),            // zero: no direction
      (3L, Option(nan)),                    // NaN component
      (4L, Option(inf)),                    // Inf component
      (5L, None: Option[Seq[Float]]),       // NULL embedding
      (6L, Option(const(1e30f))),           // huge but FINITE Σx² → valid
      (7L, Option(const(1e-30f)))           // tiny but positive → valid
    ).toDF("vec_id", "embedding")
    val dom = Similarity.finiteVectors(rows).collect().map(_.getLong(0)).toSet
    assert(dom == Set(0L, 1L, 6L, 7L))
    // brute force: degenerate queries return nothing, degenerate corpus
    // rows never surface as neighbors — and NaN does NOT rank first
    val top = Similarity.bruteForceTopK(rows, rows, k = 10)
    val byQuery = top.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 6L, 7L))
    assert(byQuery.values.flatten
      .forall(r => dom.contains(r.getAs[Long]("neighbor_id"))))
    // near-dup: only in-domain pairs; parallel constants all hit cos 1
    val pairs = Dedup.embeddingNearDup(rows, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 6L), (0L, 7L), (1L, 6L), (1L, 7L),
      (6L, 7L)))
    // IVF: the default quantizer must skip degenerate would-be centroids
    val ivf = Similarity.ivfTopK(rows, rows, k = 10,
      nCentroids = 3, nProbe = 3)
    val ivfRows = ivf.collect()
    assert(ivfRows.map(_.getAs[Long]("query_id")).toSet == Set(0L, 1L, 6L, 7L))
    assert(ivfRows.forall(r => dom.contains(r.getAs[Long]("neighbor_id"))))
    // trained quantizer: the sample skips degenerates too
    val cents = Similarity.kmeansCentroids(rows, nCentroids = 4)
      .collect().map(_.getSeq[Float](1))
    assert(cents.forall(c => c != null &&
      c.forall(x => !x.isNaN && !x.isInfinite)))
  }

  test("LSH top-k bucket join broadcasts the query side (plan tripwire)") {
    // lsh_bucket has only 2^planes distinct values: a sort-merge join on
    // it would shuffle the WHOLE corpus and skew into few partitions.
    // The query side is pinned broadcast (same contract as ivfTopK's
    // probe join) — a flip back to SMJ must fail here, not ship as a
    // runtime AQE coin-toss.
    val e = graft.Tables(spark, sfDir).embeddings
    val df = Similarity.lshTopK(e, e.filter($"vec_id" < 3), 5, planes = 4)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"lsh bucket join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled on lsh_bucket:\n$plan")
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k: probed lists find the exact top hit for near-dup queries") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(100)
    // a copy of vector 10 must be found as its own top-1 neighbor
    val copies = e.filter($"vec_id" === 10L)
      .select(org.apache.spark.sql.functions.lit(5000L).as("vec_id"), $"embedding")
    val corpus = e.select($"vec_id", $"embedding").union(copies)
    val top = Similarity.ivfTopK(corpus, copies, k = 3, nCentroids = 8, nProbe = 2)
      .filter($"rank" === 1).head()
    assert(top.getAs[Long]("neighbor_id") == 10L)
    assert(top.getAs[Double]("cosine") > 0.9999)
  }

  test("extractFeatures survives a null payload via the stub, no task crash") {
    val feats = Multimodal.extractFeatures(Seq(
      Multimodal.MediaRow(1L, "text", null, "t", None, None, None)).toDS())
      .collect()
    assert(feats.length == 1)
    assert(feats.head.decoder == "stub")
    // r18: an absent payload reports NULL size/hash, not the 0-byte
    // payload's values (which would exact-dup-cluster every missing
    // blob with every genuinely empty file)
    assert(feats.head.n_bytes.isEmpty && feats.head.content_hash.isEmpty)
  }

  test("IVF default quantizer works on non-dense, non-zero-based ids") {
    // ids starting at 1000: filter(id < nCentroids) would select ZERO
    // centroids and silently return an empty result — the quantizer is
    // "first nCentroids by id", an orderBy + limit
    val e = graft.Tables(spark, sfDir).embeddings.limit(100)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val q = e.filter($"vec_id" === 1010L)
      .select(org.apache.spark.sql.functions.lit(9999L).as("vec_id"), $"embedding")
    val corpus = e.union(q)
    val top = Similarity.ivfTopK(corpus, q, k = 3, nCentroids = 8, nProbe = 2)
      .filter($"rank" === 1).head()
    assert(top.getAs[Long]("neighbor_id") == 1010L)
    assert(top.getAs[Double]("cosine") > 0.9999)
  }

  test("IVF candidate cost shrinks with fewer probes") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(200)
    val q = e.filter($"vec_id" < 2)
    val all = Similarity.bruteForceTopK(e, q, k = 200).count()
    val probed = Similarity.ivfTopK(e, q, k = 200, nCentroids = 8, nProbe = 2).count()
    assert(probed < all) // candidate set is a strict subset of the corpus
  }

  test("trained k-means quantizer beats the sampled one on a clustered corpus") {
    // four well-separated direction clusters in 8-dim space, ids SORTED BY
    // CLUSTER — the adversarial order for the sampled quantizer (its
    // first-N centroids all land in cluster 0)
    val rng = new scala.util.Random(97L)
    val centers = Array(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))
    val rows = for (c <- 0 until 4; i <- 0 until 50) yield {
      val v = centers(c).map(x => x + (rng.nextFloat() - 0.5f) * 0.2f)
      ((c * 50 + i).toLong, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 25 === 3) // queries in every cluster
    val truth = Similarity.bruteForceTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(found: Array[(Long, Long)]): Double =
      found.count(truth.contains).toDouble / truth.size

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))

    val sampled = recall(pairs(
      Similarity.ivfTopK(corpus, queries, k = 5, nCentroids = 4, nProbe = 1)))
    val trained = recall(pairs(
      Similarity.ivfTopK(corpus, queries, k = 5, nCentroids = 4, nProbe = 1,
        centroids = Some(Similarity.kmeansCentroids(corpus, nCentroids = 4)))))
    assert(trained > sampled,
      s"trained recall $trained should beat sampled recall $sampled")
    assert(trained >= 0.9, s"trained recall $trained below 0.9")
    // determinism: retraining yields the same centroids
    val c1 = Similarity.kmeansCentroids(corpus, nCentroids = 4)
      .orderBy($"cent_id").collect().map(_.getSeq[Float](1)).toSeq
    val c2 = Similarity.kmeansCentroids(corpus, nCentroids = 4)
      .orderBy($"cent_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(c1 == c2)
  }

  test("round5 matches Spark's round(_, 5) bit-for-bit, halfway points included") {
    // the NearestCentroid comparison key must round EXACTLY like the
    // round(_cd, 5) it replaced — Spark's double Round is string-based
    // BigDecimal HALF_UP, which disagrees with exact-binary BigDecimal
    // at decimal halfway points (0.000015 is NOT representable in
    // binary, so the two constructors see different digits there)
    val battery: Seq[Double] =
      Seq(0.000015, -0.000015, 0.000025, -0.000025, 0.123455, 0.9999949999,
        0.99999, 1.0, -1.0, 0.0, -0.0, 1e-20, -1e-20, 0.5000050001,
        Double.MinPositiveValue, 0.2857142857142857, -0.714285714285) ++
        (1 to 500).map { i =>
          val r = new scala.util.Random(i)
          r.nextDouble() * 2 - 1
        } ++
        // constructed halfway points at the 5th decimal
        (0 until 200).map(i => (i * 2 + 1) / 200000.0 * (if (i % 2 == 0) 1 else -1))
    val sparkRounded = battery.toDF("d")
      .select(round($"d", 5).as("r")).collect().map(_.getDouble(0))
    battery.zip(sparkRounded).foreach { case (d, expected) =>
      val got = graft.functions.CentroidSet.round5(d)
      assert(java.lang.Double.compare(got, expected) == 0 ||
        (got == 0.0 && expected == 0.0),
        s"round5($d) = $got, Spark round = $expected")
    }
    assert(graft.functions.CentroidSet.round5(Double.NaN).isNaN)
    assert(graft.functions.CentroidSet.round5(Double.PositiveInfinity)
      .isPosInfinity)
  }

  test("NearestCentroid assignment is the old crossJoin+groupBy-max plan, bit-for-bit") {
    import org.apache.spark.sql.types._
    // adversarial corpus: exact-duplicate centroid vectors (every row a
    // tie — smaller cent_id must win), near-identical centroids (scores
    // split only by the 5th-decimal rounding), a zero vector, a null
    // vector, null ELEMENTS, and a dimension-mismatched row (null score
    // against every centroid → smallest cent_id)
    val rng = new scala.util.Random(421L)
    def vec(dim: Int): Seq[java.lang.Float] =
      Seq.fill(dim)(java.lang.Float.valueOf(rng.nextFloat() * 2 - 1))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    val base = vec(8)
    val perturbed = base.zipWithIndex.map { case (x, j) =>
      java.lang.Float.valueOf(if (j == 0) x + 1e-7f else x.floatValue()) }
    val rows: Seq[org.apache.spark.sql.Row] =
      // centroids = first 7 by id: dup pair (0,1), near-dup pair (2,3),
      // one random (4), one ZERO vector (5, zero norm — never wins),
      // one NaN-element vector (6 — its norm is NaN; the old plan's
      // `_cent_norm > 0` and NaN score ordering must be reproduced
      // exactly, whatever Spark's comparison semantics turn out to be)
      Seq(
        org.apache.spark.sql.Row(0L, base),
        org.apache.spark.sql.Row(1L, base),
        org.apache.spark.sql.Row(2L, vec(8)),
        org.apache.spark.sql.Row(3L, perturbed),
        org.apache.spark.sql.Row(4L, vec(8)),
        org.apache.spark.sql.Row(5L, Seq.fill(8)(java.lang.Float.valueOf(0f))),
        org.apache.spark.sql.Row(6L,
          vec(8).updated(2, java.lang.Float.valueOf(Float.NaN)))) ++
      (7L until 300L).map(i => org.apache.spark.sql.Row(i, vec(8))) ++
      Seq(
        org.apache.spark.sql.Row(300L, Seq.fill(8)(java.lang.Float.valueOf(0f))),
        org.apache.spark.sql.Row(301L, null),
        org.apache.spark.sql.Row(302L, vec(8).updated(3, null: java.lang.Float)),
        org.apache.spark.sql.Row(303L, vec(5))) // dim mismatch
    val corpus = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    def dotCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.vecDot(a, b)
    // differential harness parameterized by centroid count so the tie
    // semantics are exercised WITHOUT the NaN centroid (which outranks
    // every finite score and would otherwise mask them) and the NaN
    // semantics are exercised with it
    def compare(nCent: Int): (Map[Long, Long], Map[Long, Long],
                              graft.functions.CentroidSet) = {
      val centDf = corpus.orderBy($"vec_id").limit(nCent)
        .select($"vec_id".as("cent_id"), $"embedding".as("cent_vec"))
      // the r11 shape, preserved verbatim as the differential twin
      val cent = centDf.withColumn("_cent_norm",
        sqrt(dotCol($"cent_vec", $"cent_vec")))
      val oldLists = corpus
        .select($"vec_id".as("neighbor_id"), $"embedding".as("c_vec"))
        .withColumn("_row_norm", sqrt(dotCol($"c_vec", $"c_vec")))
        .crossJoin(broadcast(cent))
        .withColumn("_cd",
          when($"_row_norm" > 0 && $"_cent_norm" > 0,
            dotCol($"c_vec", $"cent_vec") / ($"_row_norm" * $"_cent_norm")))
        .groupBy($"neighbor_id")
        .agg(max(struct(round($"_cd", 5).as("_s"), (-$"cent_id").as("_nid")))
          .as("_b"))
        .select($"neighbor_id", (-$"_b._nid").as("cent_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cset = graft.functions.CentroidSet.fromRows(
        centDf.collect().toSeq.map(r =>
          (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Any](1))))
      val newLists = corpus.select($"vec_id".as("neighbor_id"),
        graft.functions.VectorExpressions
          .nearestCentroid($"embedding", cset).as("cent_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(newLists.size == rows.size)
      rows.foreach { r =>
        val id = r.getLong(0)
        assert(newLists(id) == oldLists(id),
          s"assignment diverged for vec_id=$id (nCent=$nCent): " +
            s"new=${newLists(id)} old=${oldLists(id)}")
      }
      (newLists, oldLists, cset)
    }

    // WITHOUT the NaN centroid: dup-centroid ties and the degenerate
    // rows land where the old semantics say — smaller cent_id on ties,
    // smallest cent_id on all-null scores
    val (lists6, old6, cset6) = compare(6)
    assert(lists6(0L) == 0L)
    assert(lists6(1L) == 0L)
    assert(lists6(300L) == 0L) // zero norm → all-null scores
    assert(lists6(301L) == 0L) // null vector
    assert(lists6(303L) == 0L) // dim mismatch everywhere
    // WITH the NaN centroid (id 6): NaN > 0 is TRUE under Spark's SQL
    // comparison (both eval modes, verified empirically), its score is
    // NaN, and NaN outranks every finite score — centroid 6 wins every
    // full-dimension, nonzero-norm row in BOTH implementations
    val (lists7, _, _) = compare(7)
    assert(lists7(0L) == 6L)
    assert(lists7(42L) == 6L)
    assert(lists7(300L) == 0L) // zero norm still all-null
    assert(lists7(303L) == 0L) // dim mismatch still all-null
    // scale shape: the assignment plan over a FILE-backed corpus (a
    // local relation constant-folds the whole thing away, which also
    // proves the interpreted eval path above) is a bare codegen'd map —
    // no exchange, no aggregate, no join anywhere in it
    val pq = java.nio.file.Files.createTempDirectory("ncplan")
      .resolve("corpus").toString
    corpus.write.parquet(pq)
    val fileDf = spark.read.parquet(pq).select($"vec_id".as("neighbor_id"),
      graft.functions.VectorExpressions
        .nearestCentroid($"embedding", cset6).as("cent_id"))
    fileDf.collect()
    val plan = fileDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate") &&
      !plan.contains("Join"), s"assignment plan not a bare map:\n$plan")
    // the "*(n)" prefix is the WholeStageCodegen marker in plan strings
    assert(plan.contains("*(1) Project"),
      s"assignment fell off the codegen path:\n$plan")
    // and the codegen path agrees with the interpreted assignments
    fileDf.collect().foreach { r =>
      assert(r.getLong(1) == old6(r.getLong(0)),
        s"codegen assignment diverged for vec_id=${r.getLong(0)}")
    }
  }

  test("ivfTopK end-to-end output unchanged by the argmax-expression rework") {
    // the p14 shape at oracle scale, both quantizers: output must be
    // IDENTICAL to the old plan's (same rows, same cosines to the bit)
    val e = graft.Tables(spark, sfDir).embeddings
    val q = e.filter($"vec_id".between(4, 7))
    val out = Similarity.ivfTopK(e, q, k = 5, nCentroids = 8, nProbe = 2)
      .orderBy($"query_id", $"rank").collect()
    assert(out.length == 20)
    // vs the brute-force scores: every reported cosine must equal the
    // brute-force cosine for that (query, neighbor) pair exactly (the
    // final scoring arithmetic is untouched by the assignment rework)
    val brute = Similarity.bruteForceTopK(e, q, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(java.lang.Double.compare(
        brute(key), r.getAs[Double]("cosine")) == 0,
        s"cosine drifted for $key")
    }
  }
}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  /** The window tail the aggregate replaced, preserved as the
    * differential twin. */
  private def windowTopK(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"query_id")
      .orderBy(round($"cosine", 5).desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  private def aggTopK(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy($"query_id")
      .agg(graft.functions.TopKExpressions.topKByScore(
        $"cosine", $"neighbor_id".cast("long"), k).as("_top"))
      .select($"query_id", posexplode($"_top").as(Seq("_pos", "_e")))
      .select($"query_id", $"_e.neighbor_id".as("neighbor_id"),
        $"_e.cosine".as("cosine"), ($"_pos" + 1).cast("int").as("rank"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getInt(3))
    }.sortBy(t => (t._1, t._4)).toSeq

  test("top_k_by_score matches the row_number window bit-for-bit under ties and nulls") {
    // adversarial scored relation: exact ties at the 5th decimal (the
    // rounding makes 0.123451 and 0.123452 EQUAL sort keys — id breaks
    // the tie), sub-rounding near-misses, null cosines (desc NullS LAST
    // — they fill trailing ranks when candidates run short), and a
    // group smaller than k
    val rng = new scala.util.Random(7L)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])]()
    (0L until 20L).foreach { q =>
      (0L until 300L).foreach { n =>
        val c =
          if (n % 37 == 0) None // null cosine
          else if (n % 5 == 0) Some(0.1234512 + (n % 3) * 1e-7) // rounded ties
          else if (n % 7 == 0) Some(0.123455) // exact halfway at 5th decimal
          else Some(rng.nextDouble() * 2 - 1)
        rows += ((q, n, c))
      }
    }
    rows += ((99L, 1L, Some(0.5))) // group with fewer candidates than k
    rows += ((99L, 2L, None))
    val scored = rows.toSeq.toDF("query_id", "neighbor_id", "cosine")
      .repartition(7) // several partitions → partial buffers really merge
    Seq(1, 5, 10, 400).foreach { k =>
      val expected = canon(windowTopK(scored, k))
      val got = canon(aggTopK(scored, k))
      assert(got == expected, s"top-k diverged from the window at k=$k")
    }
  }

  test("ANN operators end-to-end: aggregate tail equals the window tail") {
    // duplicate vectors force ties through the REAL operator pipelines;
    // the zero-vector query pins the r18 DOMAIN semantics — it is
    // excluded up front, NOT ranked with 8 arbitrary null-cosine
    // neighbors as the pre-r18 tail did (null-cosine tail behavior
    // itself stays covered by the synthetic twin test above)
    val e = graft.Tables(spark, sfDir).embeddings.limit(150)
      .select($"vec_id", $"embedding")
    val dup = e.filter($"vec_id" === 3L)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val zero = e.filter($"vec_id" === 4L).select(($"vec_id" + 2000L).as("vec_id"),
      expr("transform(embedding, x -> cast(0.0 as float))").as("embedding"))
    val corpus = e.union(dup).union(zero)
    val q = corpus.filter($"vec_id".isin(3L, 1003L, 2004L, 7L))
    val brute = Similarity.bruteForceTopK(corpus, q, k = 8)
    assert(!brute.collect().map(_.getAs[Long]("query_id")).contains(2004L),
      "zero-vector query must be excluded by the similarity domain")
    // rebuild the same scored relation (domain-filtered like the
    // operator) and rank it with the window twin
    val qq = Similarity.finiteVectors(q)
      .select($"vec_id".as("query_id"), $"embedding".as("q_vec"))
      .withColumn("q_norm", sqrt(graft.functions.VectorExpressions
        .vecDot($"q_vec", $"q_vec")))
    val scored = Similarity.finiteVectors(corpus)
      .select($"vec_id".as("neighbor_id"), $"embedding".as("c_vec"))
      .withColumn("c_norm", sqrt(graft.functions.VectorExpressions
        .vecDot($"c_vec", $"c_vec")))
      .crossJoin(broadcast(qq))
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("cosine",
        when($"q_norm" > 0 && $"c_norm" > 0,
          graft.functions.VectorExpressions.vecDot($"q_vec", $"c_vec") /
            ($"q_norm" * $"c_norm")))
    assert(canon(brute) == canon(windowTopK(scored, 8)))
    // plan shape: the ranking is a partial/final aggregate pair, not a
    // window sort over every scored candidate
    val plan = brute.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ranking still a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"top-k aggregate missing from plan:\n$plan")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table schema and deterministic stub features") {
    val media = Multimodal.mediaFromDocuments(
      graft.Tables(spark, sfDir).documents.limit(50)).cache()
    assert(media.count() == 50)
    val types = media.select($"media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 50)
    val f = feats.filter(_.media_id == 1L).head()
    assert(f.feature_vec.length == 16)
    assert(f.n_bytes.exists(_ > 0))
    // determinism: re-extraction yields identical hashes
    val again = Multimodal.extractFeatures(media)
      .filter(_.media_id == 1L).head()
    assert(f.content_hash.isDefined && again.content_hash == f.content_hash)
    // r18: an ABSENT payload (null content) is not a 0-byte payload —
    // size and hash are NULL, so a billion missing blobs can't form one
    // giant exact-dup cluster with genuinely empty files
    val withNull = Multimodal.mediaFromDocuments(
      graft.Tables(spark, sfDir).documents.limit(3)
        .withColumn("text", org.apache.spark.sql.functions.lit(null)
          .cast("string")))
    val nf = Multimodal.extractFeatures(withNull).head()
    assert(nf.n_bytes.isEmpty && nf.content_hash.isEmpty)
    assert(nf.feature_vec.length == 16) // plumbing keeps its shape
  }

  test("frame-sample plan targets videos only") {
    val media = Multimodal.mediaFromDocuments(
      graft.Tables(spark, sfDir).documents.limit(30))
    val plan = Multimodal.frameSamplePlan(media, 10)
    assert(plan.filter($"media_type" =!= "video").count() == 0)
    assert(plan.filter($"n_samples" < 1).count() == 0)
  }

  test("real JDK decode: PNG luminance grid and PCM-WAV RMS envelope, " +
    "with stub fallback for undecodable payloads") {
    // a mid-gray 16x16 PNG, generated with the same JDK codec that decodes
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    val png = pngOut.toByteArray

    // one second of 440 Hz sine, 16-bit mono PCM at 8 kHz, wrapped as WAV
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](16000)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 8000)
      bb.putShort((math.sin(2 * math.Pi * 440 * i / 8000.0) * 20000).toShort)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 8000),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val wav = wavOut.toByteArray

    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, "t", Some(16), Some(16), None),
      Multimodal.MediaRow(2L, "audio", wav, "t", None, None, Some(1000L)),
      Multimodal.MediaRow(3L, "video", "not-a-container".getBytes, "t",
        None, None, Some(5000L))).toDS()
    val feats = Multimodal.extractFeatures(rows).collect()
      .map(f => f.media_id -> f).toMap

    val pf = feats(1L)
    assert(pf.decoder == "imageio")
    // uniform 0x80 gray: every luminance cell = 128/255
    assert(pf.feature_vec.forall(v => math.abs(v - 128f / 255f) < 1e-3))

    val wf = feats(2L)
    assert(wf.decoder == "wav_pcm")
    assert(wf.n_frames_sampled == 8000)
    // sine RMS = amplitude/sqrt(2): (20000/32768)/1.414 ≈ 0.4316
    assert(wf.feature_vec.forall(v => math.abs(v - 0.4316f) < 0.01))

    assert(feats(3L).decoder == "stub")
    assert(feats(3L).feature_vec.length == 16)
  }

  test("a video-magic payload that can't decode still stubs, never throws") {
    // an MP4 ftyp magic with garbage behind it: the ffmpeg seam (binary
    // absent → immediate None; present → decode failure → None) must fall
    // back to the stub either way
    val fakeMp4 = Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p') ++
      Array.fill[Byte](64)(0x5A)
    val feats = Multimodal.extractFeatures(Seq(
      Multimodal.MediaRow(9L, "video", fakeMp4, "t", None, None, Some(1000L)))
      .toDS()).collect()
    assert(feats.head.decoder == "stub")
    assert(feats.head.feature_vec.length == 16)
  }

  test("real video decode through the ffmpeg seam (canceled when ffmpeg is absent)") {
    assume(Multimodal.ffmpegAvailable, "no ffmpeg binary on PATH")
    // generate a 1-second 10 fps test pattern with ffmpeg itself, then
    // decode it: per-frame 4x4 grayscale grid, mean over frames
    val tmp = java.nio.file.Files.createTempFile("graft_testsrc", ".mp4")
    val gen = new ProcessBuilder("ffmpeg", "-y", "-v", "error",
      "-f", "lavfi", "-i", "testsrc=duration=1:size=64x48:rate=10",
      tmp.toString).redirectErrorStream(true).start()
    gen.getInputStream.readAllBytes()
    assert(gen.waitFor() == 0, "ffmpeg testsrc generation failed")
    val bytes = java.nio.file.Files.readAllBytes(tmp)
    java.nio.file.Files.deleteIfExists(tmp)
    val d = Multimodal.decode(bytes)
    assert(d.isDefined, "ffmpeg-decodable payload returned None")
    assert(d.get.decoder == "ffmpeg")
    assert(d.get.nFrames == 10, s"expected 10 frames, got ${d.get.nFrames}")
    assert(d.get.featureVec.length == 16)
    // testsrc is not a black frame: some luminance present
    assert(d.get.featureVec.exists(_ > 0.05f))
    // and through the full operator, decoder surfaces per-row
    val feats = Multimodal.extractFeatures(Seq(
      Multimodal.MediaRow(10L, "video", bytes, "t", None, None, Some(1000L)))
      .toDS()).collect()
    assert(feats.head.decoder == "ffmpeg")
  }
}
