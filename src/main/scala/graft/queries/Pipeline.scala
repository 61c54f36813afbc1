package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators over the documents/embeddings tables:
  * dedup family, ANN search, text analysis, multimodal plumbing.
  * SQL-expressible ops carry DuckDB oracles; hash-based ops (engine hash
  * functions differ) are rows-only with exact semantics covered by
  * ScalaTest.
  */
object Pipeline {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup stats (hash-groupBy shape) per source.
    "p01_doc_exact_dedup" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"text").as("n_distinct_texts"))
        .withColumn("n_dups", $"n_docs" - $"n_distinct_texts")
        .orderBy($"source")
    },

    // Token counting: whitespace + BPE-ish subword proxy.
    "p02_doc_token_stats" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents.select(
        $"doc_id",
        length($"text").as("n_chars"),
        TextAnalysis.tokenCount($"text").as("n_tokens"),
        TextAnalysis.bpeishTokenCount($"text").as("n_bpeish"))
        .orderBy($"doc_id")
    },

    // Quality scoring ratios.
    "p03_doc_quality" -> { (s, dir) =>
      import s.implicits._
      TextAnalysis.withQuality( // r18: keyed spread, see Tables.spreadBy
        Tables.spreadBy(Tables(s, dir).documents, $"doc_id"))
        .select($"doc_id", $"n_chars", $"n_tokens",
          round($"mean_token_len", 6).as("mean_token_len"),
          round($"punct_ratio", 6).as("punct_ratio"),
          round($"upper_ratio", 6).as("upper_ratio"),
          round($"stopword_ratio", 6).as("stopword_ratio"),
          $"quality_score")
        .orderBy($"doc_id")
    },

    // n-gram Jaccard between adjacent doc ids (deterministic pairing).
    "p05_ngram_jaccard_adjacent" -> { (s, dir) =>
      import s.implicits._
      val d = // r18: keyed spread — parallel shingling on both join sides
        Tables.spreadBy(Tables(s, dir).documents, $"doc_id")
      val a = d.select($"doc_id".as("id_a"), TextAnalysis.tokens($"text").as("toks_a"))
      val b = d.select($"doc_id".as("id_b"), TextAnalysis.tokens($"text").as("toks_b"))
      a.join(b, $"id_a" + 1 === $"id_b")
        .select($"id_a", $"id_b",
          round(Dedup.ngramJaccard($"toks_a", $"toks_b", 3), 6).as("jaccard3"))
        .orderBy($"id_a")
    },

    // Brute-force cosine top-k ANN baseline.
    "p06_embedding_topk" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
      Similarity.bruteForceTopK(e, e.filter($"vec_id" < 4), k = 5)
        .select($"query_id", $"neighbor_id", round($"cosine", 6).as("cosine"), $"rank")
        .orderBy($"query_id", $"rank")
    },

    // MinHash+LSH near-dup candidates (hash-based → rows-only); near-dups
    // synthesized deterministically so recall is observable.
    "p07_minhash_pairs" -> { (s, dir) =>
      import s.implicits._
      // deterministic subset (a bare limit returns arbitrary rows)
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" appended tail token")).as("text"))
      val corpus = d.select($"doc_id", $"text").union(mutated)
      Dedup.minhashCandidatePairs(corpus)
        .filter($"est_jaccard" >= 0.5)
        .orderBy($"id_a", $"id_b")
    },

    // Capped minhash: 30 byte-identical clones flood every band bucket;
    // maxBucketSize must drop exactly the oversized buckets — oracle
    // derives the same signatures/buckets/sizes/cap. No est_jaccard
    // threshold: the whole surviving candidate set is compared.
    "p20_minhash_pairs_capped" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" appended tail token")).as("text"))
      val flood = d.filter($"doc_id" === 3).select($"text")
        .crossJoin(s.range(30).toDF("_r"))
        .select((lit(2000000L) + $"_r").as("doc_id"), $"text")
      val corpus = d.select($"doc_id", $"text").union(mutated).union(flood)
      Dedup.minhashCandidatePairs(corpus, maxBucketSize = Some(10))
        .orderBy($"id_a", $"id_b")
    },

    // The STAGED minhash path (signatures materialized to parquet once,
    // pairs derived from the stored relation — the scale shape the bench
    // decade runs) must produce bit-identical pairs to the lazy
    // composition; same oracle as p07.
    "p17_minhash_pairs_staged" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" appended tail token")).as("text"))
      val corpus = d.select($"doc_id", $"text").union(mutated)
      val sigDir = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_p17_sigs").getPath
      Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 64)
        .write.mode("overwrite")
        .option("parquet.block.size", (32 * 1024 * 1024).toString)
        .parquet(sigDir)
      Dedup.minhashCandidatePairsFromSignatures(s.read.parquet(sigDir))
        .filter($"est_jaccard" >= 0.5)
        .orderBy($"id_a", $"id_b")
    },

    // Near-dup CLUSTER formation: connected components over the LSH
    // candidate pairs (transitive near-dups fold into one cluster, so
    // exactly one representative survives canonical-keep) — the step a
    // dedup pipeline runs after pair generation.
    "p15_dedup_clusters" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" appended tail token")).as("text"))
      val corpus = d.select($"doc_id", $"text").union(mutated)
      val pairs = Dedup.minhashCandidatePairs(corpus)
        .filter($"est_jaccard" >= 0.5)
      Dedup.clusterPairs(pairs)
        .groupBy($"cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          array_join(transform(sort_array(collect_list($"doc_id")),
            _.cast("string")), ",").as("members"))
        .orderBy($"cluster_id")
    },

    // Canonical-keep materialization: the corpus with every clustered doc
    // dropped except its cluster's min id — the dedup output a training
    // pipeline actually feeds downstream.
    "p16_dedup_keep" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" appended tail token")).as("text"))
      val corpus = d.select($"doc_id", $"text").union(mutated)
      val pairs = Dedup.minhashCandidatePairs(corpus)
        .filter($"est_jaccard" >= 0.5)
      Dedup.dropNearDuplicates(corpus, Dedup.clusterPairs(pairs))
        .select($"doc_id")
        .orderBy($"doc_id")
    },

    // SimHash near-dup pairs (hash-based → rows-only).
    "p08_simhash_pairs" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" x")).as("text"))
      val corpus = d.select($"doc_id", $"text").union(mutated)
      Dedup.simhashPairs(corpus, maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    },

    // Capped simhash: 30 byte-identical clones flood every chunk bucket;
    // maxBucketSize must drop exactly the oversized buckets — pinned
    // against the DuckDB oracle deriving the same signatures, chunk
    // buckets, sizes and cap.
    "p19_simhash_pairs_capped" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents.filter($"doc_id" < 200)
      val mutated = d.filter($"doc_id" < 20)
        .select(($"doc_id" + 1000000).as("doc_id"),
          concat($"text", lit(" x")).as("text"))
      val flood = d.filter($"doc_id" === 3).select($"text")
        .crossJoin(s.range(30).toDF("_r"))
        .select((lit(2000000L) + $"_r").as("doc_id"), $"text")
      val corpus = d.select($"doc_id", $"text").union(mutated).union(flood)
      Dedup.simhashPairs(corpus, maxHamming = 3, maxBucketSize = Some(10))
        .orderBy($"id_a", $"id_b")
    },

    // Language ID heuristic (11 latin stopword families + 5 scripts) vs
    // the table's labeled lang, with the decision margin.
    "p09_lang_id" -> { (s, dir) =>
      import s.implicits._
      Tables.spreadBy(Tables(s, dir).documents, $"doc_id") // r18: parallel langId
        .select($"doc_id", $"lang".as("lang_label"),
          TextAnalysis.langIdWithMargin($"text").as("_lm"))
        .select($"doc_id", $"lang_label", $"_lm.lang".as("lang_pred"),
          $"_lm.lang_margin".as("lang_margin"))
        .withColumn("correct", $"lang_label" === $"lang_pred")
        .orderBy($"doc_id")
    },

    // Document fingerprinting (rolling-hash analogue; engine-specific hash
    // → rows-only).
    "p10_doc_fingerprint" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", TextAnalysis.fingerprint($"text").as("fingerprint"))
        .orderBy($"doc_id")
    },

    // Multimodal plumbing: binary payload → per-partition stub decode.
    "p11_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables(s, dir).documents)
      Multimodal.extractFeatures(media).toDF()
        .select($"media_id", $"media_type", $"n_bytes", $"content_hash",
          $"n_frames_sampled")
        .orderBy($"media_id")
    },

    // Embedding near-dup via LSH buckets; exact-dup copies synthesized so
    // cosine=1 pairs exist.
    "p12_embedding_neardup" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings.select($"vec_id", $"embedding")
      val copies = e.filter($"vec_id" < 20)
        .select(($"vec_id" + 1000000).as("vec_id"), $"embedding")
      Dedup.embeddingNearDup(e.union(copies), threshold = 0.95)
        .select($"id_a", $"id_b", round($"cosine", 6).as("cosine"))
        .orderBy($"id_a", $"id_b")
    },

    // Multi-band embedding near-dup (the recall dial over p12's
    // operator): band b buckets on the disjoint strided component set
    // {i*stride + b}, candidates union across bands, pairs found in
    // several bands dedup to one row. Pinned against a DuckDB twin
    // deriving both bands and DISTINCT-ing the same pair set.
    "p22_embedding_neardup_banded" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings.select($"vec_id", $"embedding")
      val copies = e.filter($"vec_id" < 20)
        .select(($"vec_id" + 1000000).as("vec_id"), $"embedding")
      Dedup.embeddingNearDup(e.union(copies), threshold = 0.9, bands = 2)
        .select($"id_a", $"id_b", round($"cosine", 6).as("cosine"))
        .orderBy($"id_a", $"id_b")
    },

    // The STAGED embedding path (per-band bucket relation materialized
    // to parquet once, pairs derived from the stored relation — the
    // threshold/bands-sweep shape) must produce bit-identical pairs to
    // the live multi-band composition; same oracle as p22.
    "p23_embedding_neardup_staged" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings.select($"vec_id", $"embedding")
      val copies = e.filter($"vec_id" < 20)
        .select(($"vec_id" + 1000000).as("vec_id"), $"embedding")
      // Per-invocation staging dir (a fixed name raced two concurrent
      // Verify runs on one host — r16 advisory); the derived result is
      // localCheckpoint'ed off the parquet lineage so the dir can be
      // deleted before this query's output is consumed.
      val bkDir = java.nio.file.Files
        .createTempDirectory("graft_p23_buckets_").toString
      try {
        Dedup.embeddingBuckets(e.union(copies), bands = 2)
          .write.mode("overwrite")
          .option("parquet.block.size", (32 * 1024 * 1024).toString)
          .parquet(bkDir)
        Dedup.embeddingNearDupFromBuckets(s.read.parquet(bkDir),
            threshold = 0.9)
          .select($"id_a", $"id_b", round($"cosine", 6).as("cosine"))
          .orderBy($"id_a", $"id_b")
          .localCheckpoint(true)
      } finally graft.sinks.DbFs.deleteRecursive(bkDir)
    },

    // Embedding canonical-keep: cluster the p12 near-dup pairs and drop
    // every clustered vector except its cluster's min id — the exact
    // composition the `dedup --method embedding` verb materializes, so
    // the verb's end-to-end output shape has its own oracle chain
    // (p16's analogue for the vector corpus).
    "p21_embedding_keep" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings.select($"vec_id", $"embedding")
      val copies = e.filter($"vec_id" < 20)
        .select(($"vec_id" + 1000000).as("vec_id"), $"embedding")
      val all = e.union(copies)
      val cl = Dedup.clusterPairs(
        Dedup.embeddingNearDup(all, threshold = 0.95))
      Dedup.dropNearDuplicates(all, cl, "vec_id")
        .select($"vec_id")
        .orderBy($"vec_id")
    },

    // Capped embedding near-dup: an identical-vector flood shares one
    // sign bucket; the maxBucketSize skew guard must drop exactly the
    // oversized buckets and nothing else — pinned against the DuckDB
    // oracle deriving the same buckets, sizes and cap. Threshold -1 so
    // the whole surviving candidate set is compared, not just the
    // high-cosine tail.
    "p18_embedding_neardup_capped" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings.select($"vec_id", $"embedding")
      val flood = e.filter($"vec_id" === 3)
        .crossJoin(s.range(30).toDF("_r"))
        .select((lit(2000000L) + $"_r").as("vec_id"), $"embedding")
      Dedup.embeddingNearDup(e.union(flood), threshold = -1.0,
          maxBucketSize = Some(10))
        .select($"id_a", $"id_b", round($"cosine", 6).as("cosine"))
        .orderBy($"id_a", $"id_b")
    },

    // LSH-bucketed ANN (scale path of p06).
    "p13_lsh_topk" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
      Similarity.lshTopK(e, e.filter($"vec_id" < 4), k = 5, planes = 6)
        .select($"query_id", $"neighbor_id", round($"cosine", 6).as("cosine"), $"rank")
        .orderBy($"query_id", $"rank")
    },

    // IVF ANN (inverted-list scale path; recall dialed by nProbe).
    "p14_ivf_topk" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
      Similarity.ivfTopK(e, e.filter($"vec_id".between(4, 7)), k = 5,
        nCentroids = 8, nProbe = 2)
        .select($"query_id", $"neighbor_id", round($"cosine", 6).as("cosine"), $"rank")
        .orderBy($"query_id", $"rank")
    }
  )

  val oracle: Map[String, String] = Map(
    "p01_doc_exact_dedup" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT text) AS n_distinct_texts,
        |  COUNT(*) - COUNT(DISTINCT text) AS n_dups
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "p02_doc_token_stats" ->
      """SELECT doc_id, LENGTH(text) AS n_chars,
        |  LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[\s\x0b]+'), x -> x != '')) AS n_tokens,
        |  LEN(REGEXP_EXTRACT_ALL(text, '\w+|[^\w\s\x0b]')) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p03_doc_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text, LENGTH(text) AS n_chars,
        |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[\s\x0b]+'), x -> x != '') AS toks
        |  FROM documents)
        |SELECT doc_id, n_chars, LEN(toks) AS n_tokens,
        |  ROUND(CASE WHEN LEN(toks) > 0 THEN
        |    CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks) END, 6)
        |    AS mean_token_len,
        |  ROUND(CASE WHEN n_chars > 0 THEN
        |    CAST(LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / n_chars END, 6)
        |    AS punct_ratio,
        |  ROUND(CASE WHEN n_chars > 0 THEN
        |    CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '', 'g')) AS DOUBLE) / n_chars END, 6)
        |    AS upper_ratio,
        |  ROUND(CASE WHEN LEN(toks) > 0 THEN
        |    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['the','a','an','and','or','of','to','in','is','are','was','it','that','this','for','on','with','as'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / LEN(toks) END, 6)
        |    AS stopword_ratio,
        |  CAST(CASE WHEN LEN(toks) BETWEEN 5 AND 100000 THEN 0.25 ELSE 0.0 END +
        |   CASE WHEN (CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)) BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
        |   CASE WHEN (CAST(LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / n_chars) < 0.2 THEN 0.25 ELSE 0.0 END +
        |   CASE WHEN (CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '', 'g')) AS DOUBLE) / n_chars) < 0.3 THEN 0.25 ELSE 0.0 END
        |   AS DOUBLE) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,

    "p05_ngram_jaccard_adjacent" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[\s\x0b]+'), x -> x != '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    LIST_DISTINCT(CASE
        |      WHEN toks IS NULL THEN NULL
        |      WHEN LEN(toks) = 0 THEN []
        |      WHEN LEN(toks) >= 3 THEN
        |      LIST_TRANSFORM(RANGE(LEN(toks) - 2),
        |        i -> CONCAT_WS(' ', toks[i+1], toks[i+2], toks[i+3]))
        |      ELSE [ARRAY_TO_STRING(toks, ' ')] END) AS shingles
        |  FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CASE
        |    WHEN a.shingles IS NULL OR b.shingles IS NULL THEN NULL
        |    WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.shingles, b.shingles))) > 0 THEN
        |    CAST(LEN(LIST_INTERSECT(a.shingles, b.shingles)) AS DOUBLE) /
        |    LEN(LIST_DISTINCT(LIST_CONCAT(a.shingles, b.shingles))) END, 6) AS jaccard3
        |FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
        |ORDER BY id_a""".stripMargin,

    "p06_embedding_topk" ->
      """WITH dom AS (
        |  -- similarity domain (r18): mirrors Similarity.finiteVectorPredicate
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL
        |    AND isfinite(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'))
        |    AND list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum') > 0),
        |q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |  FROM dom WHERE vec_id < 4),
        |scored AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    LIST_COSINE_SIMILARITY(q_vec, CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM dom e CROSS JOIN q
        |  WHERE e.vec_id != query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY ROUND(cos, 5) DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin
  )
}
