package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every method avoids the O(n²) all-pairs comparison —
  * exact dedup is one hash aggregation; MinHash/SimHash reduce candidate
  * generation to equi-joins on band buckets (shuffle on bucket key, skew
  * bounded by band width); only candidate pairs within a bucket pay the
  * verification cost.
  */
object Dedup {

  // ---- exact (hash groupBy) ----

  /** Exact-duplicate clusters: normalized-text hash → count + member ids. */
  def exactDupClusters(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    docs
      .withColumn("text_hash", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("text_hash"))
      .agg(count(lit(1)).as("n_copies"),
        sort_array(collect_list(col(idCol))).as("doc_ids"))
      .filter(col("n_copies") > 1)
  }

  /** Keep the first (min id) representative of each exact-dup cluster.
    *
    * min_by aggregate, not a row_number window: the window shuffles
    * every row by fingerprint and SORTS each partition, where the
    * aggregate collapses same-partition duplicates map-side and needs
    * no sort at all — at corpus scale that is the difference between a
    * hash aggregate and a full sort of the table. Identical keep
    * semantics for unique ids (min id wins; both shapes are arbitrary
    * under duplicate ids). */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val cols = docs.columns
    docs
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select(cols.map(c => col(s"_row.$c")): _*)
  }

  // ---- MinHash + LSH ----

  /** MinHash signatures as a DataFrame (id, _sig): a pure per-row map —
    * the native codegen'd `MinHashSignature` expression streams each
    * word k-shingle's token bytes into ONE md5 (both base hashes are
    * 48-bit slices of it, engine-portable; h1 + 63·h2 < 2^54, no signed
    * overflow, so an external oracle computes identical signatures) and
    * folds the `numHashes` affine families h1 + i·h2 into their mins in
    * one pass, without materializing shingle strings.
    *
    * Shape history, each step differential-pinned to the last: the
    * naive 64 `array_min(transform(...))` HOF columns were interpreted
    * and ~100× too slow; the r2-r11 relational form (explode shingles →
    * md5 per row → 64 codegen'd `min()` aggregates) fixed the CPU but
    * materialized ~n_shingles rows per document and SHUFFLED every
    * per-document aggregation buffer (64 longs/doc — multi-GB at 10M
    * docs) through its groupBy; the first expression form computed the
    * signature in-row but still built its shingle strings through the
    * interpreted `wordShingles` HOFs — measured 32 of 48 s at 10M docs
    * (`tools.SigProfile`); the token-streaming form removes that too.
    * DedupSpec carries the relational twin and asserts bit-for-bit
    * equality. */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int, numHashes: Int): DataFrame =
    docs.select(col(idCol),
      graft.functions.MinHashExpression.minhashSignature(
        TextAnalysis.tokens(col(textCol)), shingleK, numHashes).as("_sig"))

  /** LSH banding: (band_idx, hash(band slice)) rows, one per band.
    *
    * The band hash is a GROUPING key, not part of the oracle-visible
    * result — two docs co-bucket iff their band slices are equal, which
    * any injective-enough hash preserves (the DuckDB oracle derives its
    * own buckets and compares the PAIR set) — so it uses native
    * `xxhash64` over the slice directly, seeded with the band index.
    * The naive md5 spelling (concat_ws the slice to a string, md5, hex
    * substring, base-16 conv) costs four allocating expressions per
    * band row — ~160M of each at 10M docs, measured ~25% of the whole
    * pairs stage. Only the SIGNATURE hashes must stay md5: they decide
    * min values, bucket contents and est_jaccard, which the external
    * oracle reproduces bit-for-bit. */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, rowsPerBand: Int,
               idCol: String = "doc_id"): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64(lit(b), slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand))
          .as("band_hash"))
    }
    df.select(col(idCol), explode(array(bandStructs: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate pairs = docs sharing any band bucket; verified by the
    * estimated Jaccard (fraction of equal signature slots). The bucket
    * join is the only shuffle; pairs are deduped across bands.
    *
    * `maxBucketSize` caps a single bucket's membership: a pathological
    * bucket (e.g. thousands of byte-identical documents) otherwise
    * degenerates the self-join quadratically. Buckets over the cap are
    * dropped entirely — at scale the right recall story for such
    * clusters is exact dedup first (identical docs share a fingerprint),
    * LSH after; the cap is the skew guard for what remains.
    */
  def minhashCandidatePairs(docs: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id", shingleK: Int = 3,
                            numHashes: Int = 64, bands: Int = 16,
                            maxBucketSize: Option[Int] = None): DataFrame =
    minhashCandidatePairsFromSignatures(
      minhashSignatures(docs, textCol, idCol, shingleK, numHashes),
      idCol, "_sig", numHashes, bands, maxBucketSize)

  /** Materialize a signature relation to parquet with BOUNDED row
    * groups (32 MB vs the 128 MB default). A signature file is dense
    * fixed-width arrays — ~0.5 KB/doc that barely compresses — so at
    * 10M docs the default layout is ~130 MB single-row-group files,
    * and a wide scan buffers one whole row-group column chunk per
    * task: 32 concurrent local threads × ~130 MB compressed + its
    * decompressed vectors exceeds an 8 GB driver heap (measured: the
    * staged 10M pairs run OOMs in the sig scan with default blocks,
    * passes with 32 MB). Smaller row groups also give split-based
    * parallelism real granularity on object stores. The same layout
    * discipline serves [[embeddingBuckets]]' staged relation (dense
    * float vectors compress no better than signature longs). */
  def writeSignatures(sigs: DataFrame, path: String): Unit =
    sigs.write.option("parquet.block.size", (32 * 1024 * 1024).toString)
      .parquet(path)

  /** Candidate pairs from an ALREADY-COMPUTED signature relation — the
    * scale path. The lazy composition above embeds the signature
    * pipeline (shingle explode + 64-slot min-agg over the full text) as
    * a subtree of every plan branch that needs it — the bucket
    * grouping plus the two est-Jaccard verification joins, THREE corpus
    * FileScans with zero ReusedExchanges in the executed plan
    * (`graft.tools.MinhashProbe plan`; the former banded SELF-join
    * shape carried six). Signatures are `numHashes` longs per doc —
    * ~0.5 KB against multi-KB text — so at scale the right shape is:
    * materialize `minhashSignatures` once (via [[writeSignatures]] —
    * row-group size matters, see there), then derive pairs from the
    * stored relation, where every branch re-reads a columnar file
    * instead of re-hashing the corpus. On local NVMe the two are
    * within noise of each other (10M docs: staged 132.6 s end-to-end
    * vs lazy 129.1 s; 1M interleaved A/B: 8.1 vs 7.3 s min-of-3 —
    * the parquet round-trip costs about what the 3× re-hash costs
    * here), but the redundant branches scale with TEXT volume and
    * storage round-trips while the staged re-read scales with the
    * 0.5 KB/doc signature relation — on object storage, or whenever
    * signatures feed more than one downstream, staging wins. The
    * former self-join shape measured 594 s at 10M against 268 s
    * staged under the old md5 banding. */
  def minhashCandidatePairsFromSignatures(
      sigs: DataFrame, idCol: String = "doc_id", sigCol: String = "_sig",
      numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Option[Int] = None): DataFrame = {
    // bands > numHashes would make rowsPerBand 0 (integer division):
    // every band slice becomes the empty array, every doc collides in
    // every band, and the "candidate" set degenerates to all-pairs —
    // silently, since empty slices are valid arrays. Guard here so
    // every caller (live, --staged, --use-staged with a store-probed
    // width) inherits the check.
    require(bands >= 1 && bands <= numHashes,
      s"minhash banding: bands=$bands out of range for signature " +
        s"width $numHashes — need 1 <= bands <= width (rows per band " +
        "would be " + (if (bands < 1) "undefined" else "0, an " +
        "empty-slice band where EVERY document collides") + ")")
    val rowsPerBand = numHashes / bands
    val withSig =
      if (sigCol == "_sig") sigs else sigs.withColumnRenamed(sigCol, "_sig")

    // Pair generation is ONE shuffle of the band rows, versus the naive
    // band self-join's three (bucket-size count, the cap semi-join on
    // each self-join side, then the 160M-row sort-merge self-join at
    // 10M docs). Two equivalent shapes behind that shuffle, chosen by
    // id type: integral ids stream pairs out of a per-partition SORT of
    // the band rows ([[pairsFromBandsSorted]] — the scale path, no
    // aggregation buffers), other id types collect each bucket's member
    // list in a groupBy ([[pairsFromBandsGrouped]] — also the sorted
    // path's differential twin). In both, per-bucket state is bounded
    // by the cap for the degenerate buckets that matter (and the scale
    // story for byte-identical floods remains exact dedup FIRST, which
    // removes them before LSH runs; an uncapped run is a
    // correctness-oracle path, not the scale path).
    // null drop for parity with an equi-join shape: a null id or null
    // signature (possible in a user-supplied sigs relation; never
    // produced by minhashSignatures) would otherwise form a null-keyed
    // bucket under groupBy where a join key would have dropped it.
    // The element_at probe drops ALL-NULL signatures — the "no
    // shingles" signature minhashSignatures produces for NULL-text and
    // (since r18) empty/whitespace-only documents. Slots are all-or-
    // nothing (one hashed window fills every slot), so probing slot 1
    // suffices. Without it, xxhash64 over a slice of nulls is a
    // CONSTANT per band: every no-content document lands in the same
    // bucket in every band — at corpus scale, a single quadratic
    // candidate bucket of empty documents (r18 adversarial corpus
    // find; the DuckDB oracle never generated them).
    val bandsAll = lshBands(
      withSig.filter(col(idCol).isNotNull && col("_sig").isNotNull &&
        element_at(col("_sig"), 1).isNotNull),
      "_sig", bands, rowsPerBand, idCol)
    val idType = withSig.schema(idCol).dataType
    // r18 optimization (guide §3.2 + §5 localCheckpoint), engaged only
    // for LARGE signature relations (size gate below): the candidate
    // pair set is materialized ONCE (localCheckpoint — MapPartitions in
    // the sorted-run path defeats sameResult, so WITHOUT this any plan
    // branch touching `pairs` re-executes the whole bucket shuffle;
    // measured: a lazily shared pairs subtree ran 3× when the id-filter
    // below referenced it), and the two est_jaccard verification joins
    // run against a signature relation REDUCED to the ids that appear
    // in pairs. Unreduced, the planner sized the verify joins off the
    // FULL signature relation (10M × ~0.5 KB at the bench decade) and
    // sort-merge-shuffled it — measured 25 s of the 38 s pairs stage at
    // 10M docs (MhStageProbe: full 38.6 s vs 13.4 s through
    // pairs+distinct). The id list is explicitly broadcast (its size is
    // KNOWN once pairs is checkpointed — ≤ 2·|pairs| longs), which
    // filters each signature scan stream-side with no exchange; above
    // the parameterized bound (spark.graft.minhash.verifyBroadcastMaxPairs,
    // default 5M pairs ≈ ≤80 MB of broadcast ids) the pre-r18 shuffled
    // join shape is kept — at that scale shuffling the pair-matched
    // signatures is the right plan and a forced broadcast would be the
    // bug. Semi-join then inner joins on the same keys: bit-identical
    // rows; the checkpoint only cuts lineage. All three shapes are
    // spec-pinned pairwise identical.
    val lazyPairs = (
      if (isIntegralId(idType))
        pairsFromBandsSorted(bandsAll, idCol, idType, maxBucketSize)
      else pairsFromBandsGrouped(bandsAll, idCol, maxBucketSize)
    ).distinct()
    val spark = sigs.sparkSession
    // the id-filter machinery below costs two eager jobs (checkpoint +
    // count) and a broadcast build — ~0.3-0.4 s of fixed overhead that
    // only pays once the signature relation is big enough for the
    // shuffled verify joins to hurt. Gate on the optimizer's own size
    // estimate of the signature relation (a file size for the staged
    // path, a derived estimate for the lazy one): small relations keep
    // the pre-r18 fully-lazy shape bit-for-bit.
    val verifyFilterMinBytes = spark.conf
      .get("spark.graft.minhash.verifyFilterMinBytes",
        (64L * 1024 * 1024).toString).toLong
    val sigBytes = withSig.queryExecution.optimizedPlan.stats.sizeInBytes
    val (pairs, sigSource) =
      if (sigBytes < verifyFilterMinBytes) (lazyPairs, withSig)
      else {
        val pairsCk = lazyPairs.localCheckpoint()
        val maxBroadcastPairs = spark.conf
          .get("spark.graft.minhash.verifyBroadcastMaxPairs", "5000000").toLong
        if (pairsCk.count() <= maxBroadcastPairs) {
          val pairIds = pairsCk
            .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
            .distinct()
          (pairsCk, withSig.join(broadcast(pairIds), Seq(idCol), "left_semi")
            .localCheckpoint())
        } else (pairsCk, withSig)
      }
    val sigA = sigSource.select(col(idCol).as("id_a"), col("_sig").as("sig_a"))
    val sigB = sigSource.select(col(idCol).as("id_b"), col("_sig").as("sig_b"))
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
          x => x)).cast(DoubleType) / size(col("sig_a")))
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Raw within-bucket i<j pairs from band rows, bucket-grouped: one
    * shuffle into a (band_idx, band_hash) groupBy whose collect_list
    * buckets generate pairs with codegen'd higher-order functions.
    *
    * Grouping is on (band_idx, band_hash), mirroring the oracle's
    * per-band buckets: grouping on the hash alone would let a
    * cross-band 64-bit collision MERGE two legitimate buckets (~1e-3
    * odds across 150M buckets at 10M docs), and with a cap set the
    * merged bucket can exceed it and silently drop every true pair from
    * both sides — lost recall, not just extra candidates. Within-band
    * collisions are ~2.7e-6/band at 10M — the same exposure the md5
    * oracle carries.
    *
    * This is the generic-id path and [[pairsFromBandsSorted]]'s
    * differential twin: at 10M docs its groupBy has ~160M mostly-
    * singleton groups, which pushes ObjectHashAggregate past its
    * fallback threshold into sort-based aggregation over OBJECT list
    * buffers on both the partial and the final side — measured 46.9 s
    * of the 67 s staged pairs stage. Integral-id corpora (every real
    * one) take the sorted-run path instead. */
  private[graft] def pairsFromBandsGrouped(bandsAll: DataFrame, idCol: String,
                                    maxBucketSize: Option[Int]): DataFrame = {
    val buckets = bandsAll.groupBy(col("band_idx"), col("band_hash"))
      .agg(sort_array(collect_list(col(idCol))).as("_ids"))
    val sized = maxBucketSize match {
      case None      => buckets.filter(size(col("_ids")) >= 2)
      case Some(cap) => buckets.filter(size(col("_ids")).between(2, cap))
    }
    val n = size(col("_ids"))
    sized
      .select(explode(flatten(transform(col("_ids"), (a, i) =>
        transform(slice(col("_ids"), i + lit(2), n - i - lit(1)),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("_p"))
      .select(col("_p.id_a"), col("_p.id_b"))
  }

  /** Raw within-bucket i<j pairs from band rows, sorted-run streamed —
    * the scale path for integral ids, bit-identical pairs to
    * [[pairsFromBandsGrouped]] (spec-pinned differential twin).
    *
    * Shape: ONE hash shuffle on the bucket key, the bucket sort FOLDED
    * into a Tungsten per-partition sort (unsafe rows, radix-sortable
    * long prefix), then a streaming scan that detects key runs and
    * emits each run's i<j pairs — no aggregation at all. The grouped
    * twin's collect_list over ~160M mostly-singleton groups (10M docs ×
    * 16 bands) forces ObjectHashAggregate into its sort-based fallback
    * TWICE (partial and final), sorting object list buffers and
    * serializing one ArrayData per group across the shuffle; here the
    * only sort is the unsafe-row sort and the only shuffle payload is
    * the 20-byte band row itself. Per-run state is bounded by the cap
    * (an over-cap run discards its buffer and skips to the next key,
    * so a pathological bucket costs O(cap) memory, not O(bucket));
    * sorting ids ascending within the run makes id_a < id_b fall out
    * of emission order exactly as sort_array did. Ids are processed as
    * longs and cast back, so the output schema matches the grouped
    * twin for every integral id type; duplicate ids inside a bucket
    * tie in the sort and emit the same self-pair the sorted-array twin
    * emits.
    *
    * MEASURED NEGATIVE RESULT — pre-shuffle singleton filtering
    * (`tools.PrefilterProbe`): >99.8% of band rows are singleton
    * buckets at 10M docs (175K pairs from 160M rows), so filtering
    * them before the shuffle looks attractive. A superset-exact
    * "seen-twice" filter (per-partition seen/dup bitmaps, carry-save
    * merged, broadcast back; false positives only, pair sets verified
    * bit-identical) does cut the shuffle to 26-45M rows and this
    * method's downstream cost from ~19-28 s to ~9-10 s — but building
    * the filter costs what it saves: the duplicate-detection pass must
    * itself observe every band hash globally, and the sketch is
    * O(corpus)-bits of global state (2^29-cell bitmaps measured
    * 12.7 s build+merge at 10M docs with 4 GB of reduce traffic —
    * already past Spark's 1 GB maxResultSize default — for an
    * all-in 27.9 s vs the unfiltered 28.6 s in the same JVM).
    * Break-even at 10M, and the sketch traffic/broadcast grows
    * linearly with corpus while this one shuffle streams disk-to-disk
    * at any scale — at 10B docs the filter would move ~0.5 TB of
    * bitmap merges to save a shuffle Spark handles routinely. The
    * exact-count variant is no better: singleton keys cannot combine
    * map-side, so a count pre-pass shuffles the same 160M rows it
    * hopes to avoid. Keep the one-shuffle shape. */
  private[graft] def pairsFromBandsSorted(bandsAll: DataFrame, idCol: String,
                                   idType: DataType,
                                   maxBucketSize: Option[Int]): DataFrame = {
    val spark = bandsAll.sparkSession
    import spark.implicits._
    val cap = maxBucketSize.getOrElse(Int.MaxValue)
    // sort order: band_hash FIRST — the per-partition sort's 8-byte
    // prefix then decides nearly every comparison (band_idx has only
    // `bands` distinct values, so idx-first would send almost every
    // comparison to the full row comparator). Any total order keeping
    // (band_idx, band_hash) groups contiguous yields the same runs and
    // the same pairs; id stays the last key so id_a < id_b falls out.
    val sorted = bandsAll
      .select(col("band_idx").cast("int").as("band_idx"), col("band_hash"),
        col(idCol).cast("long").as("_id"))
      .repartition(col("band_idx"), col("band_hash"))
      .sortWithinPartitions(col("band_hash"), col("band_idx"), col("_id"))
      .as[(Int, Long, Long)]
    val pairs = sorted.mapPartitions { rows =>
      cappedRuns[(Int, Long, Long), Long](rows, cap,
        (a, b) => a._1 == b._1 && a._2 == b._2, _._3).flatMap { b =>
        b.indices.iterator.flatMap(i =>
          (i + 1 until b.length).iterator.map(j => (b(i), b(j))))
      }
    }
    pairs.toDF("id_a", "id_b")
      .select(col("id_a").cast(idType), col("id_b").cast(idType))
  }

  /** Buffer one bucket RUN at a time from a key-sorted row iterator —
    * the streaming core both sorted pair generators share. Collects
    * payloads while `sameKey` holds against the run's first row (the
    * per-partition sort guarantees runs are contiguous); a run passing
    * `cap` discards its buffer but KEEPS CONSUMING the run's rows so the
    * iterator stays aligned on the next bucket (a pathological bucket
    * costs O(cap) memory, not O(bucket)). Emits only runs of >= 2 — the
    * buckets that can form pairs. */
  private def cappedRuns[R, T](rows: Iterator[R], cap: Int,
                               sameKey: (R, R) => Boolean, payload: R => T)
      : Iterator[scala.collection.mutable.ArrayBuffer[T]] = {
    val it = rows.buffered
    new Iterator[scala.collection.mutable.ArrayBuffer[T]] {
      def hasNext: Boolean = it.hasNext
      def next(): scala.collection.mutable.ArrayBuffer[T] = {
        val first = it.next()
        var buf = scala.collection.mutable.ArrayBuffer(payload(first))
        var dropped = false
        while (it.hasNext && sameKey(first, it.head)) {
          val r = it.next()
          if (!dropped) {
            buf += payload(r)
            if (buf.length > cap) { dropped = true; buf = null }
          }
        }
        buf
      }
    }.filter(b => b != null && b.length >= 2)
  }

  /** Connected components over near-dup pairs — the cluster-formation
    * step a dedup pipeline runs AFTER candidate generation: transitive
    * near-dups (A~B, B~C) must fold into ONE cluster so exactly one
    * representative survives, which pairwise output alone can't express.
    *
    * Iterative min-label propagation (the standard large-graph CC, same
    * shape as GraphX/Pregel cc): every node starts labeled with its own
    * id and repeatedly adopts the minimum label among itself and its
    * neighbors — one equi-join + partial-aggregated groupBy per round,
    * O(component diameter) rounds. Near-dup graphs are short-diameter
    * (clusters are cliques-ish through their shared buckets), so rounds
    * stay in the low single digits at any scale; every round is a plain
    * shuffle join that AQE sizes, nothing collects to the driver, and
    * `localCheckpoint` cuts the growing lineage so round N's plan does
    * not re-execute rounds 1..N-1 (without it the plan doubles per
    * round — exponential). Convergence is detected with a changed-count
    * aggregate, also distributed.
    *
    * Returns (doc_id, cluster_id) with cluster_id = min doc id of the
    * component; only paired docs appear (unpaired docs are their own
    * trivial cluster by definition and need no row at scale). */
  def clusterPairs(pairs: DataFrame, aCol: String = "id_a",
                   bCol: String = "id_b", maxRounds: Int = 50): DataFrame = {
    // Both edge directions from ONE scan of `pairs`. The obvious
    // `pairs.union(pairs.swapped)` spelling executes the pair PLAN
    // twice: the two union children are separate physical subtrees, and
    // exchange reuse only dedupes the shuffle write — the post-shuffle
    // candidate generation (the expensive quadratic in-bucket work on
    // the LSH paths) still runs per child. Measured at 10M vectors
    // (EmbedDedupProbe): pair generation 178.7 s, union-form edges
    // materialization 348 s ≈ exactly 2x; the explode(array(..)) form
    // is one execution. localCheckpoint then pins the result so the
    // iterative rounds never re-touch the pair plan.
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .distinct()
      .localCheckpoint() // run the (possibly LSH-expensive) pair plan once
    // r18 optimization: initialization FUSED with round 1. The former
    // init (labels = distinct node ids, cluster_id = own id) spent one
    // distinct+checkpoint pass, and the first loop round then computed
    // min(self, min neighbor ids) through a full join. But that round-1
    // result is directly expressible as ONE aggregation over the edge
    // list — for every node with an edge, min(self, min(neighbors)) —
    // since at init every neighbor's label IS its id. Same labels after
    // every subsequent round (spec-pinned), one distinct pass and one
    // join round cheaper; the loop below continues from round 2's state.
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
      .withColumnRenamed("src", "doc_id")
      .localCheckpoint()
    var converged = false
    var round = 1 // the fused init above IS round 1
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("_nmin"))
      val next = labels.withColumnRenamed("cluster_id", "_prev")
        .join(neighborMin, Seq("doc_id"), "left")
        .withColumn("cluster_id",
          least(col("_prev"), coalesce(col("_nmin"), col("_prev"))))
        .localCheckpoint()
      converged = next.filter(col("cluster_id") =!= col("_prev")).count() == 0
      labels = next.select("doc_id", "cluster_id")
      round += 1
    }
    // no silent caps: an unconverged result merges fewer clusters than
    // the true components — say so instead of returning it quietly
    if (!converged)
      println(s"WARNING: clusterPairs stopped at maxRounds=$maxRounds " +
        "before convergence; some transitive clusters remain split " +
        "(raise maxRounds for path-like duplicate graphs)")
    labels
  }

  /** Canonical-keep materialization: drop every clustered doc except its
    * cluster's minimum id (exact-dedup's `exactDedup` analogue for the
    * NEAR-dup graph). A broadcast-size drop list at test scale; at 100 TB
    * the anti-join shuffles on doc_id, which is the partitioning the
    * documents table already wants. */
  def dropNearDuplicates(docs: DataFrame, clusters: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    val drop = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  // ---- SimHash ----

  /** 64-bit SimHash over tokens: per-token hash votes per bit. The bit
    * loop is genuinely imperative → one small pure UDF (the reference
    * preference order allows this; a custom Expression with codegen is
    * the upgrade path). Token hashes are the leading 60 bits of md5, so
    * an external oracle reproduces signatures exactly (top 4 signature
    * bits are structurally 0 — harmless for banding/hamming). */
  private[pipeline] def simhash64(tokens: Seq[String]): Long = {
    if (tokens == null || tokens.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      md.reset()
      // first 15 hex chars = high 60 bits of the digest, big-endian
      var h = 0L
      var j = 0
      while (j < 15) {
        val nib = (d(j / 2) >> (if (j % 2 == 0) 4 else 0)) & 0xf
        h = (h << 4) | nib
        j += 1
      }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  // null-in → null-out AND empty-in → null-out, matching the native
  // SimHash64 expression: a token-less document has no features, and
  // any non-null value here would cluster every empty-text document
  // with every other at hamming 0 (NULL drops out of the banded join)
  val simhashUdf = udf((toks: Seq[String]) =>
    if (toks == null || toks.isEmpty) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(simhash64(toks)))

  /** Near-dup pairs by SimHash: band the 64-bit signature into
    * maxHamming+1 chunks — by pigeonhole, a pair within maxHamming bit
    * flips shares at least one untouched chunk, so recall is guaranteed
    * for EVERY legal maxHamming (a fixed 4-chunk banding would silently
    * lose qualifying pairs from maxHamming = 4 up); verify with
    * bit_count(xor) ≤ maxHamming. The default (3 → four 16-bit chunks)
    * is the classic 64-bit fingerprint configuration. Signatures come
    * from the native codegen'd SimHash64 expression (the UDF above
    * remains as its differential twin for tests). */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", maxHamming: Int = 3,
                   maxBucketSize: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming: $maxHamming")
    val withSig = docs
      .withColumn("_sig", graft.functions.SimHashExpression.simhash64(
        TextAnalysis.tokens(col(textCol))))
      .select(col(idCol), col("_sig"))

    val banded = simhashChunkRows(withSig, idCol, maxHamming)

    // pair generation is ONE shuffle of the chunk rows, hamming computed
    // inline from the carried signatures — no self-join and no
    // verification join at all. Same two shapes as the minhash path,
    // chosen by id type: integral ids stream pairs out of a
    // per-partition sort ([[simhashChunkPairsSorted]] — no aggregation
    // buffers), other id types collect each bucket's member list in a
    // groupBy ([[simhashChunkPairsGrouped]], also the sorted path's
    // differential twin).
    // same skew guard as the minhash path: a flood of byte-identical
    // documents shares ALL maxHamming+1 chunk buckets, so each would
    // generate the quadratic pair set maxHamming+1 times over. Buckets
    // past the cap drop entirely — identical docs are exact-dedup
    // territory; run that first
    val idType = withSig.schema(idCol).dataType
    val pairs =
      if (isIntegralId(idType))
        simhashChunkPairsSorted(banded, idCol, idType, maxBucketSize)
      else simhashChunkPairsGrouped(banded, idCol, maxBucketSize)
    pairs.distinct().filter(col("hamming") <= maxHamming)
  }

  /** Chunk-banded rows (id, _sig, chunk_idx, chunk) from a simhash
    * signature relation: maxHamming+1 contiguous bit slices of the
    * 64-bit fingerprint (pigeonhole — a pair within maxHamming differing
    * bits must share at least one chunk exactly). The explicit null drop
    * keeps parity with the former equi-self-join shape (null join keys
    * never matched, so null-sig/null-id docs silently fell out; groupBy
    * would instead form a null-keyed bucket). Package-visible so the
    * spec-side plan/parity pins exercise the EXACT banding production
    * builds rather than a hand-copied reconstruction that can drift. */
  private[graft] def simhashChunkRows(withSig: DataFrame, idCol: String,
                                      maxHamming: Int): DataFrame = {
    val nChunks = maxHamming + 1
    val chunks = (0 until nChunks).map { c =>
      val start = c * 64 / nChunks
      val width = (c + 1) * 64 / nChunks - start
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(c).as("chunk_idx"),
        shiftrightunsigned(col("_sig"), start).bitwiseAND(lit(mask)).as("chunk"))
    }
    withSig
      .filter(col(idCol).isNotNull && col("_sig").isNotNull)
      .select(col(idCol), col("_sig"), explode(array(chunks: _*)).as("c"))
      .select(col(idCol), col("_sig"), col("c.chunk_idx"), col("c.chunk"))
  }

  /** Within-bucket (id_a, id_b, hamming) rows from simhash chunk rows,
    * bucket-grouped — the generic-id path and
    * [[simhashChunkPairsSorted]]'s differential twin. Members sort by
    * struct(id, sig), so id_a < id_b falls out of i < j. */
  private[graft] def simhashChunkPairsGrouped(
      banded: DataFrame, idCol: String,
      maxBucketSize: Option[Int]): DataFrame = {
    val grouped = banded.groupBy(col("chunk_idx"), col("chunk"))
      .agg(sort_array(collect_list(
        struct(col(idCol).as("id"), col("_sig").as("sig")))).as("_m"))
    val buckets = maxBucketSize match {
      case None      => grouped.filter(size(col("_m")) >= 2)
      case Some(cap) => grouped.filter(size(col("_m")).between(2, cap))
    }
    val n = size(col("_m"))
    buckets
      .select(explode(flatten(transform(col("_m"), (a, i) =>
        transform(slice(col("_m"), i + lit(2), n - i - lit(1)), b =>
          struct(a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            bit_count(a.getField("sig").bitwiseXOR(b.getField("sig")))
              .as("hamming")))))).as("_p"))
      .select(col("_p.id_a"), col("_p.id_b"), col("_p.hamming"))
  }

  /** Sorted-run twin of [[simhashChunkPairsGrouped]] for integral ids —
    * the scale shape (same rationale as the minhash
    * [[pairsFromBandsSorted]]: fold the bucket sort into a Tungsten
    * per-partition sort instead of object list buffers in a
    * sort-fallback ObjectHashAggregate; chunk-first sort key for the
    * 8-byte radix prefix). Members sort by (id, sig) within a run —
    * exactly the grouped twin's struct order — so the emitted i<j
    * pairs and their inline hamming are bit-identical. */
  private[graft] def simhashChunkPairsSorted(
      banded: DataFrame, idCol: String, idType: DataType,
      maxBucketSize: Option[Int]): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val cap = maxBucketSize.getOrElse(Int.MaxValue)
    val sorted = banded
      .select(col("chunk_idx").cast("int").as("chunk_idx"), col("chunk"),
        col(idCol).cast("long").as("_id"), col("_sig"))
      .repartition(col("chunk_idx"), col("chunk"))
      .sortWithinPartitions(col("chunk"), col("chunk_idx"), col("_id"),
        col("_sig"))
      .as[(Int, Long, Long, Long)]
    val pairs = sorted.mapPartitions { rows =>
      cappedRuns[(Int, Long, Long, Long), (Long, Long)](rows, cap,
        (a, b) => a._1 == b._1 && a._2 == b._2, r => (r._3, r._4)).flatMap { b =>
        b.indices.iterator.flatMap(i =>
          (i + 1 until b.length).iterator.map { j =>
            val (ia, sa) = b(i); val (ib, sb) = b(j)
            (ia, ib, java.lang.Long.bitCount(sa ^ sb))
          })
      }
    }
    pairs.toDF("id_a", "id_b", "hamming")
      .select(col("id_a").cast(idType), col("id_b").cast(idType),
        col("hamming"))
  }

  // ---- n-gram Jaccard ----

  /** Exact Jaccard similarity between two token arrays' k-shingle sets.
    *
    * Both shingle sets are bound once (TextAnalysis.bindOnce — HOFs are
    * interpreted, so each reference re-evaluates the shingle transform)
    * and the union size comes from |A|+|B|-|A∩B| on the distinct arrays
    * instead of a second hash-set pass over array_union — identical
    * values, so the p05 oracle is unchanged. */
  def ngramJaccard(toksA: Column, toksB: Column, k: Int): Column =
    TextAnalysis.bindOnce(struct(
      array_distinct(TextAnalysis.wordShingles(toksA, k)).as("sa"),
      array_distinct(TextAnalysis.wordShingles(toksB, k)).as("sb"))) { s =>
      val sa = s.getField("sa")
      val sb = s.getField("sb")
      // explicit NULL guard: a NULL shingle set (NULL text) must yield a
      // NULL similarity, and without the guard the legacy size(NULL) = -1
      // (ANSI off) flows into the |A|+|B| arithmetic as a NEGATIVE count
      // (r18 adversarial corpus find). Two EMPTY sets fall through to the
      // union > 0 guard below: 0/0 → NULL, while empty-vs-nonempty is a
      // legitimate 0.0
      when(sa.isNotNull && sb.isNotNull,
        TextAnalysis.bindOnce(struct(
          size(array_intersect(sa, sb)).as("i"),
          (size(sa) + size(sb)).as("t"))) { v =>
          val inter = v.getField("i")
          val union = v.getField("t") - inter
          when(union > 0, inter.cast(DoubleType) / union)
        })
    }

  // ---- embedding cosine near-dup ----

  /** Near-duplicate pairs by embedding cosine ≥ threshold, candidates
    * generated by the similarity module's LSH buckets (avoids all-pairs).
    * `dim` is the embedding dimensionality — it sizes the bucket bit
    * strides, and an overstated dim silently degrades bucketing (planes
    * past the real length read null → constant bits → fewer effective
    * buckets → bucket contents trend quadratic). No distinct() needed:
    * each vector has exactly ONE bucket, so each pair is generated at
    * most once.
    *
    * Same bucket-grouped single-shuffle shape as the minhash/simhash
    * paths (members collect once per bucket, i<j pairs + cosine inline
    * via codegen'd higher-order functions — no self-join), and the same
    * `maxBucketSize` skew guard: a flood of identical/collinear vectors
    * lands in one bucket and generates its pair set quadratically;
    * buckets past the cap drop entirely (identical payloads are exact-
    * dedup territory — run that first). SIZE `planes` WITH THE CORPUS:
    * expected bucket membership is n / 2^planes, and within-bucket pair
    * work is quadratic in membership, so per-doc cost at fixed planes
    * grows linearly with n — planes ≈ log2(n / targetBucketSize) keeps
    * the candidate volume per doc constant as the corpus scales.
    *
    * This path KEEPS the bucket-grouped collect_list shape the minhash/
    * simhash paths replaced with sorted-run streaming: the regimes
    * differ. Minhash/simhash group ~n×bands rows into mostly-SINGLETON
    * buckets (160M groups at 10M docs), where per-group object buffers
    * and the ObjectHashAggregate sort fallback dominate; here there are
    * at most 2^planes buckets — few, large groups whose membership the
    * sizing rule above keeps near targetBucketSize — so the aggregation
    * state is a handful of bounded buffers and the quadratic in-bucket
    * pair work, not the grouping machinery, is the cost that matters. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       planes: Int = 12, dim: Int = 64,
                       maxBucketSize: Option[Int] = None,
                       bands: Int = 1): DataFrame = {
    // Shared tail with [[embeddingNearDupFromBuckets]] (the staged
    // path): both feed pre-bucketed member rows into vecBucketPairs,
    // so the staged round trip is byte-identical by construction.
    // `bands` is the RECALL dial (measured, EmbedDedupProbe): a single
    // sign-LSH banding finds a perturbed near-dup only if NO selected
    // component's sign flipped, recall ≈ (1−flip)^planes — 0.65 at
    // planes=11 / eps=0.15. Band b reads the DISJOINT strided component
    // set {i·stride + b}, so misses are independent across bands and
    // recall composes as 1−(1−r)^bands (bands=3 at planes=11: ~0.96
    // measured) for ~bands× candidate volume. All bands come from ONE
    // scan (posexplode of a bucket array — never a union of per-band
    // plans, which would evaluate the source once per child); a pair
    // sharing several band buckets is deduped AFTER the threshold
    // filter, where the surviving set is small. bands=1 keeps the
    // historical single-band plan exactly (no band column, no dedup).
    val stride = math.max(1, dim / planes)
    require(bands >= 1 && bands <= stride,
      s"embeddingNearDup: bands=$bands out of range — the strided sign " +
        s"buckets admit at most stride=$stride disjoint bands at " +
        s"planes=$planes dim=$dim")
    // null id rows fell out of the former equi-join shape (null never
    // compared under id_a < id_b) — drop them explicitly so the groupBy
    // can't form pairs the join shape never emitted. The vector side
    // applies the full similarity-domain predicate (non-NULL, finite,
    // positive norm — Similarity.finiteVectorPredicate): zero vectors
    // all share one sign bucket, and a NaN norm ranks GREATEST under
    // Spark's NaN ordering (r18 adversarial-embeddings find)
    // norms computed ONCE per member before the groupBy (the same
    // norms-once discipline bruteForceTopK/ivfTopK apply): the naive
    // cosine() per pair re-folds both self-dot-products, 3 vecDots per
    // pair instead of 1 + one per member — ~3x the arithmetic of a
    // 500-cap bucket. Identical doubles: sqrt(dot(v,v)) here is the
    // exact expression cosine() would have evaluated per pair.
    def dotC(x: Column, y: Column): Column =
      graft.functions.VectorExpressions.vecDot(x, y)
    val (bucketed, groupCols) =
      if (bands == 1) {
        (Similarity.withLshBucket(embeddings, vecCol, planes, dim)
          .filter(col(idCol).isNotNull &&
            Similarity.finiteVectorPredicate(vecCol))
          .select(col(idCol).as("id"), col(vecCol).as("vec"),
            col("lsh_bucket"))
          .withColumn("nrm", sqrt(dotC(col("vec"), col("vec")))),
          Seq(col("lsh_bucket")))
      } else {
        val bandBuckets = array((0 until bands).map(b =>
          Similarity.lshBucketCol(col("vec"), planes, dim, b)): _*)
        // nrm BEFORE the posexplode: Generate evaluates per OUTPUT row,
        // so a post-explode nrm would re-fold the self-dot once per
        // band instead of once per vector
        (embeddings
          .filter(col(idCol).isNotNull &&
            Similarity.finiteVectorPredicate(vecCol))
          .select(col(idCol).as("id"), col(vecCol).as("vec"))
          .withColumn("nrm", sqrt(dotC(col("vec"), col("vec"))))
          .select(col("id"), col("vec"), col("nrm"),
            posexplode(bandBuckets).as(Seq("band", "lsh_bucket"))),
          Seq(col("band"), col("lsh_bucket")))
      }
    vecBucketPairs(bucketed, groupCols, threshold, maxBucketSize,
      dedupAcrossBands = bands > 1)
  }

  /** The in-bucket pair tail shared by the live and staged embedding
    * paths: group the (id, vec, nrm) member rows by their bucket key,
    * emit i<j pairs with the cosine inline, filter to the threshold,
    * and (multi-band only) dedup pairs co-bucketed in several bands. */
  private def vecBucketPairs(bucketed: DataFrame, groupCols: Seq[Column],
                             threshold: Double, maxBucketSize: Option[Int],
                             dedupAcrossBands: Boolean): DataFrame = {
    def dotC(x: Column, y: Column): Column =
      graft.functions.VectorExpressions.vecDot(x, y)
    val grouped = bucketed.groupBy(groupCols: _*)
      .agg(sort_array(collect_list(
        struct(col("id"), col("vec"), col("nrm")))).as("_m"))
    val sized = maxBucketSize match {
      case None      => grouped.filter(size(col("_m")) >= 2)
      case Some(cap) => grouped.filter(size(col("_m")).between(2, cap))
    }
    val n = size(col("_m"))
    val pairs = sized
      .select(explode(flatten(transform(col("_m"), (a, i) =>
        transform(slice(col("_m"), i + lit(2), n - i - lit(1)), b =>
          struct(a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            when(a.getField("nrm") > 0 && b.getField("nrm") > 0,
              dotC(a.getField("vec"), b.getField("vec")) /
                (a.getField("nrm") * b.getField("nrm")))
              .as("cosine")))))).as("_p"))
      .select(col("_p.id_a"), col("_p.id_b"), col("_p.cosine"))
      // strict < (not just the sorted i<j): duplicate ids tie in the
      // sorted member list and would pair with themselves here, where
      // the join shape's id_a < id_b dropped them
      .filter(col("id_a") < col("id_b") && col("cosine") >= threshold)
    // a pair co-bucketed in k bands appears k times with an IDENTICAL
    // cosine (same floats, same expression) — dedup the post-threshold
    // survivors, not the candidate stream
    if (dedupAcrossBands) pairs.dropDuplicates("id_a", "id_b") else pairs
  }

  /** The staged embedding-dedup relation — minhash's `dedup_signatures`
    * discipline applied to vector corpora (the K1 projection idea: the
    * columns pair generation needs, nothing else): per vector its id,
    * the vector itself (cosine verification needs it), the norm
    * computed once, and ONE BUCKET COLUMN PER BAND (`bucket_0..`).
    *
    * Why per-band columns instead of an array: the band count becomes
    * self-describing in the schema (readers derive it, nothing is
    * trusted from a side channel), and a re-run at FEWER bands than
    * were staged column-prunes the unused buckets at the parquet scan —
    * stage once at your max bands, then sweep `bands`/`threshold`
    * downward re-reading only what each sweep needs, never re-scanning
    * the corpus. Null id / null vector rows are dropped here (exactly
    * the rows the live path drops), so pairs derived from the stored
    * relation are byte-identical to the live path's. */
  def embeddingBuckets(embeddings: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", planes: Int = 12,
                       dim: Int = 64, bands: Int = 1): DataFrame = {
    val stride = math.max(1, dim / planes)
    require(bands >= 1 && bands <= stride,
      s"embeddingBuckets: bands=$bands out of range — the strided sign " +
        s"buckets admit at most stride=$stride disjoint bands at " +
        s"planes=$planes dim=$dim")
    def dotC(x: Column, y: Column): Column =
      graft.functions.VectorExpressions.vecDot(x, y)
    embeddings
      .filter(col(idCol).isNotNull &&
        Similarity.finiteVectorPredicate(vecCol))
      .select(Seq(col(idCol), col(vecCol),
        sqrt(dotC(col(vecCol), col(vecCol))).as("nrm")) ++
        (0 until bands).map(b =>
          Similarity.lshBucketCol(col(vecCol), planes, dim, b)
            .as(s"bucket_$b")): _*)
  }

  /** Near-dup pairs from an ALREADY-STAGED bucket relation
    * ([[embeddingBuckets]], typically persisted via [[writeSignatures]]'
    * bounded row groups) — the embedding analogue of
    * [[minhashCandidatePairsFromSignatures]]. `bands` defaults to every
    * `bucket_N` column present; asking for fewer uses bands 0..bands-1
    * (the disjoint-component construction makes any prefix a valid
    * banding) and prunes the rest at the scan. Pair output is
    * byte-identical to [[embeddingNearDup]] at the same dials: the
    * member rows entering the shared tail are the same rows (vector and
    * norm round-trip parquet exactly; buckets are longs). */
  def embeddingNearDupFromBuckets(staged: DataFrame, threshold: Double,
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding",
                                  maxBucketSize: Option[Int] = None,
                                  bands: Option[Int] = None): DataFrame = {
    val available = staged.columns.filter(_.matches("bucket_\\d+"))
      .map(_.stripPrefix("bucket_").toInt).sorted
    require(available.nonEmpty && available.sameElements(available.indices),
      s"embeddingNearDupFromBuckets: staged relation has bucket columns " +
        s"[${available.mkString(",")}] — expected contiguous bucket_0..N " +
        s"(was it written by embeddingBuckets?)")
    val nBands = bands.getOrElse(available.length)
    require(nBands >= 1 && nBands <= available.length,
      s"embeddingNearDupFromBuckets: bands=$nBands out of range — the " +
        s"staged relation carries ${available.length} band(s)")
    val (bucketed, groupCols) =
      if (nBands == 1) {
        // single band: the same (no band column) plan shape as the live
        // bands=1 path — group keys match it exactly
        (staged.select(col(idCol).as("id"), col(vecCol).as("vec"),
          col("nrm"), col("bucket_0").as("lsh_bucket")),
          Seq(col("lsh_bucket")))
      } else {
        (staged.select(col(idCol).as("id"), col(vecCol).as("vec"),
          col("nrm"),
          posexplode(array((0 until nBands).map(b =>
            col(s"bucket_$b")): _*)).as(Seq("band", "lsh_bucket"))),
          Seq(col("band"), col("lsh_bucket")))
      }
    vecBucketPairs(bucketed, groupCols, threshold, maxBucketSize,
      dedupAcrossBands = nBands > 1)
  }
}
