package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus, ranked per query. Scale path: random-
  * hyperplane LSH buckets turn candidate generation into an equi-join;
  * with B planes the corpus shards into 2^B buckets and only same-bucket
  * pairs are scored (IVF-style recall/cost trade controlled by B).
  *
  * The dot product is the native codegen'd VectorDot expression
  * (left-to-right sum, deterministic, no UDF); ranking is the map-side
  * bounded-heap top-k aggregate ([[rankTopK]]) rather than a per-query
  * window, so the shuffle carries k survivors per map partition per
  * query instead of every scored candidate.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * The dot product is the native codegen'd VectorDot expression
    * (left-to-right sum — same order as an interpreted fold, so oracle
    * parity holds). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      graft.functions.VectorExpressions.vecDot(x, y)
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na > 0 && nb > 0, dot(a, b) / (na * nb))
  }

  private def dotCol(x: Column, y: Column): Column =
    graft.functions.VectorExpressions.vecDot(x, y)

  /** The similarity DOMAIN predicate: a vector participates only if it
    * is non-NULL with a positive, finite squared norm. Everything else
    * — NULL rows, zero vectors (no direction), vectors with NaN/Inf
    * components (failed encoder batches, at corpus scale a certainty) —
    * is excluded at every operator entry. This is not just hygiene:
    * Spark orders NaN GREATER than every double, so one NaN vector
    * would rank FIRST in every top-k it touches and poison the IVF
    * centroid it lands on; DuckDB's list_cosine_similarity ERRORS
    * outright on such input (r18 adversarial-embeddings find,
    * tools/adversarial_corpus.py). The oracles carry the same filter
    * (isfinite(Σx²) AND Σx² > 0). NaN needs the explicit isnan guard
    * precisely because of the NaN-is-greatest ordering: NaN > 0 is
    * TRUE in Spark SQL. */
  def finiteVectorPredicate(vecCol: String): Column = {
    val v = col(vecCol)
    val n2 = dotCol(v, v)
    v.isNotNull && !isnan(n2) && n2 > 0 &&
      n2 < lit(Double.PositiveInfinity)
  }

  /** [[finiteVectorPredicate]] as a relation filter. */
  def finiteVectors(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.filter(finiteVectorPredicate(vecCol))

  /** Shared ranking tail of the three top-k operators: the k best
    * candidates per query from a `scored` relation holding (query_id,
    * neighbor_id, cosine). A map-side bounded-heap aggregate
    * ([[graft.functions.TopKByScoreAgg]]) replaces the former
    * `row_number()` window: the window shuffled EVERY scored candidate
    * into |queries| sort partitions (~60M rows into 100 partitions at
    * the 10M-doc bench point — a parallelism cap and a skew point at
    * cluster scale), where the partial aggregate ships only each map
    * partition's k survivors per query. Ordering is bit-identical to
    * `round(cosine,5) DESC, neighbor_id ASC` (differential-spec-pinned);
    * ids surface as bigint. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    // ids surface as bigint; a non-integral id column would cast to
    // all-NULL neighbor ids silently (and collapse the id tie-break) —
    // fail loudly instead
    val idType = scored.schema("neighbor_id").dataType
    require(isIntegralId(idType),
      s"top-k ranking requires an integral id column, got $idType")
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKExpressions.topKByScore(
        col("cosine"), col("neighbor_id").cast("long"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(col("query_id"), col("_e.neighbor_id").as("neighbor_id"),
        col("_e.cosine").as("cosine"),
        (col("_pos") + 1).cast("int").as("rank"))
  }

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows (self excluded). Queries side is broadcast; ranking is the
    * map-side top-k aggregate with deterministic tie-break on id. Norms
    * are precomputed per side so each pair pays ONE dot product (the
    * naive cosine() per pair costs three interpreted HOF folds). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val q = finiteVectors(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", sqrt(dotCol(col("q_vec"), col("q_vec"))))
    val scored = finiteVectors(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", sqrt(dotCol(col("c_vec"), col("c_vec"))))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("q_norm") > 0 && col("c_norm") > 0,
          dotCol(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
    rankTopK(scored, k)
  }

  /** Add an `lsh_bucket` column: sign pattern of `planes` strided
    * coordinates packed into a long — axis-aligned random-hyperplane LSH.
    * Coordinate signs are deterministic and engine-portable (an external
    * oracle reproduces the buckets exactly), where seeded-Gaussian
    * hyperplanes are not; for roughly isotropic embeddings each
    * coordinate sign splits the corpus ~50/50, which is the same
    * balance property the Gaussian planes bought.
    *
    * `offset` selects an independent BAND: band b reads coordinates
    * {b, stride+b, 2*stride+b, …} — disjoint from every other offset
    * below `stride`, which is what makes multi-band recall compose as
    * 1−(1−r)^bands (see [[graft.pipeline.Dedup.embeddingNearDup]]).
    * offset=0 is bit-identical to the historical single-band bucket. */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Int,
                    dim: Int = 64, offset: Int = 0): DataFrame =
    df.withColumn("lsh_bucket", lshBucketCol(col(vecCol), planes, dim, offset))

  /** The bucket as a bare Column (for callers that build several bands
    * from one scan instead of unioning per-band plans — a union of the
    * same source evaluates it once per child). */
  def lshBucketCol(vec: Column, planes: Int, dim: Int = 64,
                   offset: Int = 0): Column = {
    val stride = math.max(1, dim / planes)
    // only the offset is validated: planes overstating the real vector
    // length keeps its historical defined-but-degraded behavior
    // (element_at past the end reads null → constant bit)
    require(offset >= 0 && offset < stride,
      s"lshBucketCol: offset $offset out of range for planes=$planes " +
        s"dim=$dim (stride $stride — at most $stride disjoint bands)")
    val bits: Seq[Column] = (0 until planes).map { i =>
      when(element_at(vec, i * stride + offset + 1) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Train a coarse quantizer for `ivfTopK` with spherical k-means over
    * a BOUNDED sample of the corpus (the standard IVF practice — e.g.
    * faiss trains its quantizer on a sample, not the full set).
    *
    * Deterministic by construction: the sample is the first `sampleSize`
    * vectors by id, initialization is farthest-point (start from the
    * first sample vector, then repeatedly add the sample vector least
    * similar to its nearest chosen centroid — separates clusters even
    * when the id order is adversarial), and Lloyd iterations break
    * assignment ties toward the smaller centroid id. The sample is
    * collected to the driver — an explicit, bounded collect
    * (`sampleSize` vectors, not data-sized); training is a driver-side
    * loop, so no per-iteration Spark job or shuffle. Returns
    * (cent_id, cent_vec) in the shape `ivfTopK`'s `centroids` expects;
    * every downstream step (assign, probe, rank) is identical to the
    * sampled quantizer's.
    */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 10,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      sampleSize: Int = 8192): DataFrame = {
    val spark = corpus.sparkSession
    val sample: Array[Array[Double]] = finiteVectors(corpus, vecCol)
      .orderBy(col(idCol))
      .limit(sampleSize).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "kmeansCentroids: empty corpus")
    val k = math.min(nCentroids, sample.length)
    val dim = sample(0).length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }; s
    }
    // r18 optimization: norms CACHED instead of recomputed inside every
    // cosine — the former cos() folded both self-dot-products per call,
    // 3 dot products per (sample, centroid) pair across init + `iters`
    // Lloyd passes (~1G single-threaded mul-adds at the 8192/64
    // defaults, paid by every IVF bench row and recall gate). The
    // cached value is the identical sqrt(dot(v,v)) double and the
    // cosine expression/order is unchanged, so centroids are
    // bit-identical (spec-pinned by the existing IVF differentials).
    val sampleNorm = sample.map(v => math.sqrt(dot(v, v)))
    def cosWith(i: Int, c: Array[Double], cNorm: Double): Double =
      if (sampleNorm(i) > 0 && cNorm > 0) dot(sample(i), c) / (sampleNorm(i) * cNorm)
      else -1.0
    // farthest-point init, incremental: track each sample's similarity to
    // its nearest chosen centroid and refresh it against only the newest
    // centroid — O(k·n·dim), not O(k²·n·dim)
    val cents = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val nearestSim = Array.fill(sample.length)(-2.0)
    def add(c: Array[Double]): Unit = {
      cents += c.clone()
      val cNorm = math.sqrt(dot(c, c))
      var i = 0
      while (i < sample.length) {
        val s = cosWith(i, c, cNorm)
        if (s > nearestSim(i)) nearestSim(i) = s
        i += 1
      }
    }
    add(sample(0))
    while (cents.length < k) {
      var worst = 0; var worstSim = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        if (nearestSim(i) < worstSim) { worstSim = nearestSim(i); worst = i }
        i += 1
      }
      add(sample(worst))
    }
    // Lloyd iterations; an emptied cluster keeps its previous centroid
    (0 until iters).foreach { _ =>
      val centNorm = cents.map(c => math.sqrt(dot(c, c))).toArray
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var si = 0
      while (si < sample.length) {
        val v = sample(si)
        var best = 0; var bestSim = -2.0
        var c = 0
        while (c < k) {
          val s = cosWith(si, cents(c), centNorm(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
        si += 1
      }
      (0 until k).foreach { c =>
        if (counts(c) > 0)
          cents(c) = Array.tabulate(dim)(i => sums(c)(i) / counts(c))
      }
    }
    import spark.implicits._
    cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }.toSeq
      .toDF("cent_id", "cent_vec")
  }

  /** IVF-style ANN top-k: a coarse quantizer partitions the corpus into
    * `nCentroids` inverted lists; each query probes its `nProbe` nearest
    * lists and ranks only their members — the classic recall/cost dial
    * (recall grows with nProbe, cost ~ nProbe/nCentroids of the corpus).
    *
    * The default quantizer is sampled, not trained: the first
    * `nCentroids` corpus vectors (by id) serve as centroids. That keeps
    * the operator deterministic and externally verifiable end-to-end
    * (the DuckDB oracle reproduces it exactly); pass
    * `centroids = Some(kmeansCentroids(...))` for the trained quantizer
    * — every downstream step (assign, probe, rank) is identical.
    *
    * Scale shape: corpus assignment is a per-row codegen'd argmax over
    * the driver-collected centroids (a bare map — no crossJoin, no
    * aggregate, no shuffle); the query probes keep the broadcast window
    * (|queries|×nCentroids rows); the probe join broadcasts the probed
    * queries so the corpus never shuffles; ranking is a per-query window
    * over ~nProbe/nCentroids of the corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nCentroids: Int = 8, nProbe: Int = 2,
              centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // domain filter FIRST: it also protects the default quantizer — a
    // zero/NaN vector among the first nCentroids ids would otherwise
    // become a centroid no valid vector can score against (and a NaN
    // centroid out-ranks every real one under NaN-is-greatest)
    val corpusD = finiteVectors(corpus, vecCol)
    val queriesD = finiteVectors(queries, vecCol)
    // the default quantizer is literally "the first nCentroids vectors
    // by id" — orderBy + limit, NOT filter(id < n), which assumes dense
    // 0-based ids and silently returns an EMPTY result set for a corpus
    // whose ids start anywhere else
    val centDf = centroids.getOrElse(corpusD.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec")))
    val cent = centDf
      .withColumn("_cent_norm", sqrt(dotCol(col("cent_vec"), col("cent_vec"))))

    // cosine with norms computed ONCE per side (each side's norm column
    // materializes before the crossJoin, instead of re-evaluating two
    // self-dot-products inside every (row, centroid) pair of the
    // full-corpus assignment pass); ties break toward the smaller
    // centroid id
    def scoredAgainstCentroids(df: DataFrame, vec: String): DataFrame = df
      .withColumn("_row_norm", sqrt(dotCol(col(vec), col(vec))))
      .crossJoin(broadcast(cent))
      .withColumn("_cd",
        when(col("_row_norm") > 0 && col("_cent_norm") > 0,
          dotCol(col(vec), col("cent_vec")) /
            (col("_row_norm") * col("_cent_norm"))))

    def nearestCentroids(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(round(col("_cd"), 5).desc, col("cent_id"))
      scoredAgainstCentroids(df, vec).withColumn("_cr", row_number().over(w))
        .filter(col("_cr") <= n)
        .select(col(id), col("cent_id"))
    }

    // CORPUS assignment is argmax (n=1), and the shape matters at scale:
    // r11's crossJoin + groupBy-max materialized corpus×nCentroids rows
    // (10M docs × 64 centroids = 640M) and shuffled the WHOLE corpus —
    // vectors included — through the per-id hash aggregate. The argmax
    // is now a per-row codegen'd expression over the driver-collected
    // centroids (NearestCentroid): zero shuffle, zero extra rows, the
    // same 640M dot products in one tight loop. The collect is bounded
    // by nCentroids — the budget kmeansCentroids already spends — and
    // its semantics are pinned bit-for-bit to the old plan (same dot
    // order, same round-to-5 comparison key, same smaller-id tie-break,
    // same all-null fallback; IvfSpec carries the differential twin).
    // One semantic note vs the old groupBy: a corpus with DUPLICATE ids
    // keeps each row as its own candidate (like bruteForce/lshTopK do)
    // instead of collapsing to one arbitrary row per id.
    // same integral-id require as rankTopK, at the point of damage: a
    // non-integral cent_id would cast("long") to all-NULL and getLong
    // silently read 0 for every centroid — rankTopK's downstream check
    // happens to reject it today, but that is incidental coupling
    val centIdType = centDf.schema("cent_id").dataType
    require(isIntegralId(centIdType),
      s"ivfTopK requires an integral cent_id column, got $centIdType")
    val centRows = centDf
      .select(col("cent_id").cast("long"), col("cent_vec")).collect()
    val cset = graft.functions.CentroidSet.fromRows(
      centRows.toSeq.map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Any](1))))
    val lists = corpusD
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cent_id",
        graft.functions.VectorExpressions.nearestCentroid(col("c_vec"), cset))
      .withColumn("c_norm", sqrt(dotCol(col("c_vec"), col("c_vec"))))

    val probes = nearestCentroids(
      queriesD.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec", nProbe)
    val q = queriesD.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .join(probes, "query_id")
      .withColumn("q_norm", sqrt(dotCol(col("q_vec"), col("q_vec"))))

    // queries × nProbe is the small side — broadcast it so the corpus
    // lists stream through without a cent_id shuffle (cent_id has only
    // nCentroids distinct values: a sort-merge join on it would both
    // shuffle the whole corpus and skew)
    val scored = lists.join(broadcast(q), Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("q_norm") > 0 && col("c_norm") > 0,
          dotCol(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
    rankTopK(scored, k)
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's bucket.
    * Same output schema as bruteForceTopK (rank within found candidates);
    * recall < 1 by construction — the scale path when the corpus no
    * longer fits a broadcast cross-join. Size `planes` with the corpus:
    * candidates per query ≈ n / 2^planes, so fixed planes means per-
    * query cost grows linearly with n — planes ≈ log2(n / targetBucket)
    * holds it constant. For large corpora prefer [[ivfTopK]], whose
    * nProbe/nCentroids dial controls recall independently of n. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              planes: Int = 8): DataFrame = {
    val c = withLshBucket(finiteVectors(corpus, vecCol), vecCol, planes)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("lsh_bucket"))
      .withColumn("c_norm", sqrt(dotCol(col("c_vec"), col("c_vec"))))
    val q = withLshBucket(finiteVectors(queries, vecCol), vecCol, planes)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("lsh_bucket"))
      .withColumn("q_norm", sqrt(dotCol(col("q_vec"), col("q_vec"))))
    // queries are the small side — PIN the broadcast (same contract as
    // ivfTopK's probe join): lsh_bucket has only 2^planes distinct
    // values, so a sort-merge join on it would both shuffle the whole
    // corpus and skew; AQE usually picks BHJ here, but the scale shape
    // must not depend on a runtime size estimate
    val scored = c.join(broadcast(q), Seq("lsh_bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("q_norm") > 0 && col("c_norm") > 0,
          dotCol(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
    rankTopK(scored, k)
  }
}
