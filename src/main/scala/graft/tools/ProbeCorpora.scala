package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The HARD ANN-recall corpus construction, shared by the bench's
  * per-round `recall_hard` gate (`Bench`, src/main) and the one-off
  * measurement probe (`HardRecallProbe`, src/test) so the two can never
  * drift apart: i.i.d. uniform noise in [-1,1]^dim — no cluster
  * structure, IVF's honest worst case — with `plants` PLANTED
  * near-neighbors per query (ids q+1..q+plants perturb query q's base
  * vector by `eps`), queries at ids divisible by `qStride`.
  * Deterministic (xxhash64-derived components, no RNG state), so a
  * gate value is reproducible across sessions and engines.
  */
object ProbeCorpora {

  /** Uniform component in [-1,1] derived from (seed, j). */
  private def u(dim: Int)(seed: Column, j: Column): Column =
    (pmod(xxhash64(seed * dim.toLong + j), lit(2000001L)) - 1000000L)
      .cast("double") / 1000000.0

  /** (vec_id, embedding) rows, localCheckpointed so corpus generation
    * is excluded from whatever the caller times. `qStride` must exceed
    * `plants` — otherwise planted ids spill into neighboring queries'
    * strides and [[isPlantedNeighbor]] misclassifies them. */
  def hardCorpus(spark: SparkSession, n: Long, dim: Int = 64,
                 qStride: Long, plants: Int = 5,
                 eps: Double = 0.15): DataFrame = {
    require(qStride > plants,
      s"hardCorpus: qStride=$qStride must exceed plants=$plants (ids " +
        "q+1..q+plants must stay inside query q's stride)")
    val anchor = col("id") - (col("id") % qStride)
    val isPlanted = (col("id") % qStride).between(1, plants)
    val base = when(isPlanted, anchor).otherwise(col("id"))
    val emb = transform(sequence(lit(0), lit(dim - 1)), j =>
      (u(dim)(base, j) +
        when(isPlanted, u(dim)(col("id"), j) * eps).otherwise(lit(0.0)))
        .cast("float"))
    spark.range(n)
      .select(col("id").as("vec_id"), emb.as("embedding"))
      .localCheckpoint()
  }

  /** Is `nb` one of query `q`'s planted near-neighbors (or `q`
    * itself)? The classifier the planted-recall metric filters truth
    * rows with — q's plants are exactly ids q+1..q+plants. */
  def isPlantedNeighbor(plants: Int)(q: Long, nb: Long): Boolean =
    nb == q || (nb - q >= 1 && nb - q <= plants)
}
