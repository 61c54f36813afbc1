package graft.qc

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Hardy-Weinberg equilibrium exact test (Wigginton, Cutler & Abecasis,
  * Am J Hum Genet 2005; DOI 10.1086/429864).
  *
  * Behavioral twin of the reference implementation
  * (`qc/variant_qc.py:110-238`, plpgsql form
  * `validation/sql_functions.py:28-156`) for its edge cases: n=0 → NaN,
  * monomorphic → 1.0, impossible het count → NaN, and the odd-lattice
  * quirk below. ONE deliberate deviation: the downward het recursion
  * uses the paper's denominator (4·(homA+1)·(homB+1), the hom counts at
  * the destination), where the reference divides by the source hom
  * counts and aborts when they reach zero — that skews every
  * even-lattice p-value below the mid point (e.g. (het=0,hr=1,ha=1):
  * reference 0.0, Wigginton 1/3). Values here match the exact
  * lgamma-based DuckDB oracle. The function takes already-aggregated
  * genotype counts, so on Spark it is a scalar UDF applied after the
  * per-variant aggregation (SURVEY §2.11) — not a UDAF.
  */
object Hwe {

  /** Two-sided exact p-value from genotype counts
    * (nHet, nHomRef, nHomAlt).
    *
    * Known reference-faithful quirk: `minHet = |nA−nB| % 2` is always 0
    * (nA+nB = 2n is even), so for ODD allele counts the distribution is
    * computed on the even-het lattice while the observed het count is
    * odd — p_obs reads a never-filled slot and the p-value collapses to
    * 0.0 (`qc/variant_qc.py:177-238` does exactly this). Kept
    * bug-for-bug: behavioral parity with the reference outranks
    * statistical nicety, and the twin is differential-tested. */
  def hwePValue(nHet: Int, nHomRef: Int, nHomAlt: Int): Double = {
    val nCalled = nHet + nHomRef + nHomAlt
    if (nCalled == 0) return Double.NaN

    val nAb = nHet
    val n = nCalled
    val nA = 2 * nHomRef + nAb
    val nB = 2 * nHomAlt + nAb

    if (nA == 0 || nB == 0) return 1.0
    if (nAb > math.min(nA, nB)) return Double.NaN

    val hetProbs = computeHetProbs(n, nA, nB)
    if (hetProbs.isEmpty) return 1.0
    if (nAb >= hetProbs.length) return 1.0

    val pObs = hetProbs(nAb)
    var p = 0.0
    var i = 0
    while (i < hetProbs.length) {
      if (hetProbs(i) <= pObs + 1e-10) p += hetProbs(i)
      i += 1
    }
    math.min(1.0, p)
  }

  /** Heterozygote-count probability distribution under HWE, by the
    * two-directional recursion from the mid point
    * (`qc/variant_qc.py:162-238`). */
  private[qc] def computeHetProbs(n: Int, nA: Int, nB: Int): Array[Double] = {
    if (nA + nB != 2 * n) return Array.empty
    val minHet = math.abs(nA - nB) % 2
    val maxHet = math.min(nA, nB)
    if (maxHet < minHet) return Array.empty
    val nHetValues = (maxHet - minHet) / 2 + 1
    if (nHetValues <= 0) return Array.empty

    val probs = new Array[Double](maxHet + 1)

    var mid = (minHet + maxHet) / 2
    if (mid % 2 != minHet % 2) mid += (if (mid < maxHet) 1 else -1)
    if (mid > maxHet || mid < minHet) mid = minHet

    probs(mid) = 1.0
    var total = 1.0

    var cur = mid
    var break1 = false
    while (cur > minHet && !break1) {
      val prev = cur - 2
      if (prev < 0) break1 = true
      else {
        val nAa = (nA - cur) / 2
        val nBb = (nB - cur) / 2
        // canonical Wigginton: the denominator hom counts are those at
        // the DESTINATION het count (nAa+1, nBb+1 — P(h-2)/P(h) =
        // h(h-1) / (4(homA+1)(homB+1))), never zero, so no early break.
        // The reference's recursion divides by the SOURCE hom counts and
        // bails when they hit zero (`variant_qc.py:201-214`) — a
        // documented deviation we do NOT reproduce: it skews every
        // even-lattice tail below the mid point.
        probs(prev) = probs(cur) * cur * (cur - 1) / (4.0 * (nAa + 1) * (nBb + 1))
        total += probs(prev)
        cur = prev
      }
    }

    cur = mid
    var break2 = false
    while (cur < maxHet && !break2) {
      val next = cur + 2
      if (next > maxHet) break2 = true
      else {
        val nAa = (nA - cur) / 2
        val nBb = (nB - cur) / 2
        if (nAa < 0 || nBb < 0) break2 = true
        else {
          probs(next) = probs(cur) * 4.0 * nAa * nBb / (next.toDouble * (next - 1))
          total += probs(next)
          cur = next
        }
      }
    }

    if (total > 0) {
      var i = 0
      while (i < probs.length) { probs(i) /= total; i += 1 }
    }
    probs
  }

  /** Column form taking (nHet, nHomRef, nHomAlt). */
  val hweUdf = udf { (nHet: Int, nHomRef: Int, nHomAlt: Int) =>
    hwePValue(nHet, nHomRef, nHomAlt)
  }

  def hweCol(nHet: Column, nHomRef: Column, nHomAlt: Column): Column =
    hweUdf(nHet, nHomRef, nHomAlt)

  /** SQL surface mirrors the plpgsql signature
    * `hwe_exact_test(n_aa, n_ab, n_bb)` — note the argument order
    * difference vs the Python helper (`sql_functions.py:231-246`). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("hwe_exact_test",
      (nAa: Int, nAb: Int, nBb: Int) => hwePValue(nAb, nAa, nBb))
}
