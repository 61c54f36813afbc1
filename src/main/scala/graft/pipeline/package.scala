package graft

import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

package object pipeline {

  /** Id columns the pipeline operators can carry through a lossless
    * `cast("long")`: the sorted-run pair generators (minhash/simhash) and
    * the ANN ranking/centroid paths all process ids as longs internally,
    * and a non-integral id would cast to all-NULL silently. ONE
    * definition so the dispatch (sorted vs grouped pair-gen) and the
    * loud `require`s (rankTopK, ivfTopK) can never diverge on which id
    * types qualify. */
  private[graft] def isIntegralId(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}
