package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the hot side, replicate the small
  * side. AQE's skew-join handling covers sort-merge joins at runtime;
  * this explicit form is for the planned-ahead case (a known hot key
  * set at 100 TB, e.g. a null-heavy or celebrity key) and for
  * broadcast-ineligible dimension sizes.
  *
  * `bigSalted ⋈ smallReplicated on (key, salt)`: each of the hot key's
  * rows lands in one of `buckets` reducers instead of one; the small
  * side is replicated `buckets`×, which is the explicit price.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spread over `buckets` salt
    * values. Result equals the plain inner join (row multiset).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
