package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-busting salted equi-join: when a handful of hot keys dominate a
  * shuffle join, the hot key's partition becomes the straggler that
  * determines job wall-clock (at 100 TB, one 10%-hot key means one task
  * doing 10% of ALL the work). Salting assigns big-side rows
  * round-robin to `salts` sub-partitions and replicates the small side
  * once per salt; the join key becomes (key, salt), spreading every hot
  * key over `salts` tasks — even when the hot rows are bit-identical (a
  * row-hash salt would send all duplicates to one salt and keep the
  * straggler). The salt only routes rows — every salt joins the same
  * replicated small side — so the result is row-identical to the plain
  * join regardless of task retries re-salting differently.
  *
  * When the small side fits the broadcast threshold Catalyst will
  * broadcast the replicated side and the salt costs nothing (a
  * broadcast join has no skew problem to begin with); the salt pays off
  * exactly when both sides must shuffle.
  *
  * Complements AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on in our sessions): AQE
  * splits oversized SORT-MERGE partitions after the map stage; explicit
  * salting also covers shuffled-hash joins, handles extreme single-key
  * skew beyond AQE's split factor, and works on static plans. Use for
  * known-skewed keys; salts ≈ (hot-key share × total cores).
  */
object SaltedJoin {

  /** Inner equi-join of a skewed `big` side against a `small` side.
    * Column names must be disjoint (like a plain join with distinct
    * schemas); output columns = big ++ small-minus-key. */
  def inner(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = big.withColumn("_gsalt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small.withColumn("_gsalt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    salted.join(replicated,
        salted("_gsalt") === replicated("_gsalt") &&
          bigKey === replicated(smallKey))
      .drop("_gsalt").drop(smallKey)
  }
}
