package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join split (on by
  * default) handles most runtime skew; explicit salting is the tool for
  * the catastrophic case — a single key carrying more rows than an
  * executor can hold — or for engines/pipelines where AQE is off. The
  * salted join is exactly equivalent to the unsalted one (verified by the
  * q20 oracle): it only changes the partitioning key.
  */
object Skew {

  /** Inner equi-join `big ⋈ dim` on `key`, with `big`'s hot keys split
    * across `salts` shuffle partitions.
    *
    * `saltBy` must be a deterministic expression over `big`'s row (e.g. a
    * unique id column) — task retries then re-derive the same salt, which
    * `rand()` would not (a retried map task would re-salt rows differently
    * and double-count or drop them under shuffle-fetch failures).
    *
    * The dim side is replicated `salts`× (explode of a literal range — no
    * shuffle on the replicate itself), so choose `salts` ≈ hot-key rows /
    * healthy-partition rows, not larger: replication is the cost.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame,
      bigKey: String, dimKey: String,
      saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("_salt_l", pmod(xxhash64(saltBy), lit(salts)))
    val dimS = dim.withColumn("_salt_r",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(dimS,
        bigS(bigKey) === dimS(dimKey) &&
          bigS("_salt_l") === dimS("_salt_r"))
      .drop("_salt_l", "_salt_r")
  }
}
