package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md "Optimize for scale":
  * skewed keys -> salting or AQE skew-join). AQE handles skew for
  * sort-merge joins at runtime; explicit salting is the static
  * alternative that also works for hash joins and pre-AQE plans.
  *
  * The big (skewed) side gets a deterministic salt derived from a
  * unique column (NOT rand() — retries/speculative tasks must agree);
  * the small side is replicated once per salt bucket. The join then
  * distributes each hot key over `buckets` reducers.
  */
object Salting {

  /** Equi-join `big ⋈ small` on bigKey == smallKey, with the hot keys
    * spread over `buckets` partitions. `bigUnique` is any column that
    * distinguishes rows within a key (used to derive the salt
    * deterministically). */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, bigUnique: Column,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    // The small side is replicated `buckets` times, so any join type that
    // emits unmatched SMALL-side rows (right/full outer) would duplicate
    // them once per salt bucket. Restrict to the types whose output is
    // driven by the big side.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/semi/anti join types, got: $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(bigUnique), lit(buckets.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"),
        joinType)
      .drop("__salt")
  }
}
