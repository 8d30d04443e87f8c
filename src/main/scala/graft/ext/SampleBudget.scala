package graft.ext

/** Absolute-budget deterministic sampling for quality-measurement
  * probes (q_lsh_recall, q_semdedup_recall).
  *
  * A recall probe needs EXACT pairwise ground truth over a sample; a
  * FRACTIONAL sample (hash % k == 0 with fixed k) grows linearly with
  * the corpus and its pairwise truth quadratically — the one plan
  * shape that silently stops scaling. Deriving the modulus from a
  * corpus count caps the expected sample at `budget` rows at ANY
  * corpus size, so the truth side is O(budget²) forever.
  *
  * Both engines (Spark filter and DuckDB oracle scalar subquery)
  * compute the same ceil-division modulus, so the sampled subset is
  * bit-identical.
  */
object SampleBudget {

  /** ceil(n / budget), min 1 — the `hash % modulus == 0` divisor that
    * keeps the expected sample size at or under `budget`. */
  def modulus(n: Long, budget: Long): Long = {
    require(budget >= 1, s"non-positive budget: $budget")
    math.max(1L, (n + budget - 1) / budget)
  }
}
