package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, stats/quality scoring, language ID, fingerprinting,
  * MinHash signatures, SimHash. (North-star ext surface; SURVEY.md §7.1
  * `ext/`.)
  *
  * Everything here is pure column expressions (higher-order array
  * functions) — per-row, narrow, whole-stage-codegen friendly. No
  * shuffles happen until a caller groups/joins, so these scale linearly
  * to 100 TB of documents.
  *
  * Hash choice: md5-over-token strings. Deliberate — it is available
  * with identical semantics in Spark, DuckDB (oracle parity) and most
  * engines, and lexicographic MIN over md5 hex strings is a valid
  * uniform MinHash. Swap in xxhash64 for raw speed if oracle parity is
  * not needed.
  */
object TextOps {

  /** Whitespace tokens (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Set-normalized document fingerprint: md5 over the sorted distinct
    * token set. Robust to token order and repetition — catches the
    * shuffled/repeated near-duplicates exact text-hashing misses. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(distinctTokens(text)), " "))

  /** MinHash signature: numHashes lexicographic minima of per-token
    * md5(tok + "#" + i). Computed per row with higher-order functions —
    * no explode, no shuffle. */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val toks = distinctTokens(text)
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(toks,
        t => md5(concat(t, lit("#"), i.cast("string"))))))
  }

  /** LSH band keys from a MinHash signature: one md5 per band over its
    * rows. Docs agreeing on any band key are candidate duplicates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))

  /** 16-bit SimHash over the distinct token set. Bit b of each token is
    * drawn from md5(token); the sketch bit is the sign of the +1/-1 vote
    * sum. Accumulated per row via aggregate+zip_with (no shuffle). */
  def simhash16(text: Column): Column = {
    // Hash each token ONCE (higher-order lambdas defeat Catalyst
    // subexpression elimination, so a naive per-bit md5 reference would
    // evaluate md5 16x per token), then derive the 16 +1/-1 votes from
    // the stored hex: bit b = bit (b%4) of nibble (b/4).
    val hashed = transform(distinctTokens(text), t => md5(t))
    val votes = (h: Column) =>
      flatten(transform(sequence(lit(0), lit(3)), i => {
        val nib = conv(h.substr(lit(1) + i.cast("int"), lit(1)), 16, 10)
          .cast("int")
        transform(sequence(lit(0), lit(3)), k => {
          val bit = floor(nib / pow(lit(2), k)).cast("int") % 2
          (bit * 2 - 1).cast("long")
        })
      }))
    val sums = aggregate(hashed,
      array_repeat(lit(0L), 16),
      (acc, h) => zip_with(acc, votes(h), (x, y) => x + y))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(15)),
        (s, b) => when(s > 0, pow(lit(2.0), b).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Language-ID by marker-token overlap; deterministic priority order on
    * ties, "und" when nothing matches. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  def langGuess(text: Column): Column = {
    val toks = distinctTokens(text)
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> size(array_intersect(toks, array(ms.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
