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

  /** 32-bit base hash of a token: integer value of the first 8 md5
    * nibbles. One md5 per token; reproducible in any engine that can
    * parse hex. Evaluated by the fused native expression
    * [[graft.functions.TokenHash32]] (same value as
    * `conv(md5(t).substr(1, 8), 16, 10)` with zero intermediate
    * strings; `HofParitySpec` evaluates the literal HOF-md5 SQL form
    * side by side on edge inputs to pin the value parity). */
  def tokenHash32(t: Column): Column = graft.functions.TokenHash32.of(t)

  /** MinHash signature over any element array: numHashes minima of
    * affine re-hashes h_j = (h * (2j+1) + 12345j + 7) mod p over each
    * element's 32-bit base hash. ONE md5 per element (the affine family
    * is integer-exact across engines); fused per row by
    * [[graft.functions.MinHashSig]] — no explode, no shuffle, no
    * per-hash lambda re-entry.
    *
    * An EMPTY element set has no signature (null) — returning an
    * untouched seed would give every empty doc the SAME signature,
    * making all sub-w-token docs spurious mutual duplicates. Null drops
    * them from banding; dedup callers keep them as singletons. */
  def minhashOf(elems: Column, numHashes: Int): Column =
    graft.functions.MinHashSig.of(elems, numHashes)

  /** MinHash over the distinct TOKEN set — robust to word order and
    * repetition. For the canonical Broder form over w-shingles (order
    * sensitive), pass shingle arrays to [[minhashOf]]. */
  def minhashSignature(text: Column, numHashes: Int): Column =
    minhashOf(distinctTokens(text), numHashes)

  /** Distinct word w-shingles via aligned slices + zip_with (the
    * free-variable-in-lambda per-element re-evaluation trap rules out
    * element_at forms — see q_decontamination). Supports w in 2..4. */
  def shingles(text: Column, w: Int): Column = {
    require(w >= 2 && w <= 4, "shingle width 2..4")
    val toks = tokens(text)
    val n = greatest(size(toks) - (w - 1), lit(0))
    val parts = (0 until w).map(i => slice(toks, lit(i + 1), n))
    array_distinct(parts.reduce((acc, p) =>
      zip_with(acc, p, (a, b) => concat(a, lit(" "), b))))
  }

  /** LSH band keys from a MinHash signature: one md5 per band over its
    * rows (comma-joined decimal slice, fused by
    * [[graft.functions.BandKeys]]). Docs agreeing on any band key are
    * candidate duplicates. A null signature (empty element set, see
    * [[minhashOf]]) yields null — NOT an array of md5("") keys, which
    * would silently bucket every empty doc together. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.BandKeys.of(sig, bands, rowsPerBand)

  /** 16-bit SimHash over the distinct token set. The 16 vote bits come
    * from the token's 32-bit base hash (bit b of tokenHash32); the
    * sketch bit is the sign of the +1/-1 vote sum. Fused per row by
    * [[graft.functions.SimHash16]] (one digest + 16 integer votes per
    * token, no per-bit lambda re-entry; `HofParitySpec` pins value
    * parity against the literal per-bit HOF-SQL form, incl. the
    * documented null-element deviation). */
  def simhash16(text: Column): Column =
    graft.functions.SimHash16.of(distinctTokens(text))

  /** Same-source near-duplicate candidate pairs within Hamming distance
    * `maxHd` on a `bits`-wide SimHash sketch, via pigeonhole banding:
    * split the sketch into `bands` equal bit-bands; any pair with
    * hd <= maxHd < bands must agree EXACTLY on at least one band, so
    * candidates come from an equi-join on (source, band, band_bits)
    * instead of enumerating all same-source pairs (O(n^2) per source).
    * The codegen'd HammingDistance expression then verifies hd <= maxHd,
    * so the result set is IDENTICAL to the all-pairs formulation.
    *
    * Scale note: bucket count is bands * 2^(bits/bands) per source; at
    * 100 TB use a 64-bit sketch with 4x16-bit bands (65536 values per
    * band) so buckets stay small — the operator shape is unchanged.
    * Output: id1 < id2, hd. */
  def simhashBandPairs(docs: DataFrame, idCol: String, srcCol: String,
      shCol: String, bits: Int = 16, bands: Int = 4, maxHd: Int = 3): DataFrame = {
    require(bands > maxHd, "pigeonhole needs bands > maxHd")
    require(bits % bands == 0, "bits must divide evenly into bands")
    val bandBits = bits / bands
    import graft.functions.HammingDistance.hamming
    val norm = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
      col(shCol).as("sh"))
    val bandArr = transform(sequence(lit(0), lit(bands - 1)),
      b => floor(col("sh") / pow(lit(2.0), b * bandBits)).cast("long")
        % lit(1L << bandBits))
    val banded = norm.select(col("id"), col("src"), col("sh"),
      posexplode(bandArr).as(Seq("band", "bb")))
    banded.as("a").join(banded.as("b"),
        col("a.src") === col("b.src") && col("a.band") === col("b.band") &&
          col("a.bb") === col("b.bb") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hamming(col("a.sh"), col("b.sh")).as("hd"))
      .filter(col("hd") <= maxHd)
      .distinct() // a pair agreeing on several bands counts once
  }

  /** Canonical English stopword probe set — the single definition
    * behind the lang-id "en" markers, q_text_stats' stop_ratio, and
    * the Gopher gate (whose oracle SQL interpolates it, so Spark and
    * DuckDB can never disagree on the list). */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "is")

  /** Language-ID by marker-token overlap; deterministic priority order on
    * ties, "und" when nothing matches. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
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

  /** Register the text operators as SQL functions (SURVEY §2.10/§2.11
    * SQL surface), as Spark 4 SQL UDFs (`CREATE TEMPORARY FUNCTION ...
    * RETURN <expr>`): the bodies are inlined into the plan at analysis
    * time, so they stay inside whole-stage codegen — unlike Scala UDFs.
    * Bodies mirror the Column API exactly; `SqlFunctionsSpec` pins the
    * parity. (Building them via the expression-registry bridge instead
    * fails: a composed Column converts to an unresolved
    * ColumnNodeExpression the analyzer won't resolve from a registry
    * builder — only concrete expressions like HammingDistance can go
    * that route.) */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hash32 = "CAST(conv(substring(md5(%s), 1, 8), 16, 10) AS BIGINT)"
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_fingerprint(t STRING)
         RETURNS STRING RETURN
         md5(array_join(array_sort(array_distinct(split(t, ' '))), ' '))""")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_token_hash32(t STRING)
         RETURNS BIGINT RETURN ${hash32.format("t")}""")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_minhash(t STRING, numHashes INT)
         RETURNS ARRAY<BIGINT> RETURN
         aggregate(
           transform(array_distinct(split(t, ' ')), tk -> ${hash32.format("tk")}),
           array_repeat(CAST(9223372036854775807 AS BIGINT), numHashes),
           (acc, h) -> zip_with(acc,
             transform(sequence(0, numHashes - 1),
               j -> (h * (CAST(j AS BIGINT) * 2 + 1) + CAST(j AS BIGINT) * 12345 + 7) % 1000000007),
             (a, b) -> least(a, b)))""")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_simhash16(t STRING)
         RETURNS BIGINT RETURN
         aggregate(
           zip_with(
             aggregate(
               transform(array_distinct(split(t, ' ')), tk -> ${hash32.format("tk")}),
               array_repeat(CAST(0 AS BIGINT), 16),
               (acc, h) -> zip_with(acc,
                 transform(sequence(0, 15),
                   b -> (CAST(floor(h / power(2, b)) AS BIGINT) % 2) * 2 - 1),
                 (x, y) -> x + y)),
             sequence(0, 15),
             (s, b) -> CASE WHEN s > 0 THEN CAST(power(2, b) AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)""")
    val score = (ms: Seq[String]) =>
      s"size(array_intersect(array_distinct(split(t, ' ')), " +
        s"array(${ms.map("'" + _ + "'").mkString(", ")})))"
    val scores = langMarkers.map { case (l, ms) => l -> score(ms) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores
      .map { case (l, s) => s"WHEN $s = $best THEN '$l'" }.mkString(" ")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_lang_guess(t STRING)
         RETURNS STRING RETURN
         CASE WHEN $best = 0 THEN 'und' $cases ELSE 'und' END""")
  }

  /** Content-defined chunking (CDC): chunk boundaries fall where a
    * token's hash lands in a fixed residue class (tokenHash32 % mod ==
    * 0, average chunk length ~mod tokens), so an INSERTION only
    * redraws the one chunk it lands in — every later boundary
    * re-synchronizes on the same content — where fixed-size chunking
    * (q_chunking) shifts every subsequent chunk. The shift-resistant
    * chunk hash is THE dedup key for near-identical documents that
    * differ by a prefix/infix edit (boilerplate headers, injected
    * ads). Rolling-hash CDC (Rabin) applies the same idea at byte
    * level; token granularity keeps the hash replayable in the
    * oracle. One shuffle by doc (window) + one keyed aggregation.
    * Returns (doc_id, chunk_no, n_tokens, chunk_hash). */
  def cdcChunks(docs: DataFrame, mod: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val before = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("bnd",
        when(tokenHash32(col("tok")) % mod === 0, 1L).otherwise(0L))
      .withColumn("chunk_no",
        coalesce(sum(col("bnd")).over(before), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_no"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("chunk_hash"))
  }
}
