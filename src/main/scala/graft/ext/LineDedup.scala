package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style global line-level dedup with document reconstruction
  * (Raffel et al. 2020: discard every occurrence of a repeated line
  * except the first). Lines are fixed `lineW`-token chunks of the
  * whitespace-token stream (the corpus has no newlines; with real
  * newline-separated text, swap the chunker for split(text, "\n")).
  *
  * The keep rule is the globally-first instance: min(doc_id * 10^4 +
  * line_pos) per line CONTENT — a packed key, so documents must stay
  * under 10^4 lines (10^5 tokens at lineW=10; enforce upstream with
  * chunking for longer docs).
  *
  * 100 TB posture: the winner table is one groupBy on the line string —
  * boilerplate lines ("click here to subscribe" x 10^7) collapse in the
  * map-side partial agg, so the skew never reaches the exchange; the
  * instance join fans each instance to exactly one winner row (output
  * rows == instance rows, linear); reconstruction aggregates per doc,
  * bounded by doc length. Three linear shuffles, no windows.
  */
object LineDedup {

  /** Output: idCol, n_lines, n_kept, kept_text. */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      lineW: Int = 10): DataFrame = {
    val toks = split(col(textCol), " ")
    val lines = transform(sequence(lit(1), size(toks), lit(lineW)),
      i => array_join(slice(toks, i, lit(lineW)), " "))
    val inst = docs
      .select(col(idCol).as("doc_id"), posexplode(lines).as(Seq("pos0", "line")))
      .select(col("doc_id"), (col("pos0") + 1L).as("pos"), col("line"),
        (col("doc_id") * 10000L + col("pos0") + 1L).as("pk"))
    val winners = inst.groupBy(col("line")).agg(min(col("pk")).as("keep_pk"))
    val kept = inst.join(winners, Seq("line"))
      .filter(col("pk") === col("keep_pk"))
    val nLines = inst.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    val perDoc = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x("line")), " ").as("kept_text"))
    nLines.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
