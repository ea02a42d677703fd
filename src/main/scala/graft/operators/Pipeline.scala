package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation: the operators composed the way
  * a real pipeline runs them, as one declarative plan per stage.
  *
  * Stage order follows the standard corpus-preparation recipe (quality
  * filter → exact dedup → near dedup → decontaminate → pack): cheap
  * row-local filters run FIRST so every later (join-bearing) stage sees
  * a smaller corpus, and exact dedup precedes near dedup so the shingle
  * index is never built over byte-identical copies.
  *
  * Scale shape is inherited from the per-stage operators: the quality
  * filter is a pure map; exact dedup exchanges md5 fingerprints; the
  * near-dup stage shuffles the hashed shingle index (PPJoin-pruned);
  * decontamination broadcasts the eval grams; packing is the two-phase
  * range-partitioned prefix sum. Nothing in the composition adds a
  * shuffle: each stage's output feeds the next by doc_id semi/anti
  * joins on already-partitioned keys.
  *
  * Each stage is also exposed separately so a user can splice in their
  * own (the reference's processing hooks compose the same way,
  * reference `README.md:348-358`).
  */
object Pipeline {

  /** Row-local quality gate: minimum token count + distinct-token ratio
    * (t02's "too_short"/"repetitive" rules). Pure map — no exchange. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 10,
      minDistinctRatio: Double = 0.5): DataFrame = {
    val words = split(trim(col("text")), " ")
    docs.filter(size(words) >= minTokens &&
      size(array_distinct(words)).cast("double") / size(words)
        >= minDistinctRatio)
  }

  /** Exact dedup keep-min-id: d01's fingerprint-first shape as a
    * filter — survivors are each content group's smallest doc_id. */
  def dedupExact(docs: DataFrame): DataFrame = {
    val reps = docs
      .select(md5(encode(col("text"), "UTF-8")).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(reps, Seq("doc_id"), "left_semi")
  }

  /** Decontamination as a filter: drop every document sharing an
    * n-gram with `eval` ([[DedupOps.decontaminate]] anti-joined). */
  def decontaminated(docs: DataFrame, eval: DataFrame,
      n: Int = 8): DataFrame =
    docs.join(DedupOps.decontaminate(docs, eval, n),
      Seq("doc_id"), "left_anti")

  /** The composed pipeline: quality gate → exact dedup → decontaminate
    * against `eval`. Returns the surviving documents with their token
    * counts — the frame a packing/sharding stage (t07) consumes. */
  def prepare(docs: DataFrame, eval: DataFrame): DataFrame =
    decontaminated(dedupExact(qualityFilter(docs)), eval)
      .withColumn("n_tokens", size(split(trim(col("text")), " ")))
}
