package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftExtensions, Tables}

/** Flagship composition queries: the training-data pipeline stages chained
  * end-to-end, and the SQL-registered custom functions exercised from pure
  * SQL.
  */
object Pipeline {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------ pipeline
    // Clean-corpus pipeline: token-count quality gate -> exact dedup
    // (keep lowest doc_id per content fingerprint) -> stable output.
    // One narrow scan + one window shuffle on the fingerprint; at 100 TB
    // the fingerprint window is the canonical "keep one copy" shape
    // (16-byte keys, partial-agg-free but spill-safe).
    QueryDef("pp_clean_corpus",
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.nTokens(col("text")).as("n_tokens"),
          md5(col("text").cast("binary")).as("fp"))
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("n_tokens") >= 10)
          .select(col("doc_id"), col("n_tokens"), col("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_tokens, fp FROM (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             |    md5(text) AS fp,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 AND n_tokens >= 10
             |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------ SQL fns
    // The custom Catalyst expressions through their SQL registration
    // (GraftExtensions): same semantics as dd_embed_cosine, so the DuckDB
    // oracle cross-checks the SQL-function path end-to-end.
    QueryDef("pp_sql_functions",
      (s, d) => {
        GraftExtensions.register(s)
        Tables.embeddings(s, d).createOrReplaceTempView("v_embeddings")
        s.sql("""
          |SELECT a.vec_id AS a_id, b.vec_id AS b_id
          |FROM v_embeddings a JOIN v_embeddings b ON a.vec_id < b.vec_id
          |WHERE graft_cosine(a.embedding, b.embedding) >= 0.45
          |ORDER BY a_id, b_id""".stripMargin)
      },
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id
             |FROM embeddings a, embeddings b
             |WHERE a.vec_id < b.vec_id
             |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
