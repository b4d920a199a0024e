package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Text-analysis operators for training-data pipelines over `documents`:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting, exact dedup, n-gram Jaccard near-dup. All pure
  * DataFrame ops (codegen'd built-ins, no UDFs) — at 100 TB these are
  * embarrassingly parallel map/shuffle-light pipelines.
  */
object TextAnalysis {
  /** Whitespace tokens via regexp (identical semantics in DuckDB's
    * regexp_extract_all for the oracle).
    */
  def tokens(c: String): Column = expr(s"regexp_extract_all($c, '\\\\S+', 0)")

  val STOPWORDS: Seq[String] = Seq("the", "a", "of", "to", "in", "and", "is", "on")

  def stopwordFilterSql(tokensCol: String): String =
    s"size(filter($tokensCol, t -> t IN (${STOPWORDS.map(s => s"'$s'").mkString(", ")})))"
}

object TextQueries {
  import Tables._
  import TextAnalysis._

  private val stopListSql = STOPWORDS.map(s => s"'$s'").mkString(", ")

  val all: Seq[QueryDef] = Seq(

    QueryDef("d_token_stats",
      (s, d) => documents(s, d)
        .withColumn("toks", tokens("text"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_actual"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
             |       CAST(length(text) AS BIGINT) AS n_chars_actual
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("d_quality_score",
      (s, d) => documents(s, d)
        .withColumn("toks", tokens("text"))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop", expr(stopwordFilterSql("toks")))
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
          (length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_tokens"))
            .as("avg_token_len"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
              |       CAST(len(list_filter(regexp_extract_all(text, '\\S+'), t -> t IN ($stopListSql))) AS DOUBLE)
              |         / len(regexp_extract_all(text, '\\S+')) AS stop_ratio,
              |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
              |         / len(regexp_extract_all(text, '\\S+')) AS avg_token_len
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // n-gram-frequency language heuristic, deliberately SQL-expressible so
    // the oracle replicates it exactly: English stopword hits → 'en'.
    QueryDef("d_lang_id",
      (s, d) => documents(s, d)
        .withColumn("toks", tokens("text"))
        .withColumn("n_stop", expr(stopwordFilterSql("toks")))
        .select(col("doc_id"),
          when(col("n_stop") > 0, lit("en")).otherwise(lit("und")).as("pred_lang"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |       CASE WHEN len(list_filter(regexp_extract_all(text, '\\S+'), t -> t IN ($stopListSql))) > 0
              |            THEN 'en' ELSE 'und' END AS pred_lang
              |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("d_fingerprint",
      (s, d) => documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")),

    QueryDef("d_dedup_exact",
      (s, d) => documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // Exact token-set Jaccard over same-source candidate blocks (the
    // blocking keeps the pair count at O(block²) instead of O(n²) — the
    // same structure a 100 TB run needs, where `source` would be a
    // coarser LSH bucket; see MinHash operators for the approximate path).
    QueryDef("d_ngram_jaccard",
      (s, d) => {
        // tokenize+sort ONCE per doc; per-pair work is a single merge
        // pass (jaccard_sorted) — no per-pair hash sets. One side of the
        // block join is broadcast (documents are the small side here; at
        // 100 TB the blocks come from LSH buckets and both sides shuffle
        // on the block key).
        val docs = documents(s, d)
          .select(col("doc_id"), col("source"),
            array_sort(array_distinct(tokens("text"))).as("toks"))
        val a = docs.select(col("source"), col("doc_id").as("doc_a"), col("toks").as("toks_a"))
        val b = docs.select(col("source"), col("doc_id").as("doc_b"), col("toks").as("toks_b"))
        // no broadcast hint: AQE broadcasts while the block table is
        // small and falls back to a shuffle join on the block key when
        // it isn't — the behavior that survives a 1000× scale-up
        a.join(b, Seq("source"))
          .filter(col("doc_a") < col("doc_b"))
          .withColumn("jac",
            graft.functions.VariantFunctions.jaccard_sorted(col("toks_a"), col("toks_b")))
          .filter(col("jac") >= 0.7)
          .select(col("doc_a"), col("doc_b"), col("jac"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source, list_distinct(regexp_extract_all(text, '\S+')) AS t
             |  FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
             |         / len(list_distinct(a.t || b.t)) AS jac
             |FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
             |        / len(list_distinct(a.t || b.t)) >= 0.7
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Multimodal plumbing: opaque binary column + typed metadata via a
    // stubbed decoder (real image/audio libs absent in this container —
    // the Spark-side schema/partitioning/batch shape is the real part).
    QueryDef("mm_blob_meta",
      (s, d) => Multimodal.blobMeta(s, documents(s, d)),
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS width,
             |       CAST(64 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS height,
             |       CASE octet_length(encode(text)) % 3
             |         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS fmt
             |FROM documents ORDER BY doc_id""".stripMargin)))
}

/** Multimodal column handling: media as opaque binary + typed metadata.
  * The decode is a deterministic STUB (no codec libs in-container); the
  * Spark plumbing — binary columns, per-partition batch iteration, typed
  * output schema — is real and is what matters at scale.
  */
object Multimodal {
  case class BlobMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, fmt: String)

  /** STUB decoder: in production this would call an image codec per
    * batch; here metadata is derived deterministically from the bytes.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): BlobMeta = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    BlobMeta(id, n, 64 + n % 512, 64 + (n * 7) % 512, fmt)
  }

  def blobMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .orderBy(col("doc_id"))
  }
}
