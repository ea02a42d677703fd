package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a partition-mapped typed decode stage — the
  * Spark-side shape of an image/audio decode pipeline. The real decode
  * (image/audio libs) is not available in this container, so the decoder
  * is a deterministic stand-in ([[MultimodalStub.decode]]) that extracts
  * byte-level metadata; the Spark plumbing — binary schema, typed
  * Dataset, mapPartitions batch shape, partition sizing — is real and
  * oracle-checked (byte lengths, header bytes, md5, strided checksum are
  * all recomputable in SQL).
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, header: Int,
      fp: String, sample_checksum: Long)

  /** STUB decoder: stands in for image/audio decode + feature extraction.
    * Deterministic byte-level "features": length, first byte, md5 hex,
    * and a strided-sample checksum (every 16th byte — the "frame
    * sampling" shape: O(n_bytes/stride) work per record).
    */
  object MultimodalStub {
    def decode(m: MediaIn): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(m.payload).map("%02x".format(_)).mkString
      val header = if (m.payload.nonEmpty) m.payload(0) & 0xff else -1
      var checksum = 0L
      var i = 0
      while (i < m.payload.length) {
        checksum = (checksum + (m.payload(i) & 0xff)) % 997
        i += 16
      }
      MediaMeta(m.doc_id, m.payload.length, header, hex, checksum)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary ingest -> typed partition-mapped decode -> metadata table.
    "m01_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaIn]
        .mapPartitions(_.map(MultimodalStub.decode))
        .toDF()
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "m01_multimodal_decode" ->
      """WITH s AS (SELECT doc_id, text,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INT) AS n_bytes
           FROM documents),
         samp AS (SELECT doc_id,
           CAST(SUM(ORD(SUBSTR(text, i, 1))) % 997 AS BIGINT) AS sample_checksum
           FROM s, UNNEST(GENERATE_SERIES(1, n_bytes, 16)) AS t(i)
           GROUP BY doc_id)
         SELECT s.doc_id, s.n_bytes,
           CASE WHEN s.n_bytes > 0 THEN ORD(SUBSTR(s.text, 1, 1))
                ELSE -1 END AS header,
           MD5(s.text) AS fp,
           COALESCE(samp.sample_checksum, 0) AS sample_checksum
         FROM s LEFT JOIN samp ON s.doc_id = samp.doc_id
         ORDER BY s.doc_id"""
  )
}
