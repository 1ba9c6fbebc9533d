package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal plumbing as a registry query: documents are packed into the
  * engine's binary media format (12-byte header + payload) and the
  * metadata is extracted back out via pure Catalyst byte expressions.
  * The oracle computes the same metadata DIRECTLY from the source
  * columns — a differential check that the binary round-trip through
  * encode → header-parse is lossless. */
object MultimodalQueries {

  private def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.encodeFake(
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          col("n_chars").cast("int").as("w"),
          (col("doc_id") % 100).cast("int").as("h"),
          col("text").as("payload")),
      "w", "h", "payload")
    Multimodal.extractMeta(media)
      .selectExpr("doc_id", "is_valid", "cast(width AS BIGINT) AS width",
        "cast(height AS BIGINT) AS height", "payload_bytes")
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal_meta", multimodalMeta, Some("""
      SELECT doc_id, TRUE AS is_valid,
             n_chars AS width,
             doc_id % 100 AS height,
             octet_length(encode(text)) AS payload_bytes
      FROM documents
      ORDER BY doc_id""")),
  )
}
