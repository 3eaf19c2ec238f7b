package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.StreamSplitter

/**
 * Per-table payload-schema registry — the engine's crawler analog
 * (reference README.md:34, 188-190, 314: a crawler infers the landing
 * schema and a second one re-crawls the split output).
 *
 * Envelopes arrive with `data` as a raw JSON string
 * ([[graft.model.DmsEnvelope.rawEnvelopeSchema]] — the streaming-safe
 * form, since Structured Streaming fixes schemas at query start). The
 * registry supplies each table's concrete payload schema for late-bound
 * `from_json`:
 *
 *  - [[SchemaRegistry.infer]] — "crawl": sample a table's `data` strings
 *    from landed envelopes and infer the schema (the distributed
 *    `spark.read.json` inference the reference's crawler performs;
 *    conflicting batches union field-wise exactly like choice types —
 *    settle policy via [[graft.operators.ChoiceResolver]]);
 *  - [[SchemaRegistry.bindTable]] — demux one table and decode+flatten
 *    its payload with the registered schema.
 *
 * The registry itself is a plain concurrent map: schemas are small
 * driver-side metadata (the catalog pattern), the inference and binding
 * are fully distributed.
 */
final class SchemaRegistry {

  private val schemas = TrieMap.empty[(String, String), StructType]

  def put(schemaName: String, tableName: String, schema: StructType): Unit =
    schemas.put((schemaName, tableName), schema)

  def get(schemaName: String, tableName: String): Option[StructType] =
    schemas.get((schemaName, tableName))

  def tables: Seq[(String, String)] = schemas.keys.toSeq.sorted

  /**
   * Crawl: infer `(schemaName, tableName)`'s payload schema from raw
   * envelopes (`data` string column), register and return it.
   * `samplingRatio` < 1.0 samples the JSON strings like the reference
   * crawler samples S3 objects.
   */
  def infer(spark: SparkSession, rawEnvelopes: DataFrame,
      schemaName: String, tableName: String,
      samplingRatio: Double = 1.0): StructType = {
    import spark.implicits._
    val ds = StreamSplitter.demux(rawEnvelopes, schemaName, tableName)
      .select(col("data")).as[String]
    val inferred = spark.read
      .option("samplingRatio", samplingRatio)
      .json(ds).schema
    put(schemaName, tableName, inferred)
    inferred
  }

  /** Crawl every (schema, table) present in `rawEnvelopes` (one
    * distinct pass to list tables, one inference per table). */
  def inferAll(spark: SparkSession, rawEnvelopes: DataFrame): Seq[(String, String)] = {
    val keys = rawEnvelopes.filter(col("data").isNotNull)
      .select(StreamSplitter.schemaNameCol.as("s"), StreamSplitter.tableNameCol.as("t"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    keys.foreach { case (s, t) => infer(spark, rawEnvelopes, s, t) }
    keys
  }

  /**
   * Late binding: demux one table from raw envelopes and decode its
   * `data` JSON with the registered schema — output is the flattened
   * golden shape (`data.*` + `timestamp`), same as the struct path's
   * [[StreamSplitter.flatten]]. Works identically on batch and
   * streaming DataFrames (from_json is a per-row expression).
   */
  def bindTable(rawEnvelopes: DataFrame, schemaName: String, tableName: String): DataFrame = {
    val schema = get(schemaName, tableName).getOrElse(throw new IllegalArgumentException(
      s"no schema registered for $schemaName.$tableName — run infer() or put() first"))
    StreamSplitter.demux(rawEnvelopes, schemaName, tableName)
      .select(from_json(col("data"), schema).as("data"),
        col("metadata.timestamp").as("timestamp"))
      .select(col("data.*"), col("timestamp"))
  }
}
