package graft.model

import org.apache.spark.sql.types._

/**
 * The DMS change-record envelope — the engine's one hand-declared schema.
 *
 * Every record flowing through the reference pipeline is a two-field JSON
 * document `{data, metadata}` (reference README.md:200-221). `data` holds one
 * source row (NULL for DDL/control records, README.md:257); `metadata`
 * identifies provenance: which schema/table the row belongs to, the operation
 * (`load`/`insert`/`update`/`delete`), and an ISO-8601 microsecond timestamp
 * kept as a *string* for fidelity (README.md:213, image/image5.png).
 *
 * Field names are hyphenated (`schema-name`, `record-type`) exactly as in the
 * reference — legal in Spark `StructField`s, accessed with backticks.
 */
object DmsEnvelope {

  /** `metadata` struct: 6 string fields (reference README.md:213-218). */
  val metadataSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("record-type", StringType),
    StructField("operation", StringType),
    StructField("partition-key-type", StringType),
    StructField("schema-name", StringType),
    StructField("table-name", StringType)
  ))

  /**
   * Envelope with `data` late-bound as a raw JSON string. This is the
   * streaming-safe form: the envelope shape is fixed, per-table payload
   * schemas are resolved later with `from_json` (SURVEY §7.3 item 4 —
   * schema drift across micro-batches).
   */
  val rawEnvelopeSchema: StructType = StructType(Seq(
    StructField("data", StringType),
    StructField("metadata", metadataSchema)
  ))

  /** Envelope with a concrete (e.g. crawler-inferred union) `data` struct. */
  def envelopeSchema(dataSchema: StructType): StructType = StructType(Seq(
    StructField("data", dataSchema),
    StructField("metadata", metadataSchema)
  ))

  /** Typed view of `metadata` for the places compile-time safety helps. */
  final case class DmsMetadata(
      timestamp: String,
      recordType: String,
      operation: String,
      partitionKeyType: String,
      schemaName: String,
      tableName: String)

  val OpLoad   = "load"
  val OpInsert = "insert"
  val OpUpdate = "update"
  val OpDelete = "delete"
  val RecordTypeData    = "data"
  val RecordTypeControl = "control"
}
