package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Multi-format landing-zone IO — the format surface the reference's
 * crawler handles (Parquet / ORC / JSON / CSV, reference SURVEY §2.1 S5),
 * with schema inference on read (schema-on-read, reference README.md:323)
 * and sensible landing defaults on write (gzip for text formats, matching
 * the reference's GZIP landing, README.md:82).
 */
object Landing {

  val formats: Set[String] = Set("parquet", "orc", "json", "csv")

  /** Schema-inferring read. CSV assumes a header row (crawler-style). */
  def read(spark: SparkSession, path: String, format: String): DataFrame = {
    require(formats(format), s"unsupported landing format: $format")
    val r = spark.read.format(format)
    (format match {
      case "csv" => r.option("header", "true").option("inferSchema", "true")
      case _ => r
    }).load(path)
  }

  def write(df: DataFrame, path: String, format: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionKeys: Seq[String] = Nil): Unit = {
    require(formats(format), s"unsupported landing format: $format")
    val w0 = df.write.format(format).mode(mode)
    val w1 = format match {
      case "json" => w0.option("compression", "gzip")
      case "csv" => w0.option("compression", "gzip").option("header", "true")
      case _ => w0
    }
    (if (partitionKeys.nonEmpty) w1.partitionBy(partitionKeys: _*) else w1)
      .save(path)
  }
}
