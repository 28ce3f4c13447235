package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.JsonParsers

/** File-based change-event sources — the reference consumes exactly
  * these document shapes from disk (the insert/update/delete JSON
  * samples under /root/reference/examples/pgoutput/events/:
  * pretty-printed wal2json documents, one change array per file).
  *
  * Batch and streaming readers share one code path: read the raw
  * document text, then the same `from_json` + `explode` flatten used
  * for in-flight columns. Streaming uses the file source, so a
  * directory of change files behaves like a (replayable) topic —
  * Spark's standard backfill story.
  */
object ChangeEventFiles {

  /** Whole-file JSON documents (possibly pretty-printed, like the
    * reference's samples) → flat change rows. */
  def wal2json(s: SparkSession, path: String): DataFrame = {
    val docs = s.read.option("multiLine", "true")
      .schema(JsonParsers.wal2jsonSchema).json(path)
    JsonParsers.wal2jsonFlatten(
      docs.select(explode(col("change")).as("change")), "change")
  }

  /** Streaming variant over a directory of JSON-lines change docs. */
  def wal2jsonStream(s: SparkSession, path: String): DataFrame = {
    val docs = s.readStream.schema(JsonParsers.wal2jsonSchema).json(path)
    JsonParsers.wal2jsonFlatten(
      docs.select(explode(col("change")).as("change")), "change")
  }

  /** Debezium envelope files (JSON-lines) with a typed row schema. */
  def debezium(s: SparkSession, path: String, rowType: StructType): DataFrame =
    s.read.schema(JsonParsers.debeziumSchema(rowType)).json(path)

  def debeziumStream(s: SparkSession, path: String, rowType: StructType): DataFrame =
    s.readStream.schema(JsonParsers.debeziumSchema(rowType)).json(path)

  /** Typed projection of a text-encoded cell, per the wal2json declared
    * column type — the declarative twin of the reference's per-OID
    * decoder switch (main.go:433-520). Unknown types stay string. */
  def typedCell(m: Column, name: String, pgType: String): Column = {
    val raw = m(name)
    pgType match {
      case "integer" | "int4" | "smallint" | "int2" => raw.cast("int")
      case "bigint" | "int8" => raw.cast("long")
      case "real" | "float4" => raw.cast("float")
      case "double precision" | "float8" => raw.cast("double")
      case "numeric" => raw.cast("decimal(38,18)")
      case "boolean" => raw.cast("boolean")
      case t if t.startsWith("timestamp") => raw.cast("timestamp")
      case "date" => raw.cast("date")
      case _ => raw
    }
  }
}
