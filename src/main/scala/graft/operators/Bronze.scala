package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sources.Tables

/** Bronze-layer ingest shaping (SURVEY.md §1.1).
  *
  * Reference behavior: bronze_ingest.py flattens nested API JSON with
  * pandas — `json_normalize` of nested structs with `_`-joined names
  * (bronze_ingest.py:40) and `explode` of the per-city forecast list
  * (bronze_ingest.py:57) — on the DRIVER, single-machine.
  *
  * Spark-first restatement: `from_json` + recursive struct flatten +
  * `explode` as column expressions, distributed and codegen'd — the
  * flatten happens on executors at full parallelism, which is what a
  * 100 TB bronze drop needs (the reference's pandas step is the one
  * part of its pipeline that cannot scale past one machine).
  */
object Bronze {

  /** Recursively flatten struct columns into `parent_child` top-level
    * columns (the `json_normalize` naming convention with the
    * reference's `_` separator).
    */
  def flattenStructs(df: DataFrame): DataFrame = {
    def expand(schema: StructType, prefix: Option[String]): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix.map(p => s"$p.${f.name}").getOrElse(f.name)
        val name = path.replace('.', '_')
        f.dataType match {
          case s: StructType => expand(s, Some(path))
          case _             => Seq(col(path).as(name))
        }
      }
    df.select(expand(df.schema, None): _*)
  }

  /** Parse a JSON-string column against a DDL schema and flatten the
    * result next to the other columns (keeps lineage columns riding
    * along, as the reference does with `_source`/`_ingestion_date`).
    */
  def parseAndFlattenJson(df: DataFrame, jsonCol: String,
                          schemaDdl: String): DataFrame =
    flattenStructs(
      df.withColumn(jsonCol, from_json(col(jsonCol), lit(schemaDdl),
        Map.empty[String, String].asJava)))

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }

  /** The events bronze drop: parse `props` JSON and flatten. */
  def eventsFlattened(spark: SparkSession, sfDir: String): DataFrame =
    parseAndFlattenJson(
      Tables.table(spark, sfDir, "events")
        .select(col("event_id"), col("event_type"), col("props")),
      "props", "k INT")
}
