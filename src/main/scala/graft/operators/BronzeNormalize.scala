package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.LarkFunctions

/** Bronze-layer normalization (SURVEY.md §1.3, §2.2; reference:
  * dags/utils/common/data_helper.py:125-150).
  *
  * Pipeline per table: materialize missing source columns as nulls
  * ("no data no column"), convert epoch-millis to UTC timestamps,
  * fill bool/numeric defaults, defensively coerce junk numerics,
  * project to the declared column set, cast, and rename to snake_case.
  * All schema-on-write: the declared `StructType` is authoritative,
  * never inference.
  */
object BronzeNormalize {

  /** A bronze table declaration: source column -> target (renamed)
    * column + Spark type, in declaration order. */
  final case class ColumnSpec(source: String, target: String, dataType: DataType,
                              epochMillis: Boolean = false,
                              junkNumeric: Boolean = false)

  /** Reference behavior "lark: no data no column": absent source
    * columns materialize as typed nulls (data_helper.py:127-129). */
  def fillMissingColumns(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val present = df.columns.toSet
    specs.filterNot(s => present.contains(s.source)).foldLeft(df) { (d, s) =>
      d.withColumn(s.source, lit(null).cast(StringType))
    }
  }

  /** Full normalize: fill, convert, coerce, project+cast+rename. */
  def apply(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val filled = fillMissingColumns(df, specs)
    val projected = specs.map { s =>
      val c = col(s.source)
      val converted =
        if (s.epochMillis) LarkFunctions.epochMillisToTs(c)
        else if (s.junkNumeric) LarkFunctions.coerceNumeric(c.cast(StringType))
        else c
      val defaulted = s.dataType match {
        // bool/numeric null-fill defaults (data_helper.py:139-145)
        case BooleanType => coalesce(converted.cast(BooleanType), lit(false))
        case _: NumericType => coalesce(converted.cast(s.dataType), lit(0).cast(s.dataType))
        case _ => converted
      }
      defaulted.cast(s.dataType).as(s.target)
    }
    filled.select(projected: _*)
  }

  /** Silver/gold-side: project + cast a frame to a target schema
    * (reference apply_schema_to_df, schema_helper.py:39-49). */
  def applySchema(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
}
