package graft.sources.dsv2

import java.util.OptionalLong

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types._

/** ANALYZE statistics for graft catalog tables (`CALL analyze_table`),
  * persisted as a JSON document in the table spec
  * ([[JsonlTable.StatsProp]]) and served to Spark's cost-based
  * optimizer through `JsonlScan.estimateStatistics` — row count plus
  * per-column NDV / null count / min / max (numerics and temporals)
  * and avg/max byte length (strings).
  *
  * STALENESS CONTRACT: the document embeds the
  * [[JsonlLayout.statsFingerprint]] of the layout it was computed over
  * (shard names + delete sidecars + pending upsert key files). The
  * scan serves the stats ONLY while the live fingerprint still
  * matches: any append, compaction, MOR delete, or upsert wave makes
  * them invisible rather than misleading — CBO then falls back to the
  * skip-index-exact row count / byte sizes it had before. ANALYZE is
  * an ingest-wave-cadence maintenance action, the same class as
  * compaction.
  *
  * Values are stored in CATALYST-INTERNAL numeric form (dates as epoch
  * days, timestamps as epoch micros) so serving is a typed re-box, not
  * a parse.
  */
object JsonlTableStats {

  final case class ColStat(ndv: Option[Long], nulls: Option[Long],
                           min: Option[Any], max: Option[Any],
                           avgLen: Option[Long], maxLen: Option[Long],
                           // EXACTLY verified duplicate-free over
                           // non-null values (`unique_candidates`) —
                           // fingerprint-fresh uniqueness is a sound
                           // premise for the eager-aggregation rewrite
                           unique: Boolean = false)

  final case class TableStats(rows: Long, fingerprint: String,
                              cols: Map[String, ColStat])

  /** Column types ANALYZE computes stats for (and the scan serves). */
  def analyzable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType | BooleanType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** min/max are stored/served only for these (catalyst-numeric
    * representable; string min/max may be huge and CBO's range
    * estimation doesn't use them). */
  def rangeTyped(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  def toJson(s: TableStats): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("rows", s.rows)
    root.put("fingerprint", s.fingerprint)
    val cn = root.putObject("cols")
    s.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val n = cn.putObject(name)
      c.ndv.foreach(n.put("ndv", _))
      c.nulls.foreach(n.put("nulls", _))
      c.min.foreach {
        case d: java.lang.Double => n.put("min", d.doubleValue)
        case v: Number => n.put("min", v.longValue)
        case _ => ()
      }
      c.max.foreach {
        case d: java.lang.Double => n.put("max", d.doubleValue)
        case v: Number => n.put("max", v.longValue)
        case _ => ()
      }
      c.avgLen.foreach(n.put("avgLen", _))
      c.maxLen.foreach(n.put("maxLen", _))
      if (c.unique) n.put("unique", true)
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(json: String): Option[TableStats] =
    try {
      val node = new ObjectMapper().readTree(json)
      val cols = Map.newBuilder[String, ColStat]
      val cn = node.get("cols")
      if (cn != null) cn.properties().forEach { e =>
        val c = e.getValue
        def long(k: String): Option[Long] =
          Option(c.get(k)).filter(_.isNumber).map(_.asLong)
        def num(k: String): Option[Any] =
          Option(c.get(k)).collect {
            case v if v.isFloatingPointNumber => java.lang.Double.valueOf(v.asDouble)
            case v if v.isNumber => java.lang.Long.valueOf(v.asLong)
          }
        cols += e.getKey -> ColStat(long("ndv"), long("nulls"),
          num("min"), num("max"), long("avgLen"), long("maxLen"),
          unique = Option(c.get("unique")).exists(_.asBoolean(false)))
      }
      Some(TableStats(node.get("rows").asLong,
        node.get("fingerprint").asText, cols.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Re-box a stored numeric into the declared type's catalyst value
    * (dates Int days, timestamps Long micros, ints Integer). */
  def catalystValue(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (n: Number, LongType) => Some(java.lang.Long.valueOf(n.longValue))
    case (n: Number, IntegerType) => Some(java.lang.Integer.valueOf(n.intValue))
    case (n: Number, DoubleType) => Some(java.lang.Double.valueOf(n.doubleValue))
    case (n: Number, DateType) => Some(java.lang.Integer.valueOf(n.intValue))
    case (n: Number, TimestampType | TimestampNTZType) =>
      Some(java.lang.Long.valueOf(n.longValue))
    case _ => None
  }

  /** v2 [[ColumnStatistics]] view of one column's ANALYZE entry. */
  final class GraftColumnStatistics(c: ColStat, dt: DataType)
      extends ColumnStatistics {
    private def ol(v: Option[Long]): OptionalLong =
      v.map(OptionalLong.of).getOrElse(OptionalLong.empty())
    override def distinctCount(): OptionalLong = ol(c.ndv)
    override def nullCount(): OptionalLong = ol(c.nulls)
    override def min(): java.util.Optional[Object] =
      if (!rangeTyped(dt)) java.util.Optional.empty()
      else java.util.Optional.ofNullable(
        c.min.flatMap(catalystValue(_, dt)).map(_.asInstanceOf[Object]).orNull)
    override def max(): java.util.Optional[Object] =
      if (!rangeTyped(dt)) java.util.Optional.empty()
      else java.util.Optional.ofNullable(
        c.max.flatMap(catalystValue(_, dt)).map(_.asInstanceOf[Object]).orNull)
    override def avgLen(): OptionalLong = ol(c.avgLen)
    override def maxLen(): OptionalLong = ol(c.maxLen)
  }
}
