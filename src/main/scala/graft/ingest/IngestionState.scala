package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, ZoneOffset}

/** High-watermark incremental ingestion state (SURVEY.md ST2;
  * reference: dags/ingestion/lark_to_gcs.py:41-70).
  *
  * Per-table state: (prevLatest, latest, latestIngestionDate) in epoch
  * millis / ISO date. The day-boundary rule makes same-day re-runs
  * idempotent into the same partition: if the last ingestion ran today,
  * re-read from `prevLatest` (the whole day again); otherwise from
  * `latest`. State only advances when new rows exist.
  *
  * Stored as a small JSON file next to the lake (an offset log, like a
  * streaming source's checkpoint — NOT Spark event-time watermarking,
  * which solves a different problem). Write is staged + atomic-renamed.
  */
final case class TableWatermark(prevLatest: Long, latest: Long, latestIngestionDate: String)

final class IngestionState(path: String) {

  private val file = Paths.get(path)

  def load(): Map[String, TableWatermark] = {
    if (!Files.exists(file)) return Map.empty
    val txt = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
    // minimal parser for the flat shape {"tbl":{"prev":1,"latest":2,"date":"d"},...}
    """"([^"]+)"\s*:\s*\{\s*"prev"\s*:\s*(-?\d+)\s*,\s*"latest"\s*:\s*(-?\d+)\s*,\s*"date"\s*:\s*"([^"]*)"\s*\}""".r
      .findAllMatchIn(txt)
      .map(m => m.group(1) -> TableWatermark(m.group(2).toLong, m.group(3).toLong, m.group(4)))
      .toMap
  }

  def save(state: Map[String, TableWatermark]): Unit = {
    val body = state.toSeq.sortBy(_._1).map { case (k, w) =>
      s""""$k": {"prev": ${w.prevLatest}, "latest": ${w.latest}, "date": "${w.latestIngestionDate}"}"""
    }.mkString("{", ", ", "}")
    val tmp = Paths.get(path + ".tmp")
    Files.createDirectories(file.toAbsolutePath.getParent)
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
  }

  /** The read offset for this run (day-boundary rule, lark_to_gcs.py:55-60). */
  def offsetFor(table: String, runDate: LocalDate): Long =
    load().get(table) match {
      case None => Long.MinValue
      case Some(w) =>
        if (w.latestIngestionDate == runDate.toString) w.prevLatest else w.latest
    }

  /** Advance after a batch containing rows up to `maxSeen`; no-op when
    * the batch was empty (lark_to_gcs.py:64-70). */
  def advance(table: String, runDate: LocalDate, maxSeen: Option[Long]): Unit =
    maxSeen.foreach { mx =>
      val st = load()
      val prev = st.get(table) match {
        case Some(w) if w.latestIngestionDate == runDate.toString => w.prevLatest
        case Some(w) => w.latest
        case None => Long.MinValue
      }
      save(st + (table -> TableWatermark(prev, mx, runDate.toString)))
    }
}

object IngestionState {
  def dayOf(epochMillis: Long): LocalDate =
    Instant.ofEpochMilli(epochMillis).atZone(ZoneOffset.UTC).toLocalDate
}
