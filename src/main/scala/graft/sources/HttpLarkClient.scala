package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Real HTTP transport for the Lark Open API behind the [[LarkClient]]
  * seam (reference: dags/utils/lark.py:17-37 token flow, 39-69 records,
  * 72-112 tables, 114-134 chat message). Uses the JDK's own
  * `java.net.http` client and the Jackson already on the Spark
  * classpath — no new dependencies — and is tested against an
  * in-process `com.sun.net.httpserver` fake (no egress in CI); point
  * `baseUrl` at `https://open.larksuite.com` in production.
  *
  * Deliberate deviations from the reference, both documented here
  * because they change failure behavior, not data:
  *   - a non-2xx status or Lark `code != 0` THROWS instead of logging
  *     and returning the partial page list (lark.py:60-66): a partial
  *     fetch would land a torn CSV and the watermark would advance past
  *     unread rows — the ingestion edge's [[Retry]] + notifier own the
  *     failure policy instead;
  *   - non-string field values render as compact JSON text (the
  *     reference lands pandas `str()` Python reprs; the bronze
  *     `py_to_json` parser accepts both forms).
  */
final class HttpLarkClient(baseUrl: String, appId: String, appSecret: String,
                           appToken: String, pageSize: Int = 20,
                           http: HttpClient = HttpClient.newBuilder()
                             .connectTimeout(java.time.Duration.ofSeconds(10)).build(),
                           requestTimeout: java.time.Duration =
                             java.time.Duration.ofSeconds(60),
                           now: () => Long = System.currentTimeMillis)
    extends LarkClient {

  private val mapper = new ObjectMapper()
  // (token, refresh-after epoch millis) — refreshed early so a token
  // never expires mid-page-loop on a long multi-table run
  @volatile private var cachedToken: Option[(String, Long)] = None
  private val refreshLock = new Object

  /** POST /auth/v3/tenant_access_token/internal/ — fetched lazily on
    * first authorized call, cached until ~10 min before the server's
    * `expire`, and invalidated on any API error (see [[send]]) so a
    * [[Retry]] attempt always starts from a fresh token. Refresh is
    * serialized under [[refreshLock]] with a double-check so concurrent
    * callers (IngestJob may run tables in parallel) never race N token
    * fetches, and a refresher can only ever store the token it just
    * fetched from the server — never a stale one over an invalidation. */
  def tenantToken: String = cachedToken match {
    case Some((t, refreshAfter)) if now() < refreshAfter => t
    case _ => refreshLock.synchronized {
      cachedToken match {
        case Some((t, refreshAfter)) if now() < refreshAfter => t
        case _ =>
          val body = mapper.createObjectNode()
            .put("app_id", appId).put("app_secret", appSecret).toString
          val node = send(request("/open-apis/auth/v3/tenant_access_token/internal/")
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
            .build())
          val t = node.path("tenant_access_token").asText("")
          require(t.nonEmpty, "tenant_access_token missing from auth response")
          val expireMs = math.max(node.path("expire").asLong(7200L), 700L) * 1000
          cachedToken = Some((t, now() + expireMs - 600_000L))
          t
      }
    }
  }

  override def tablesPage(pageToken: Option[String]): LarkPage[LarkTableInfo] = {
    val d = authGet(paged(s"/open-apis/bitable/v1/apps/$appToken/tables", pageToken))
      .path("data")
    page(d, _.elements.asScala.map(i =>
      LarkTableInfo(i.path("table_id").asText(""), i.path("name").asText(""))).toSeq)
  }

  override def recordsPage(tableId: String,
                           pageToken: Option[String]): LarkPage[LarkSource.LarkRecord] = {
    val d = authGet(paged(
      s"/open-apis/bitable/v1/apps/$appToken/tables/$tableId/records", pageToken))
      .path("data")
    page(d, _.elements.asScala.map { item =>
      val fields = item.path("fields")
      // Jackson preserves JSON object insertion order — the same
      // first-seen column order recordsToDf builds on
      fields.fieldNames.asScala.map { name =>
        val v = fields.get(name)
        name -> (if (v.isTextual) v.asText else v.toString)
      }.toSeq: LarkSource.LarkRecord
    }.toSeq)
  }

  /** POST /im/v1/messages — the chat transport behind
    * [[LarkChatNotifier]] (reference: lark.py:114-134). */
  def sendMessage(chatId: String, text: String): Unit = {
    val content = mapper.createObjectNode().put("text", text).toString
    val body = mapper.createObjectNode()
      .put("receive_id", chatId).put("msg_type", "text")
      .put("content", content).toString
    send(request("/open-apis/im/v1/messages?receive_id_type=chat_id")
      .header("Authorization", s"Bearer $tenantToken")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build())
    ()
  }

  // ------------------------------------------------------------- plumbing

  // URLEncoder is form encoding (space -> '+'); a query component per
  // RFC 3986 needs %20, or a server that percent-decodes without form
  // semantics round-trips a space in the token as a literal '+'
  private def paged(path: String, pageToken: Option[String]): String =
    s"$path?page_size=$pageSize" + pageToken.fold("")(t =>
      "&page_token=" + URLEncoder.encode(t, StandardCharsets.UTF_8).replace("+", "%20"))

  private def page[T](d: JsonNode, items: JsonNode => Seq[T]): LarkPage[T] = {
    val p = LarkPage(
      items = items(d.path("items")),
      pageToken = Option(d.path("page_token").asText(null)).filter(_.nonEmpty),
      hasMore = d.path("has_more").asBoolean(false))
    // has_more without a token would send the drain loop back to page 1
    // forever — a malformed response must throw, not livelock
    require(!(p.hasMore && p.pageToken.isEmpty),
      "malformed page: has_more=true with no page_token")
    p
  }

  private def request(pathAndQuery: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(baseUrl + pathAndQuery))
      .timeout(requestTimeout)

  private def authGet(pathAndQuery: String): JsonNode =
    send(request(pathAndQuery)
      .header("Authorization", s"Bearer $tenantToken").GET().build())

  private def send(req: HttpRequest): JsonNode = {
    // any failure invalidates the cached token: the dominant recoverable
    // cause is expiry/revocation, and a Retry attempt must re-auth
    // rather than replay a dead bearer to guaranteed failure
    def fail(msg: String): Nothing = {
      cachedToken = None
      throw new IllegalArgumentException(msg)
    }
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      fail(s"HTTP ${resp.statusCode()} from ${req.uri()}: ${resp.body().take(200)}")
    val node = mapper.readTree(resp.body())
    if (node.path("code").asInt(0) != 0)
      fail(s"Lark error code ${node.path("code").asInt()} from ${req.uri()}: " +
        node.path("msg").asText(""))
    node
  }
}

/** Route run notifications to a Lark group chat — the reference's
  * on_success/on_failure callback target (dags/utils/notifier.py:6-18).
  * [[IngestNotifier.notifying]] and [[IngestJob]] already treat
  * notification as best-effort, so a down chat API cannot fail a run. */
final class LarkChatNotifier(client: HttpLarkClient, chatId: String)
    extends IngestNotifier {
  override def notify(message: String): Unit = client.sendMessage(chatId, message)
}
