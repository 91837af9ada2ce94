package graft.warehouse

import graft.functions.GraftExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Warehouse fan-out — the reference's star-schema sink
 * (/root/reference/store/store.go:68-742, DDL store/init.go:4-226)
 * re-expressed as declarative DataFrame projections over the interleaved
 * span `docs` table.
 *
 * Design (Spark-first, SURVEY.md §2.4):
 *  - `explode(spans)` once, then per-kind filtered projections with
 *    `from_json` + explicit schemas (no inference — the reference schema is
 *    static, store/init.go);
 *  - the reference's `IDStore.Get` get-or-insert dictionary encoding
 *    (store/store.go:839-897) becomes `dropDuplicates(dimCols)` with a
 *    STABLE content-derived id `xxhash64(dimCols)` — no global sort, no
 *    driver round-trips, and ids are reproducible across partial reloads
 *    (a dense_rank id would renumber on every append at 10^10 scale);
 *  - facts carry the same xxhash64 of their dim columns, so fact↔dim is a
 *    broadcast equi-join only when a consumer actually needs dim payloads —
 *    writing facts never joins at all;
 *  - action_id = xxhash64(doc_id, idx); parent_id resolves WITHIN the row
 *    (parent_idx is an array index, kraaler.go:178-189) → zero shuffle for
 *    the redirect-chain self-reference that costs the reference a
 *    per-action in-batch map (store/store.go:374-380).
 *
 * Null semantics mirrored: empty URL components → NULL
 * (store/store.go:504-550), hosts skip bare IPs / unparseable (330-344),
 * nullable status (381-387), error-id only when an error exists.
 */
object Warehouse {

  // ---- span payload schemas (see Correlate.docFromSession renderer) ----

  private val initiatorSchema = StructType(Seq(
    StructField("kind", StringType), StructField("func", StringType),
    StructField("line", IntegerType), StructField("col", IntegerType)))

  val requestSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType), StructField("parent_idx", IntegerType),
    StructField("url", StringType), StructField("method", StringType),
    StructField("initiator", initiatorSchema),
    StructField("headers", MapType(StringType, StringType)),
    StructField("post_data", StringType)))

  private val secSchema = StructType(Seq(
    StructField("protocol", StringType), StructField("key_exchange", StringType),
    StructField("issuer", StringType), StructField("cipher", StringType),
    StructField("san_list", ArrayType(StringType)),
    StructField("subject", StringType),
    StructField("valid_from", LongType), StructField("valid_to", LongType)))

  val responseSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType), StructField("status", IntegerType),
    StructField("mime", StringType), StructField("protocol", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("sec", secSchema)))

  val bodySchema: StructType = StructType(Seq(
    StructField("idx", IntegerType), StructField("sha256", StringType),
    StructField("size", LongType), StructField("mime_browser", StringType),
    StructField("mime_determined", StringType), StructField("text", StringType)))

  val errorSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType), StructField("error", StringType)))

  val consoleSchema: StructType = StructType(Seq(
    StructField("seq", IntegerType), StructField("msg", StringType),
    StructField("line", IntegerType), StructField("col", IntegerType),
    StructField("func", StringType), StructField("url", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("kind", StringType), StructField("resolution", StringType)))

  /** Stable dictionary id over the dim's natural key (IDStore.Get analogue,
    * store/store.go:839-897). */
  def dimId(cols: Column*): Column = xxhash64(cols: _*)

  /** Explode docs once into (doc_id, kind, text, media_ref, offset). */
  def spansOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"))

  private def kindOf(spans: DataFrame, kind: String, schema: StructType): DataFrame =
    spans.filter(col("kind") === kind)
      .withColumn("p", from_json(col("text"), schema))

  /**
   * The flat per-action table — the DataFrame-join formulation of
   * `ActionsFromEvents` (worker.go:1022-1094): request spans left-joined
   * with response / body / error spans on (doc_id, idx). All four sides are
   * co-partitioned on doc_id by construction (they explode from the same
   * row), so AQE plans local joins after one shuffle.
   */
  def actions(docs: DataFrame): DataFrame = {
    val spans = spansOf(docs)
    val req = kindOf(spans, "request", requestSchema).select(
      col("doc_id"), col("p.idx").as("idx"), col("p.parent_idx").as("parent_idx"),
      col("p.url").as("url"), col("p.method").as("method"),
      col("p.initiator.kind").as("initiator_kind"),
      col("p.initiator.func").as("stack_func"),
      col("p.initiator.line").as("stack_line"),
      col("p.initiator.col").as("stack_col"),
      col("p.headers").as("req_headers"), col("p.post_data").as("post_data"),
      col("offset").as("offset"))
    val resp = kindOf(spans, "response", responseSchema).select(
      col("doc_id"), col("p.idx").as("idx"), col("p.status").as("status"),
      col("p.mime").as("mime_browser"), col("p.protocol").as("protocol"),
      col("p.headers").as("resp_headers"), col("p.sec").as("sec"))
    val body = kindOf(spans, "body", bodySchema).select(
      col("doc_id"), col("p.idx").as("idx"), col("p.sha256").as("body_sha256"),
      col("p.size").as("body_size"),
      col("p.mime_determined").as("mime_determined"),
      col("p.text").as("body_text"), col("media_ref").as("body_ref"))
    val err = kindOf(spans, "error", errorSchema).select(
      col("doc_id"), col("p.idx").as("idx"), col("p.error").as("error"))
    req.join(resp, Seq("doc_id", "idx"), "left")
      .join(body, Seq("doc_id", "idx"), "left")
      .join(err, Seq("doc_id", "idx"), "left")
  }

  /** Deterministic synthetic DNS enrichment (GetHostInfo analogue,
    * worker.go:1337-1362 — no network in this sandbox; pure column fns). */
  def hostEnrichment(host: Column): (Column, Column) = {
    val ip = concat_ws(".",
      (pmod(xxhash64(host, lit(1)), lit(223)) + 1).cast("string"),
      pmod(xxhash64(host, lit(2)), lit(256)).cast("string"),
      pmod(xxhash64(host, lit(3)), lit(256)).cast("string"),
      pmod(xxhash64(host, lit(4)), lit(256)).cast("string"))
    val ns = array_join(array_sort(array(
      concat(lit("ns1."), host), concat(lit("ns2."), host))), ",")
    (ip, ns)
  }

  /**
   * Build the full star schema. Returns table name → DataFrame, lazily
   * composable (nothing is materialized here; callers write what they need).
   * Table and column names follow store/init.go:4-226.
   */
  def build(docs: DataFrame, sessions: DataFrame): Map[String, DataFrame] = {
    GraftExpressions.register(docs.sparkSession)
    val spans = spansOf(docs)
    val act = actions(docs).persist()

    val actionId = dimId(col("doc_id"), col("idx"))
    val parentId = when(col("parent_idx") >= 0, dimId(col("doc_id"), col("parent_idx")))

    // ---- dims (dropDuplicates + stable hash id) ----
    def dim1(src: DataFrame, valueCol: Column, name: String): DataFrame =
      src.select(valueCol.as(name)).filter(col(name).isNotNull)
        .dropDuplicates(name)
        .select(dimId(col(name)).as("id"), col(name))

    val dimMethods = dim1(act, col("method"), "method")
    val dimProtocols = dim1(act.filter(col("protocol") =!= ""), col("protocol"), "protocol")
    val dimInitiators = dim1(act, col("initiator_kind"), "initiator")
    val dimErrors = dim1(act.filter(col("error").isNotNull), col("error"), "error")
    val dimMimes = dim1(
      act.select(col("mime_browser").as("m"))
        .unionByName(act.select(col("mime_determined").as("m")))
        .filter(col("m").isNotNull && col("m") =!= ""),
      col("m"), "mime")

    // dim_hosts: skip data:/IP/unparseable (store/store.go:330-344)
    val hostCol = GraftExpressions.url_host(col("url"))
    val (ipCol, nsCol) = hostEnrichment(col("domain"))
    val dimHosts = act
      .select(hostCol.as("domain"))
      .filter(col("domain").isNotNull &&
        GraftExpressions.public_suffix(col("domain")).isNotNull)
      .dropDuplicates("domain")
      .select(dimId(col("domain")).as("id"), col("domain"),
        GraftExpressions.public_suffix(col("domain")).as("tld"),
        ipCol.as("ipv4"), nsCol.as("nameservers"))

    // ---- fact_actions (store/init.go:76-86) ----
    // every dimId is null-guarded: dim1 drops null natural keys, so an
    // unguarded dimId(null) would mint a fact id with no dim row
    val factActions = act.select(
      actionId.as("id"),
      parentId.as("parent_id"),
      col("doc_id").as("session_id"),
      when(col("method").isNotNull, dimId(col("method"))).as("method_id"),
      when(col("protocol").isNotNull && col("protocol") =!= "",
        dimId(col("protocol"))).as("protocol_id"),
      when(hostCol.isNotNull && GraftExpressions.public_suffix(hostCol).isNotNull,
        dimId(hostCol)).as("host_id"),
      when(col("initiator_kind").isNotNull, dimId(col("initiator_kind"))).as("initiator_id"),
      when(col("status").isNotNull && col("status") > 0, col("status")).as("status_code"),
      when(col("error").isNotNull, dimId(col("error"))).as("error_id"))

    // ---- fact_urls + 6 url-component dims (store/store.go:487-561) ----
    val urlParts = act.select(
      actionId.as("action_id"), col("url"),
      parse_url(col("url"), lit("PROTOCOL")).as("scheme"),
      nullif(parse_url(col("url"), lit("USERINFO")), lit("")).as("user"),
      GraftExpressions.url_host(col("url")).as("uhost"),
      nullif(parse_url(col("url"), lit("PATH")), lit("")).as("path"),
      nullif(parse_url(col("url"), lit("REF")), lit("")).as("fragment"),
      nullif(parse_url(col("url"), lit("QUERY")), lit("")).as("raw_query"))
    val factUrls = urlParts.select(
      col("action_id"),
      when(col("scheme").isNotNull, dimId(col("scheme"))).as("scheme_id"),
      when(col("user").isNotNull, dimId(col("user"))).as("user_id"),
      when(col("uhost").isNotNull, dimId(col("uhost"))).as("host_id"),
      when(col("path").isNotNull, dimId(col("path"))).as("path_id"),
      when(col("fragment").isNotNull, dimId(col("fragment"))).as("fragment_id"),
      when(col("raw_query").isNotNull, dimId(col("raw_query"))).as("raw_query_id"),
      col("url"))
    def urlDim(c: String, out: String): DataFrame = dim1(urlParts, col(c), out)
    val dimUrlSchemes = urlDim("scheme", "scheme")
    val dimUrlUsers = urlDim("user", "user")
    val dimUrlHosts = urlDim("uhost", "host")
    val dimUrlPaths = urlDim("path", "path")
    val dimUrlFragments = urlDim("fragment", "fragment")
    val dimUrlQueries = urlDim("raw_query", "raw_query")

    // ---- headers: two-level dict (store/store.go:563-614) ----
    def headerFacts(col0: Column): DataFrame = act
      .select(actionId.as("action_id"), explode(map_entries(col0)).as("kv"))
      .select(col("action_id"), col("kv.key").as("key"), col("kv.value").as("value"))
    val reqH = headerFacts(col("req_headers"))
    val respH = headerFacts(col("resp_headers")) // explode(null map) → 0 rows
    val allH = reqH.unionByName(respH)
    val dimHeaderKeys = dim1(allH, col("key"), "key")
    val dimHeaderKeyvalues = allH.select(col("key"), col("value"))
      .dropDuplicates("key", "value")
      .select(dimId(col("key"), col("value")).as("id"),
        dimId(col("key")).as("key_id"), col("value"))
    def headerFact(h: DataFrame): DataFrame =
      h.select(col("action_id"), dimId(col("key"), col("value")).as("header_keyvalue_id"))
    val factReqHeaders = headerFact(reqH)
    val factRespHeaders = headerFact(respH)

    // ---- security details (store/store.go:616-675) ----
    val secRows = act.filter(col("sec").isNotNull && col("sec.protocol") =!= "")
      .select(actionId.as("action_id"),
        col("sec.protocol").as("protocol"),
        col("sec.key_exchange").as("key_exchange"),
        col("sec.issuer").as("issuer"), col("sec.cipher").as("cipher"),
        array_join(array_sort(col("sec.san_list")), ",").as("san_list"),
        col("sec.subject").as("subject_name"),
        col("sec.valid_from").as("valid_from"), col("sec.valid_to").as("valid_to"))
    val factSecurity = secRows.select(col("action_id"),
      dimId(col("protocol")).as("protocol_id"),
      dimId(col("key_exchange")).as("key_exchange_id"),
      dimId(col("issuer")).as("issuer_id"),
      dimId(col("cipher")).as("cipher_id"),
      dimId(col("san_list")).as("san_list_id"),
      col("subject_name"), col("valid_from"), col("valid_to"))
    val dimIssuers = dim1(secRows, col("issuer"), "issuer")
    val dimKeyExchanges = dim1(secRows, col("key_exchange"), "key_exchange")
    val dimCiphers = dim1(secRows, col("cipher"), "cipher")
    val dimSanLists = dim1(secRows, col("san_list"), "san_list")
    val dimSecProtocols = dim1(secRows, col("protocol"), "protocol")

    // ---- bodies: content-addressed (store/store.go:677-742, file.go:97-179)
    val bodyRows = act.filter(col("body_sha256").isNotNull && col("body_sha256") =!= "")
    val factBodies = bodyRows.select(
      actionId.as("action_id"),
      when(col("mime_browser").isNotNull && col("mime_browser") =!= "",
        dimId(col("mime_browser"))).as("browser_mime_id"),
      when(col("mime_determined").isNotNull && col("mime_determined") =!= "",
        dimId(col("mime_determined"))).as("determined_mime_id"),
      col("body_sha256").as("hash256"),
      col("body_size").as("org_size"),
      // stored (gzip best-compression) size, store/file.go:39-44
      when(col("body_ref") =!= "",
        GraftExpressions.gzip_size(encode(col("body_text"), "UTF-8"))).as("comp_size"),
      nullif(col("body_ref"), lit("")).as("path"))
    // content-addressed store manifest: one row per distinct stored body
    val storedBodies = bodyRows.filter(col("body_ref") =!= "")
      .dropDuplicates("body_sha256")
      .select(col("body_sha256").as("hash"), col("body_ref").as("path"),
        col("body_size").as("org_size"), col("mime_determined").as("mime"))

    // ---- post data / initiator stack (store/init.go:206-218) ----
    val factPostData = act.filter(col("post_data") =!= "")
      .select(actionId.as("action_id"), col("post_data").as("data"))
    val factInitiatorStack = act.filter(col("stack_func") =!= "")
      .select(actionId.as("action_id"), col("stack_col").as("col"),
        col("stack_line").as("line"), col("stack_func").as("func"))

    // ---- console (store/store.go:164-201) ----
    val consoleRows = kindOf(spans, "console", consoleSchema).select(
      col("doc_id").as("session_id"), col("p.seq").as("seq"),
      col("p.msg").as("msg"), col("p.line").as("line"), col("p.col").as("col"),
      col("p.func").as("func"))
    val dimConsoleMessages = dim1(consoleRows, col("msg"), "msg")
    val dimJsOrigin = consoleRows.select(col("func"), col("col"), col("line"))
      .dropDuplicates("func", "col", "line")
      .select(dimId(col("func"), col("col"), col("line")).as("id"),
        col("func"), col("col"), col("line"))
    val factConsole = consoleRows.select(col("session_id"), col("seq"),
      dimId(col("func"), col("col"), col("line")).as("javascript_origin_id"),
      dimId(col("msg")).as("msg_id"))

    // ---- screenshots (store/init.go:41-45) ----
    val mediaRows = kindOf(spans, "media", mediaSchema)
    val factScreenshots = mediaRows.select(
      col("doc_id").as("session_id"), col("media_ref").as("path"),
      col("p.resolution").as("resolution"))
    val dimResolutions = dim1(mediaRows, col("p.resolution"), "resolution")

    // ---- fact_sessions (store/init.go:10-18): amount_of_actions =
    //      request-span count (store/store.go:144-146) ----
    val actionCounts = act.groupBy(col("doc_id")).agg(count(lit(1)).as("amount_of_actions"))
    val factSessions = sessions
      .join(actionCounts, Seq("doc_id"), "left")
      .select(col("doc_id").as("id"),
        dimId(lit("1366x768")).as("resolution_id"),
        col("navigate_ts").as("navigated_time"),
        col("loaded_ts").as("loaded_time"),
        col("terminated_ts").as("terminated_time"),
        coalesce(col("amount_of_actions"), lit(0L)).as("amount_of_actions"),
        nullif(col("error"), lit("")).as("error"))

    Map(
      "fact_sessions" -> factSessions,
      "fact_actions" -> factActions,
      "fact_urls" -> factUrls,
      "fact_request_headers" -> factReqHeaders,
      "fact_response_headers" -> factRespHeaders,
      "fact_security_details" -> factSecurity,
      "fact_bodies" -> factBodies,
      "fact_post_data" -> factPostData,
      "fact_initiator_stack" -> factInitiatorStack,
      "fact_console_output" -> factConsole,
      "fact_screenshots" -> factScreenshots,
      "stored_bodies" -> storedBodies,
      "dim_methods" -> dimMethods,
      "dim_protocols" -> dimProtocols,
      "dim_hosts" -> dimHosts,
      "dim_initiators" -> dimInitiators,
      "dim_errors" -> dimErrors,
      "dim_mime_types" -> dimMimes,
      "dim_url_schemes" -> dimUrlSchemes,
      "dim_url_users" -> dimUrlUsers,
      "dim_url_hosts" -> dimUrlHosts,
      "dim_url_paths" -> dimUrlPaths,
      "dim_url_fragments" -> dimUrlFragments,
      "dim_url_raw_queries" -> dimUrlQueries,
      "dim_header_keys" -> dimHeaderKeys,
      "dim_header_keyvalues" -> dimHeaderKeyvalues,
      "dim_issuers" -> dimIssuers,
      "dim_key_exchanges" -> dimKeyExchanges,
      "dim_ciphers" -> dimCiphers,
      "dim_san_lists" -> dimSanLists,
      "dim_sec_protocols" -> dimSecProtocols,
      "dim_console_messages" -> dimConsoleMessages,
      "dim_javascript_origin" -> dimJsOrigin,
      "dim_resolutions" -> dimResolutions)
  }
}
