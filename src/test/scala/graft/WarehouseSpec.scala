package graft

import graft.fetch.{Correlate, FetchSim}
import graft.warehouse.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Warehouse fan-out semantics — mirrors the reference's golden
 * table-cardinality test `TestActionStore`
 * (/root/reference/store/store_test.go:321-457, tableDiff at 366-396):
 * save a known fixture, assert the exact row count every fact/dim table
 * gained. Fixture shapes come from the deterministic FetchSim analogues of
 * worker_test.go:275-444.
 */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sim = new FetchSim()

  /** docs + sessions frames for a set of fixture URLs (the Page→Doc path). */
  def crawlOf(urls: String*): (DataFrame, DataFrame) = {
    import spark.implicits._
    val sessions = urls.map { u =>
      Correlate.sessionFromFetch("d" + FetchSim.sha8(u), sim.fetch(u))
    }
    val docs = sessions.map(Correlate.docFromSession)
    val docsDf = docs.map(d => (d.doc_id, d.spans)).toDF("doc_id", "spans")
    val sessDf = sessions
      .map(s => (s.doc_id, s.url, s.host, s.error, s.navigate_ts, s.loaded_ts, s.terminated_ts))
      .toDF("doc_id", "url", "host", "error", "navigate_ts", "loaded_ts", "terminated_ts")
    (docsDf, sessDf)
  }

  test("golden cardinalities for a rich TLS action (TestActionStore analogue)") {
    val (docs, sess) = crawlOf("http://fixture.test/tls")
    val t = Warehouse.build(docs, sess)
    val want = Map(
      "fact_sessions" -> 1L, "fact_actions" -> 1L, "fact_urls" -> 1L,
      "fact_request_headers" -> 3L, "fact_response_headers" -> 2L,
      "fact_security_details" -> 1L, "fact_bodies" -> 1L,
      "fact_post_data" -> 0L, "fact_initiator_stack" -> 0L,
      "fact_console_output" -> 0L, "fact_screenshots" -> 1L,
      "stored_bodies" -> 1L,
      "dim_methods" -> 1L, "dim_protocols" -> 1L, "dim_hosts" -> 1L,
      "dim_initiators" -> 1L, "dim_errors" -> 0L, "dim_mime_types" -> 1L,
      "dim_url_schemes" -> 1L, "dim_url_users" -> 0L, "dim_url_hosts" -> 1L,
      "dim_url_paths" -> 1L, "dim_url_fragments" -> 0L,
      "dim_url_raw_queries" -> 0L,
      "dim_header_keys" -> 5L, "dim_header_keyvalues" -> 5L,
      "dim_issuers" -> 1L, "dim_key_exchanges" -> 1L, "dim_ciphers" -> 1L,
      "dim_san_lists" -> 1L, "dim_sec_protocols" -> 1L,
      "dim_console_messages" -> 0L, "dim_javascript_origin" -> 0L,
      "dim_resolutions" -> 1L)
    val got = want.keys.map(k => k -> t(k).count()).toMap
    assert(got == want, s"diff: ${got.toSeq.diff(want.toSeq).sorted}")
  }

  test("redirect chain: parent ids link, initiators user/redirect/redirect (worker.go:1043-1091)") {
    val (docs, sess) = crawlOf("http://fixture.test/redirect")
    val t = Warehouse.build(docs, sess)
    val fa = t("fact_actions").orderBy("id").collect()
    assert(fa.length == 3)
    assert(fa.count(_.isNullAt(fa.head.fieldIndex("parent_id"))) == 1)
    // join initiators dim for names
    val names = t("fact_actions")
      .join(t("dim_initiators").withColumnRenamed("id", "dim_id"),
        col("initiator_id") === col("dim_id"))
      .groupBy("initiator").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(names == Map("user" -> 1L, "redirect" -> 2L))
    // status codes 301,301,200
    val codes = t("fact_actions").select("status_code").collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(codes == Seq(200, 301, 301))
  }

  test("console rows carry explicit seq 1..n (store/store.go:183-196)") {
    val (docs, sess) = crawlOf("http://fixture.test/console")
    val t = Warehouse.build(docs, sess)
    val rows = t("fact_console_output").orderBy("seq").collect()
    assert(rows.map(_.getAs[Int]("seq")).toSeq == Seq(1, 2))
    val msgs = t("fact_console_output")
      .join(t("dim_console_messages").withColumnRenamed("id", "dim_id"),
        col("msg_id") === col("dim_id"))
      .orderBy("seq").select("msg").collect().map(_.getString(0)).toSeq
    assert(msgs == Seq("a a", "b"))
  }

  test("post fixture: post_data + initiator stack rows (store/init.go:206-218)") {
    val (docs, sess) = crawlOf("http://fixture.test/post")
    val t = Warehouse.build(docs, sess)
    assert(t("fact_post_data").collect().map(_.getString(1)).toSeq == Seq("some_data"))
    val stack = t("fact_initiator_stack").collect()
    assert(stack.length == 1)
    assert(stack.head.getAs[String]("func") == "post")
  }

  test("error fixture: nullable status, error dim encoded (store/store.go:362-387)") {
    val (docs, sess) = crawlOf("http://fixture.test/no-server")
    val t = Warehouse.build(docs, sess)
    val fa = t("fact_actions").collect()
    assert(fa.length == 1)
    assert(fa.head.isNullAt(fa.head.fieldIndex("status_code")))
    assert(!fa.head.isNullAt(fa.head.fieldIndex("error_id")))
    assert(t("dim_errors").collect().map(_.getString(1)).toSeq ==
      Seq("net::ERR_CONNECTION_REFUSED"))
    // session error propagated (worker.go:640-642)
    val fs = t("fact_sessions").collect().head
    assert(fs.getAs[String]("error") == "net::ERR_CONNECTION_REFUSED")
  }

  test("dictionary encoding is stable: same tuple → same id across builds (TestIDStore)") {
    val (d1, s1) = crawlOf("http://fixture.test/basic")
    val (d2, s2) = crawlOf("http://fixture.test/basic", "http://fixture.test/notfound")
    val id1 = Warehouse.build(d1, s1)("dim_methods").collect().head.getLong(0)
    val id2 = Warehouse.build(d2, s2)("dim_methods")
      .filter(col("method") === "GET").collect().head.getLong(0)
    assert(id1 == id2)
  }

  test("content-addressed body dedup: same body twice → one stored row (TestFileStore)") {
    val (docs, sess) = crawlOf("http://fixture.test/basic", "http://fixture.test/tls")
    val t = Warehouse.build(docs, sess)
    // both fixtures carry body "hello world" → 2 fact rows, 1 stored body
    assert(t("fact_bodies").count() == 2)
    assert(t("stored_bodies").count() == 1)
  }

  test("sessions: amount_of_actions counts actions (store/store.go:144-146)") {
    val (docs, sess) = crawlOf("http://fixture.test/redirect", "http://fixture.test/basic")
    val t = Warehouse.build(docs, sess)
    val m = t("fact_sessions").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("amount_of_actions")).toMap
    assert(m.values.toSeq.sorted == Seq(1L, 3L))
  }
}
