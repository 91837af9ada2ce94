package graft

import graft.fetch.{Correlate, FetchSim, Parsing}
import graft.model.Model._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Mirrors the reference's end-to-end fetch semantics tests
 * (worker_test.go:275-444) against the deterministic synthetic web, using
 * the same composable validators (codesAre / bodiesAre / initiatorsAre /
 * errorsAre / mimeIs / hasActionCount / consoleIs / postDataIs /
 * securityDetailsPresent, worker_test.go:110-273).
 */
class FetchCorrelateSpec extends AnyFunSuite {
  val sim = new FetchSim()

  def session(url: String): Session =
    Correlate.sessionFromFetch("doc-" + url, sim.fetch(url))

  def codesAre(s: Session, codes: Seq[Int]): Unit =
    assert(s.actions.map(_.status) == codes, s"codes of ${s.url}")
  def bodiesAre(s: Session, bodies: Seq[String]): Unit =
    assert(s.actions.map(_.body_text) == bodies, s"bodies of ${s.url}")
  def initiatorsAre(s: Session, kinds: Seq[String]): Unit =
    assert(s.actions.map(_.initiator_kind) == kinds, s"initiators of ${s.url}")

  test("basic: 1 action, 200, hello world, text/plain, initiator user") {
    val s = session("http://fixture.test/basic")
    assert(s.actions.length == 1)
    codesAre(s, Seq(200))
    bodiesAre(s, Seq("hello world"))
    initiatorsAre(s, Seq("user"))
    assert(s.actions.head.mime_determined == "text/plain")
    assert(s.error == "")
  }

  test("tls: security details present") {
    val s = session("https://fixture.test/tls")
    val a = s.actions.head
    assert(a.sec_protocol == "TLS 1.3")
    assert(a.sec_issuer.nonEmpty && a.sec_cipher.nonEmpty && a.sec_san_list.nonEmpty)
  }

  test("no-server: connection refused, no response") {
    val s = session("http://fixture.test/no-server")
    assert(s.actions.length == 1)
    assert(s.actions.head.status == 0)
    assert(s.actions.head.error == "net::ERR_CONNECTION_REFUSED")
    assert(s.error == "net::ERR_CONNECTION_REFUSED")
  }

  test("notfound: 404 with body") {
    val s = session("http://fixture.test/notfound")
    codesAre(s, Seq(404))
    bodiesAre(s, Seq("not found"))
  }

  test("console: captures 'a a' and 'b' in seq order") {
    val s = session("http://fixture.test/console")
    assert(s.console.map(_.msg) == Seq("a a", "b"))
  }

  test("redirect: 3-action chain user,redirect,redirect / 301,301,200") {
    val s = session("http://fixture.test/redirect")
    assert(s.actions.length == 3)
    codesAre(s, Seq(301, 301, 200))
    initiatorsAre(s, Seq("user", "redirect", "redirect"))
    bodiesAre(s, Seq("", "", "hello world"))
    // parent chain is 0 <- 1 <- 2
    assert(s.actions.map(_.parent_idx) == Seq(-1, 0, 1))
  }

  test("subresource: initiators user,parser; codes 200,404") {
    val s = session("http://fixture.test/subresource")
    assert(s.actions.length == 2)
    codesAre(s, Seq(200, 404))
    initiatorsAre(s, Seq("user", "parser"))
  }

  test("post: initiators user,script; post_data captured") {
    val s = session("http://fixture.test/post")
    assert(s.actions.length == 2)
    initiatorsAre(s, Seq("user", "script"))
    assert(s.actions(1).post_data == "some_data")
    assert(s.actions(1).method == "POST")
  }

  test("chain page links to next; last page terminates") {
    val s0 = session("http://chain.test/p/0")
    assert(s0.links == Seq("http://chain.test/p/1"))
    val sLast = session("http://chain.test/p/99")
    assert(sLast.links.isEmpty)
  }

  test("redirect-cdp: real CDP shape (hop responses only as redirectResponse) correlates identically") {
    // worker.go:1043-1046 backfill: parent.Response = sent.RedirectResponse.
    // The explicit-response form and the CDP form must yield the same chain.
    val s = session("http://fixture.test/redirect-cdp")
    assert(s.actions.length == 3)
    codesAre(s, Seq(301, 301, 200))
    initiatorsAre(s, Seq("user", "redirect", "redirect"))
    bodiesAre(s, Seq("", "", "hello world"))
    assert(s.actions.map(_.parent_idx) == Seq(-1, 0, 1))
    val ref = session("http://fixture.test/redirect")
    assert(s.actions.map(a => (a.status, a.initiator_kind, a.parent_idx)) ==
      ref.actions.map(a => (a.status, a.initiator_kind, a.parent_idx)))
  }

  test("orphan: parent without ANY response makes the child initiator 'user'") {
    // worker.go:1088-1091: a.Parent != nil but Parent.Response == nil → user
    val s = session("http://fixture.test/orphan")
    assert(s.actions.length == 2)
    codesAre(s, Seq(0, 200))
    initiatorsAre(s, Seq("user", "user")) // NOT "script"
    assert(s.actions(1).parent_idx == 0)
  }

  test("fetch is deterministic") {
    val u = "http://h3.test/p/7"
    // Array[Byte] payloads compare by reference — compare via the flattened
    // Doc and strip byte fields from the raw comparison
    assert(Correlate.docFromSession(session(u)) == Correlate.docFromSession(session(u)))
    assert(sim.fetch(u).copy(bodies = Seq.empty, screenshot_bytes = Seq.empty) ==
      sim.fetch(u).copy(bodies = Seq.empty, screenshot_bytes = Seq.empty))
    assert(sim.screenshotBytes(u).toSeq == sim.screenshotBytes(u).toSeq)
  }

  test("doc spans: ordered offsets, kinds from the closed set") {
    val kinds = Set("request", "response", "body", "console", "media", "error")
    for (u <- Seq("http://fixture.test/redirect", "http://fixture.test/console",
        "http://fixture.test/no-server", "http://h0.test/p/1")) {
      val d = Correlate.docFromSession(session(u))
      assert(d.spans.map(_.offset) == d.spans.indices)
      assert(d.spans.forall(sp => kinds.contains(sp.kind)))
    }
  }

  test("redirect doc: span sequence shape (request,response)x2, then request,response,body, media") {
    val d = Correlate.docFromSession(session("http://fixture.test/redirect"))
    assert(d.spans.map(_.kind) == Seq(
      "request", "response", "request", "response", "request", "response",
      "body", "media"))
    val bodySpan = d.spans.find(_.kind == "body").get
    assert(bodySpan.media_ref.startsWith("bodies/"))
  }

  test("synthetic web: every url fetches, statuses from closed set") {
    val urls = sim.seedUrls(50)
    urls.foreach { u =>
      val s = session(u)
      assert(s.actions.nonEmpty)
      s.actions.foreach(a => assert(Set(0, 200, 301, 404).contains(a.status)))
    }
  }
}

/** Link extraction fixtures — parsing_test.go:10-67. */
class ParsingSpec extends AnyFunSuite {
  val base = "https://test.com"

  test("absolute href passes through") {
    val html = """<html><body><a href="https://other.com/x">x</a></body></html>"""
    assert(Parsing.retrieveLinks(base, html) == Seq("https://other.com/x"))
  }

  test("relative href resolves against base") {
    val html = """<html><body><a href="/search">s</a></body></html>"""
    assert(Parsing.retrieveLinks(base, html) == Seq("https://test.com/search"))
  }

  test("overlapping links dedup to one") {
    val html =
      """<html><body><a href="/search">a</a><a href="/search">b</a></body></html>"""
    assert(Parsing.retrieveLinks(base, html) == Seq("https://test.com/search"))
  }

  test("empty html yields no links") {
    assert(Parsing.retrieveLinks(base, "<html></html>") == Seq.empty)
  }

  test("non-keepable hrefs dropped (anchors, js, bare words)") {
    val html = """<html><body><a href="#top">t</a><a href="javascript:x()">j</a>
      <a href="mailto:a@b.c">m</a><a href="/9abc">n</a></body></html>"""
    assert(Parsing.retrieveLinks(base, html) == Seq.empty)
  }

  test("non-html body yields no links") {
    assert(Parsing.retrieveLinks(base, "plain text with <a href=\"/x\">") == Seq.empty)
  }
}
