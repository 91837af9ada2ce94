package graft

import graft.functions.UrlFns
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-surface unit tests (SURVEY.md §4 custom expressions 1-3). */
class UrlFnsSpec extends AnyFunSuite {

  test("normalizeDomain lowers + trims (kraaler.go:38-40)") {
    assert(UrlFns.normalizeDomain("  ExAmPle.COM \n") == "example.com")
  }

  test("publicSuffix: simple, two-level, bare suffix") {
    assert(UrlFns.publicSuffix("example.com") == "com")
    assert(UrlFns.publicSuffix("a.b.co.uk") == "co.uk")
    assert(UrlFns.publicSuffix("www.example.test") == "test")
    assert(UrlFns.publicSuffix("com") == null)           // no dot
    assert(UrlFns.publicSuffix("127.0.0.1") == null)     // bare IP skipped
    assert(UrlFns.publicSuffix("") == null)
  }

  test("etld1: registrable domain; null for bare suffixes/IPs (store/store.go:339-344)") {
    assert(UrlFns.etld1("www.example.com") == "example.com")
    assert(UrlFns.etld1("a.b.co.uk") == "b.co.uk")
    assert(UrlFns.etld1("deep.sub.domain.org") == "domain.org")
    assert(UrlFns.etld1("co.uk") == null)
    assert(UrlFns.etld1("192.168.0.1") == null)
    assert(UrlFns.etld1("h7.test") == "h7.test")
  }

  test("PSL full rule semantics: wildcard, exception, multi-level, private registry") {
    // wildcard *.ck: any single label left of the base is itself a suffix
    assert(UrlFns.publicSuffix("anything.ck") == "anything.ck")
    assert(UrlFns.etld1("anything.ck") == null) // host IS a (wildcard) suffix
    assert(UrlFns.etld1("x.anything.ck") == "x.anything.ck")
    assert(UrlFns.etld1("deep.x.anything.ck") == "x.anything.ck")
    // exception !www.ck wins over the wildcard: www.ck is registrable
    assert(UrlFns.publicSuffix("www.ck") == "ck")
    assert(UrlFns.etld1("www.ck") == "www.ck")
    assert(UrlFns.etld1("sub.www.ck") == "www.ck")
    assert(UrlFns.etld1("WWW.CK") == "www.ck") // case-normalized first
    // three-level wildcard *.sch.uk
    assert(UrlFns.publicSuffix("myschool.sch.uk") == "myschool.sch.uk")
    assert(UrlFns.etld1("www.myschool.sch.uk") == "www.myschool.sch.uk")
    // three-level exact rule act.edu.au (longest match beats com.au-style)
    assert(UrlFns.publicSuffix("x.act.edu.au") == "act.edu.au")
    assert(UrlFns.etld1("www.x.act.edu.au") == "x.act.edu.au")
    // but edu.au itself still prevails where no 3-level rule matches
    assert(UrlFns.etld1("www.x.edu.au") == "x.edu.au")
    // private-section registry: every user site is its own registrable
    assert(UrlFns.publicSuffix("cust5.github.io") == "github.io")
    assert(UrlFns.etld1("cust5.github.io") == "cust5.github.io")
    assert(UrlFns.etld1("www.cust5.github.io") == "cust5.github.io")
    assert(UrlFns.etld1("github.io") == null)
  }

  test("resolveUrl: reference keep-filter + resolution (parsing.go:46,78-86)") {
    assert(UrlFns.resolveUrl("https://test.com", "/search") == "https://test.com/search")
    assert(UrlFns.resolveUrl("https://test.com/deep/page", "/x") == "https://test.com/x")
    assert(UrlFns.resolveUrl("https://test.com", "http://o.com/a") == "http://o.com/a")
    assert(UrlFns.resolveUrl("https://test.com", "#frag") == null)
    assert(UrlFns.resolveUrl("https://test.com", "/9num") == null) // ^/[a-zA-Z]+ fails
    assert(UrlFns.resolveUrl("https://test.com:8080", "/p") == "https://test.com:8080/p")
  }

  test("hostOf") {
    assert(UrlFns.hostOf("http://A.b.Com:8080/x?q=1") == "a.b.com")
    assert(UrlFns.hostOf("not a url") == null)
  }

  test("sniffMime: magic-byte subset of http.DetectContentType (store/file.go:125)") {
    def b(s: String) = s.getBytes("UTF-8")
    assert(UrlFns.sniffMime(b("<html><body>x</body></html>")) == "text/html")
    assert(UrlFns.sniffMime(b("  <!DOCTYPE html><html>")) == "text/html")
    assert(UrlFns.sniffMime(b("hello world")) == "text/plain")
    assert(UrlFns.sniffMime(b("%PDF-1.4 blah")) == "application/pdf")
    assert(UrlFns.sniffMime(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)) == "image/png")
    assert(UrlFns.sniffMime(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0)) == "image/jpeg")
    assert(UrlFns.sniffMime(Array[Byte](0, 1, 2, 3)) == "application/octet-stream")
    assert(UrlFns.sniffMime(b("")) == "text/plain")
  }

  test("sha256Hex matches known vector") {
    assert(UrlFns.sha256Hex("hello world") ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }
}
