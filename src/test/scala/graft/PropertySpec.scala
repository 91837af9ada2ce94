package graft

import graft.functions.UrlFns
import graft.operators.{Dedup, TextOps}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY.md §5 test strategy, item d): invariants of the
  * scalar surface that table-driven fixtures can't sweep. Native
  * ScalaCheck `Properties` — sbt's scalacheck framework runs these. */
object ScalarProperties extends Properties("graft.scalars") {

  val hostGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    labels <- Gen.listOfN(n,
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString))
  } yield labels.mkString(".")

  property("etld1 idempotent when defined") = forAll(hostGen) { h =>
    val e = UrlFns.etld1(h)
    e == null || UrlFns.etld1(e) == e
  }

  property("publicSuffix/etld1 are suffixes of host") = forAll(hostGen) { h =>
    val ps = UrlFns.publicSuffix(h)
    ps == null || {
      val e = UrlFns.etld1(h)
      h.endsWith(ps) && (e == null || (h.endsWith(e) && e.endsWith(ps)))
    }
  }

  property("hostOf fast path ≡ java.net.URI on adversarial urls") = {
    // sweep the fast path's decision edges: case, digits-led labels,
    // '-' at label edges, ports (valid/invalid/empty), userinfo, IPv6,
    // '%', '_', trailing dots, empty hosts, weird schemes
    val label = Gen.oneOf(Gen.const("ab"), Gen.const("A9"), Gen.const("9a"),
      Gen.const("a-b"), Gen.const("-ab"), Gen.const("ab-"), Gen.const("123"),
      Gen.const("x_y"), Gen.const("a%2Fb"), Gen.const(""))
    val hostPart = for {
      n <- Gen.choose(1, 3)
      ls <- Gen.listOfN(n, label)
      trail <- Gen.oneOf("", ".")
    } yield ls.mkString(".") + trail
    val authority = Gen.oneOf(
      hostPart,
      hostPart.map("user@" + _),
      Gen.const("[::1]"),
      hostPart.map(_ + ":80"), hostPart.map(_ + ":"), hostPart.map(_ + ":8x"))
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "ftp+x", "1bad")
      a <- authority
      path <- Gen.oneOf("", "/", "/p/1", "?q=1", "#f")
    } yield s"$scheme://$a$path"
    forAll(urlGen) { u =>
      val viaUri =
        try {
          val h = new java.net.URI(u).getHost
          if (h == null) null else h.toLowerCase
        } catch { case _: Exception => null }
      UrlFns.hostOf(u) == viaUri
    }
  }

  property("resolveUrl absolute-or-null") = {
    val hrefGen = Gen.oneOf(
      Gen.const("/path"), Gen.const("#frag"), Gen.const("javascript:void(0)"),
      Gen.alphaNumStr.map("/" + _), Gen.alphaNumStr.map("http://x.test/" + _))
    forAll(hostGen, hrefGen) { (h, href) =>
      val r = UrlFns.resolveUrl(s"http://$h/base", href)
      r == null || r.startsWith("http://") || r.startsWith("https://")
    }
  }

  property("sniffMime total and well-formed") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val m = UrlFns.sniffMime(bytes.toArray)
      m != null && m.contains("/")
    }

  property("jaccardSortedArrays in [0,1], symmetric, reflexive-1") = {
    val arrGen = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .map(_.distinct.sorted.toIndexedSeq)
    forAll(arrGen, arrGen) { (a, b) =>
      val j = Dedup.jaccardSortedArrays(a, b)
      j >= 0.0 && j <= 1.0 &&
        j == Dedup.jaccardSortedArrays(b, a) &&
        Dedup.jaccardSortedArrays(a, a) == 1.0
    }
  }

  property("winnow deterministic + whitespace invariant") =
    forAll(Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))) { words =>
      val s = words.mkString(" ")
      TextOps.winnow(s) == TextOps.winnow(s) &&
        TextOps.winnow(s) == TextOps.winnow(words.mkString("  "))
    }

  property("robots: disallowed prefixes rejected") =
    forAll(hostGen, Gen.alphaLowerStr) { (h, p) =>
      UrlFns.robotsDisallow(h).forall(d =>
        !UrlFns.robotsAllowed(s"http://$h$d/$p"))
    }

  property("normalizeDomain idempotent") = forAll { (s: String) =>
    val n = UrlFns.normalizeDomain(s)
    UrlFns.normalizeDomain(n) == n
  }

  property("gzipSize deterministic and positive") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val b = bytes.toArray
      val g = UrlFns.gzipSize(b)
      g > 0 && g == UrlFns.gzipSize(b)
    }
}
