package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graphs, Sketches}

/** Invariant + bit-identity tests for the link-graph PageRank (q50) and
  * the deterministic HyperLogLog sketch (q51). Both operators are
  * DuckDB-hash-verified end to end in CORRECTNESS; these specs pin the
  * engine-side semantics on hand-checkable inputs, including a full
  * driver-side replay of the integer recurrences from the same md5
  * stream.
  */
class GraphSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs(n: Int): DataFrame =
    (0 until n).map(_.toLong).toDF("doc_id")

  test("linkGraph: every node emits exactly fanout edges, targets match the md5 draw") {
    val n = 16
    val edges = Graphs.linkGraph(docs(n), n, fanout = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length == n * 4)
    assert(edges.groupBy(_._1).forall(_._2.length == 4))
    // driver-side replay of the 60-bit md5 draw
    for ((src, grp) <- edges.groupBy(_._1)) {
      val want = (0 until 4).map { j =>
        java.lang.Long.parseLong(md5hex(s"pr:$src:$j").take(15), 16) % n
      }
      // edge order within a src is not guaranteed; compare as multisets
      assert(grp.map(_._2).sorted.toSeq == want.sorted)
    }
  }

  test("pageRank: bit-identical to a driver-side integer replay; teleport floor holds") {
    val n = 24
    val got = Graphs.pageRank(docs(n), iters = 3, fanout = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // replay: same edges, same integer recurrence
    val edges = for (src <- 0L until n; j <- 0 until 4) yield
      src -> (java.lang.Long.parseLong(md5hex(s"pr:$src:$j").take(15), 16) % n)
    var pr = Array.fill(n)(1000000L)
    for (_ <- 1 to 3) {
      val s = Array.fill(n)(0L)
      for ((src, dst) <- edges) s(dst.toInt) += pr(src.toInt) / 4
      pr = Array.tabulate(n)(v => 150000L + (s(v) * 85) / 100)
    }
    val indeg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for (v <- 0 until n) {
      assert(got(v.toLong)._1 == pr(v), s"rank mismatch at node $v")
      assert(got(v.toLong)._2 == indeg.getOrElse(v.toLong, 0L))
      assert(got(v.toLong)._1 >= 150000L) // teleport floor
    }
    assert(got.values.map(_._2).sum == n * 4L) // in-degrees account for all edges
  }

  test("pageRank is deterministic across runs and partitionings") {
    val a = Graphs.pageRank(docs(32), iters = 2).orderBy("doc_id").collect()
    val b = Graphs.pageRank(docs(32).repartition(7), iters = 2)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("hllDistinct: registers/rho bit-identical to a driver-side replay; estimate within 3σ") {
    val n = 5000
    val df = (0 until n).map(i => ("g", s"u$i")).toDF("grp", "key")
    val row = Sketches.hllDistinct(df, col("key"), Seq("grp")).collect()(0)
    val (m, nz, sumInv, est, exact, errPpm) =
      (row.getInt(1), row.getLong(2), row.getLong(3), row.getLong(4),
        row.getLong(5), row.getLong(6))
    assert(m == 1024 && exact == n)
    // replay the 40-bit hash → register/rho stream on the driver
    val regs = scala.collection.mutable.Map[Long, Int]()
    for (i <- 0 until n) {
      val h = java.lang.Long.parseLong(md5hex(s"hll:u$i").take(10), 16)
      val reg = h >>> 30
      val low = h & ((1L << 30) - 1)
      val rho = if (low == 0L) 31 else 31 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      regs(reg) = math.max(regs.getOrElse(reg, 0), rho)
    }
    val wantSumInv = regs.values.map(r => 1L << (31 - r)).sum +
      (1024L - regs.size) * (1L << 31)
    assert(nz == regs.size && sumInv == wantSumInv)
    assert(est == math.round(720541.0 * 1048576.0 * 2147483648.0 / sumInv.toDouble))
    // HLL std error for m=1024 is 1.04/32 ≈ 3.25%; 3σ ≈ 9.8% ⇒ 98k ppm
    assert(errPpm < 100000L, s"err_ppm $errPpm out of 3σ band")
  }

  test("countMinHeavyHitters: bit-identical to a driver-side grid replay; one-sided error") {
    // corpus with a known skew: 'hot' 30×, 'warm' 10×, filler words 1×
    val txt = (Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
      (0 until 50).map(i => s"w$i")).mkString(" ")
    val docs = Seq(1L -> txt).toDF("doc_id", "text")
    val rows = Sketches.countMinHeavyHitters(docs, d = 4, w = 1024, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.head._1 == "hot" && rows.head._2 == 30L)
    assert(rows(1)._1 == "warm" && rows(1)._2 == 10L)
    assert(rows.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact && over >= 0 })
    // full driver-side replay of the d×w grid: ONE md5 per token, row
    // r's cell from the digest's r-th 32-bit hex segment
    def cellOf(t: String, r: Int): Long =
      java.lang.Long.parseLong(
        md5hex(s"cms:$t").substring(r * 8, r * 8 + 8), 16) % 1024
    val toks = txt.split("\\s+").toSeq
    val grid = scala.collection.mutable.Map[(Int, Long), Long]()
    for (t <- toks; r <- 0 until 4) {
      val c = cellOf(t, r)
      grid((r, c)) = grid.getOrElse((r, c), 0L) + 1
    }
    for ((tok, _, est, _) <- rows) {
      val want = (0 until 4).map(r => grid((r, cellOf(tok, r)))).min
      assert(est == want, s"estimate mismatch for '$tok'")
    }
    // caller-candidates path: pure sketch estimates, no exact column, and
    // the same grid values for the probed tokens
    val cands = Seq("hot", "warm", "w0").toDF("token")
    val slim = Sketches.countMinHeavyHitters(docs, candidates = Some(cands))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(slim.keySet == Set("hot", "warm", "w0"))
    val full = rows.map(r => r._1 -> r._3).toMap
    assert(slim.forall { case (t, e) => e == full(t) })
  }

  test("quantizedTopK: codes match a driver replay, ranking is integer-exact, planted dup wins") {
    import graft.operators.Similarity
    // 8-dim corpus: id 0 and id 9 are near-identical (planted dup); the
    // rest are axis-ish vectors with distinct directions
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      0L -> Seq(0.9f, 0.1f, -0.3f, 0.5f, 0.0f, -0.7f, 0.2f, 0.4f),
      9L -> Seq(0.89f, 0.11f, -0.29f, 0.5f, 0.01f, -0.69f, 0.2f, 0.41f)) ++
      (1L to 8L).map(i => i -> (0 until 8).map(j =>
        if (j == (i % 8)) 1.0f else 0.05f * ((i + j) % 3 - 1)).toSeq)
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(df, df.filter($"vec_id" === 0L), 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver replay: per-dim amax over the corpus, symmetric int8 codes
    val dim = 8
    val amax = (0 until dim).map(j => vecs.map(_._2(j).abs).max)
    def code(v: Seq[Float]): Seq[Long] = (0 until dim).map { j =>
      if (amax(j) == 0f) 0L
      else math.round(v(j).toDouble * 127.0 / amax(j).toDouble)
    }
    val codes = vecs.map { case (id, v) => id -> code(v) }.toMap
    val want = codes.filter(_._1 != 0L).toSeq
      .map { case (id, c) => (id, c.zip(codes(0L)).map { case (a, b) => a * b }.sum) }
      .sortBy { case (id, d) => (-d, id) }.take(3)
    assert(got.map(r => (r._1, r._2)).toSeq == want)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L))
    assert(got.head._1 == 9L, "planted near-duplicate must rank first")
    // all codes stay in the int8 envelope
    assert(codes.values.forall(_.forall(c => c >= -127 && c <= 127)))
  }

  test("pqTopK: full driver replay — codebook sample, argmin encode, ADC = LUT sum, exact_l2 grounds") {
    import graft.operators.Similarity
    // 16-dim corpus (m=8 → 2-dim subspaces), ks=4 codebook; ids chosen so
    // the md5 sample order is non-trivial
    val dim = 16
    val vecs: Seq[(Long, Seq[Float])] = (0L until 10L).map { i =>
      i -> (0 until dim).map(j =>
        (((i * 31 + j * 17) % 13).toFloat - 6f) / 6f).toSeq
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(df, df.filter($"vec_id" === 3L), 4,
        m = 8, ks = 4)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ---- driver replay ----
    val amax = (0 until dim).map(j => vecs.map(_._2(j).abs).max)
    // Spark round() is HALF_UP (away from zero on negatives) — math.round
    // would drift on exact -x.5 codes
    def code(v: Seq[Float]): Seq[Long] = (0 until dim).map { j =>
      if (amax(j) == 0f) 0L
      else BigDecimal(v(j).toDouble * 127.0 / amax(j).toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val codes = vecs.map { case (id, v) => id -> code(v) }.toMap
    // codebook: the 4 (md5, id)-smallest ids' codes, index = sample rank
    val cbIds = vecs.map(_._1).sortBy(id =>
      (java.lang.Long.parseLong(md5hex(s"pqcb:$id").take(15), 16), id)).take(4)
    val cb: Seq[Seq[Seq[Long]]] = (0 until 8).map(j =>
      cbIds.map(id => codes(id).slice(j * 2, j * 2 + 2)))
    def subDist(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def encode(c: Seq[Long]): Seq[Int] = (0 until 8).map { j =>
      val sv = c.slice(j * 2, j * 2 + 2)
      val ds = cb(j).map(subDist(sv, _))
      ds.indexOf(ds.min) // first hit = smallest index on ties
    }
    val qc = codes(3L)
    val want = vecs.map(_._1).filter(_ != 3L).map { id =>
      val adc = (0 until 8).map(j =>
        subDist(qc.slice(j * 2, j * 2 + 2), cb(j)(encode(codes(id))(j)))).sum
      (id, adc, subDist(qc, codes(id)))
    }.sortBy { case (id, adc, _) => (adc, id) }.take(4)
    assert(got.map(r => (r._2, r._3, r._4)).toSeq ==
      want.map { case (id, adc, ex) => (id, adc, ex) })
    assert(got.map(_._5).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.forall(_._1 == 3L))
    // ADC estimates ground against exact: a vector sharing its codebook
    // entry scores the distance to that ENTRY, never negative
    assert(got.forall(_._3 >= 0L))
    // slim at-scale shape: withExact=false drops the full-code re-attach
    assert(Similarity.pqTopK(df, df.filter($"vec_id" === 3L), 2,
        m = 8, ks = 4, withExact = false).columns.toSeq ==
      Seq("q_id", "n_id", "adc_dist", "rk"))
  }

  test("pq_encode expression is bit-identical to the column-algebra reference") {
    // q56's codes (and so its ADC ranking) depend on EXACT argmin ties:
    // the primitive pass must reproduce the array_position-first-hit
    // rule — exercised with a codebook containing DUPLICATE entries so
    // ties actually occur, plus negative codes and m=1/ks=1 edges
    import graft.operators.Similarity
    graft.functions.GraftExpressions.register(spark)
    import org.apache.spark.sql.functions.typedlit
    val m = 4; val sub = 2; val ks = 3
    // cb[j][c][i]; entries 0 and 2 of every subspace are IDENTICAL → tie
    val cb: Seq[Seq[Seq[Int]]] = Seq.tabulate(m)(j =>
      Seq(Seq(j, -j), Seq(j * 2 - 3, 5 - j), Seq(j, -j)))
    val codes = (0L until 40L).map(r =>
      r -> (0 until m * sub).map(i =>
        (((r * 37 + i * 11) % 255) - 127).toInt).toSeq)
    val df = codes.toDF("id", "code")
    val both = df.select(col("id"),
      graft.functions.GraftExpressions
        .pq_encode(col("code"), cb.flatten.flatten, m, ks).as("fast"),
      Similarity.pqEncodeSpec(col("code"), typedlit(cb), m, ks, sub).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"pq encode mismatch for row ${r.getLong(0)}")
    }
    // the planted tie resolves to index 0, never 2
    assert(both.forall(!_.getSeq[Int](1).contains(2)),
      "duplicate codebook entry must resolve to the FIRST index")
  }

  test("histogramQuantiles: matches a driver-side replay; width=1 degenerates to exact") {
    // two groups with hand-built token counts: g1 = 10,20,...,100 (one
    // doc each); g2 = constant 7 tokens
    def textOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = ((1 to 10).map(i => (i.toLong, textOf(i * 10), "g1")) ++
      (11L to 15L).map(i => (i, textOf(7), "g2")))
      .toDF("doc_id", "text", "source")
    val got = Sketches.histogramQuantiles(docs)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // driver replay of the integer recurrence (width=4, buckets=1024)
    def replay(ns: Seq[Long], pct: Int): (Long, Long) = {
      val need = (pct * ns.length + 99) / 100
      val hist = ns.groupBy(n => math.min(n / 4, 1023L)).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cum = 0L
      val (b, cnt, before) = hist.collectFirst {
        case (b, c) if { cum += c; cum >= need } => (b, c, cum - c)
      }.get
      val est = b * 4 + ((need - before - 1) * 4) / cnt
      (est, ns.sorted.apply(need.toInt - 1)) // type-1 exact
    }
    for (grp <- Seq("g1", "g2"); pct <- Seq(50, 90, 99)) {
      val ns = if (grp == "g1") (1 to 10).map(_ * 10L) else Seq.fill(5)(7L)
      val (est, exact) = replay(ns, pct)
      val (nd, gotEst, gotExact, err) = got((grp, pct))
      assert(nd == ns.length && gotEst == est && gotExact == exact &&
        err == est - exact, s"($grp,$pct): got $gotEst/$gotExact want $est/$exact")
    }
    // width=1: every bucket holds one token-count value, so the estimate
    // IS the exact type-1 quantile (err uniformly 0)
    val exact1 = Sketches.histogramQuantiles(docs, width = 1).collect()
    assert(exact1.forall(_.getLong(5) == 0L), "width=1 must be exact")
    // slim shape at scale
    assert(Sketches.histogramQuantiles(docs, withExact = false).columns.toSeq ==
      Seq("source", "pct", "n_docs", "est_tok"))
  }

  test("hllDistinct: per-group isolation and withExact=false column shape") {
    val df = ((0 until 100).map(i => ("a", s"k$i")) ++
      (0 until 7).map(i => ("b", s"k$i"))).toDF("grp", "key")
    val rows = Sketches.hllDistinct(df, col("key"), Seq("grp"))
      .orderBy("grp").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getLong(5) == 100L && rows(1).getLong(5) == 7L)
    // tiny cardinalities: every distinct key should populate its own
    // register with overwhelming probability at m=1024
    assert(rows(1).getLong(2) <= 7L)
    val slim = Sketches.hllDistinct(df, col("key"), Seq("grp"), withExact = false)
    assert(slim.columns.toSeq ==
      Seq("grp", "m", "nonzero_registers", "sum_inv", "est_micro"))
  }
}
