package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Middleware combinators — the reference's declared-but-unwired
 * `PageMiddleware`/`URLMiddleware` decorators incl. SkipURLsMiddleware
 * (/root/reference/worker.go:1175-1185). In a declarative engine these are
 * just `DataFrame => DataFrame` stages; they compose with `andThen` and
 * slot in front of `Crawler.addSeedCandidates` (URL side) or after the
 * fetch stage (page side).
 */
object Middleware {

  type UrlMiddleware = DataFrame => DataFrame
  type PageMiddleware = DataFrame => DataFrame

  /** Drop URLs matching any of the given regex patterns
    * (SkipURLsMiddleware analogue). */
  def skipUrls(patterns: Seq[String]): UrlMiddleware = { df =>
    if (patterns.isEmpty) df
    else df.filter(!patterns.map(col("url").rlike(_)).reduce(_ || _))
  }

  /** Keep only URLs under the given eTLD+1s (OnlyTLD-flavored filter,
    * store/url.go:35-44 generalized). */
  def onlyRegistrable(domains: Seq[String]): UrlMiddleware = { df =>
    graft.functions.GraftExpressions.register(df.sparkSession)
    df.filter(graft.functions.GraftExpressions.etld1(
      graft.functions.GraftExpressions.url_host(col("url")))
      .isin(domains: _*))
  }

  /** Compose middlewares left-to-right. */
  def chain(ms: UrlMiddleware*): UrlMiddleware =
    ms.foldLeft(identity[DataFrame] _)(_ andThen _)
}
