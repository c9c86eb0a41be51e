package graft.sources

/** A CDC feed-contract refusal, catchable BY TYPE. The [[CdcApply]]
  * validation weave raises inside Spark expressions (`raise_error`
  * woven into the columns every consumer evaluates — zero extra
  * jobs), so the refusal naturally surfaces wrapped in Spark's job
  * failure (SparkException → SparkRuntimeException
  * [USER_RAISED_EXCEPTION]); a caller distinguishing "the feed is
  * bad, refuse the batch" from "infrastructure died, retry" would
  * otherwise have to substring-match generic exceptions. The apply
  * entry points re-throw as this type; stream consumers (whose
  * failure arrives as a StreamingQueryException around the
  * foreachBatch error) unwrap with [[GraftCdcException.from]]. */
final class GraftCdcException(message: String, cause: Throwable)
  extends RuntimeException(message, cause)

object GraftCdcException {

  /** Tag carried by every woven `raise_error` message — the cause
    * chain is the only channel an expression-level refusal has. */
  private[sources] val Marker = "[GRAFT_CDC] "

  /** The CDC refusal inside `t`'s cause chain, if any: the first
    * marker-tagged message, with Spark's wrapping stripped back to
    * the woven text. None = not a feed-contract refusal. */
  def from(t: Throwable): Option[GraftCdcException] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse(""))
      .find(_.contains(Marker))
      .map { m =>
        val woven = m.substring(m.indexOf(Marker) + Marker.length)
        // Spark error-class framing may suffix the user text (e.g.
        // " SQLSTATE: ..."); keep it — the leading text is ours
        new GraftCdcException(woven, t)
      }
}
