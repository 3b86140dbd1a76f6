package graft.pipeline

/** Pause/resume options — reference parity with
  * lib/flume/pipeline/control/options.ex:1-59:
  *
  *   - `temporary` (default true): affects only this runner — NOT
  *     persisted, so a restart boots the pipeline running again;
  *     `temporary = false` persists the durable paused flag
  *     (pipeline/event.ex:41-55) consulted on boot.
  *   - `async` (default false): return immediately while the in-flight
  *     micro-batch drains in the background (the cast vs call split).
  *   - `timeoutMs` (default 5000): bound on the synchronous drain wait.
  *
  * `sanitize` validates a loose options map exactly like the
  * reference's sanitized_options: unknown keys are dropped, wrongly
  * typed values are errors.
  */
final case class ControlOptions(
    temporary: Boolean = true,
    async: Boolean = false,
    timeoutMs: Long = 5000)

object ControlOptions {
  val Infinity: Long = Long.MaxValue

  def sanitize(opts: Map[String, Any]): Either[String, ControlOptions] = {
    def asBool(key: String, dflt: Boolean): Either[String, Boolean] =
      opts.get(key) match {
        case None => Right(dflt)
        case Some(b: Boolean) => Right(b)
        case Some(v) => Left(s"expected :$key to be a boolean, got: $v")
      }
    def asTimeout(key: String, dflt: Long): Either[String, Long] =
      opts.get(key) match {
        case None => Right(dflt)
        case Some(i: Int) if i >= 0 => Right(i.toLong)
        case Some(l: Long) if l >= 0 => Right(l)
        case Some("infinity") => Right(Infinity)
        case Some(v) =>
          Left(s"expected :$key to be a non-negative integer or infinity, got: $v")
      }
    for {
      async <- asBool("async", dflt = false)
      timeout <- asTimeout("timeout", 5000L)
      temporary <- asBool("temporary", dflt = true)
    } yield ControlOptions(temporary, async, timeout)
  }
}
