package graft

/** Typed error hierarchy — reference `MoonshotError` /
  * `MoonshotParameterError` (exceptions.py:15-18). Migrating callers catch
  * engine errors distinctly (`catch { case e: ParameterError => … }`)
  * exactly as they caught the reference's types.
  *
  * Extends `IllegalArgumentException` so pre-existing callers (and specs)
  * that catch the generic JVM type keep working — messages are unchanged.
  *
  * Classification mirrors the reference: [[ParameterError]] for
  * misconfigured strategy/engine parameters detected at planning time
  * (missing master, reserved result names, bad model spec —
  * base.py:885,932,1372); [[GraftError]] for data-dependent runtime
  * conditions (stale prices, missing benchmark sid — base.py:782,1481).
  */
class GraftError(message: String) extends IllegalArgumentException(message)

/** Misconfigured parameter — reference `MoonshotParameterError`. */
class ParameterError(message: String) extends GraftError(message)
