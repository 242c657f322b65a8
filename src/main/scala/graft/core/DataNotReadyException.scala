package graft.core

/** A build refusal whose cause is the DATA, not the config: the input
  * exists but holds no rows yet (an upstream ingestion job that hasn't
  * landed), so re-running later can succeed without any human edit.
  * [[graft.Orchestrator.runScheduled]] retries these under the
  * schedule's backoff policy, while plain [[IllegalArgumentException]]
  * config refusals fail once, loudly — retrying a config typo replays
  * the same refusal.
  *
  * Extends IllegalArgumentException so every existing catch site keeps
  * treating it as a refusal (CLI exit codes, test intercepts); only the
  * scheduler's dispatch distinguishes the two. A MISSING input path is
  * deliberately NOT this type: an empty table is "upstream not landed",
  * but a path that doesn't exist is indistinguishable from a typo and
  * fails once (it surfaces as AnalysisException PATH_NOT_FOUND).
  */
final class DataNotReadyException(msg: String)
    extends IllegalArgumentException(msg)
