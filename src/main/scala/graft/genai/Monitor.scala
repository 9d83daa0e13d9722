package graft.genai

/** Polling monitor for an external batch job — the reference's
  * `_monitor_status` loop (vertex_ai_batch_processor.py:204-236,
  * openai_batch_processor.py:184): re-check a status supplier every
  * `pollIntervalMs` until a terminal state arrives or `timeoutMs`
  * elapses, in which case the job "might still be running" and the
  * outcome is `timeout`.
  *
  * The clock and sleeper are injectable so the timeout branch is
  * testable without wall-clock waits; production callers use the
  * defaults.
  */
object Monitor {

  /** Terminal job states across both reference backends (OpenAI
    * completed/failed/expired/cancelled, Vertex JOB_STATE_SUCCEEDED/
    * FAILED/CANCELLED — normalized to lowercase verbs).
    */
  val TerminalStates: Set[String] = Set("completed", "failed", "cancelled", "expired")

  /** Polls `status` until terminal or timed out; returns the final
    * state, or `"timeout"` if the deadline passed first.
    *
    * `onPoll(state, elapsedMs)` fires after every status check — the
    * reference's per-poll progress chatter ("Batch status: ...",
    * openai_batch_processor.py:184-200) as an injectable hook; the
    * default logs nothing so library callers choose their sink.
    */
  def await(status: () => String,
      pollIntervalMs: Long = 30000L,
      timeoutMs: Long = 7200000L,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep,
      onPoll: (String, Long) => Unit = (_, _) => ()): String = {
    val start = clock()
    var state = status()
    onPoll(state, clock() - start)
    while (!TerminalStates.contains(state) && clock() - start < timeoutMs) {
      sleep(pollIntervalMs)
      state = status()
      onPoll(state, clock() - start)
    }
    if (TerminalStates.contains(state)) state else "timeout"
  }

  /** A ready-made `onPoll` in the reference's wording. */
  def printingPoll: (String, Long) => Unit =
    (state, elapsed) => println(s"Batch status: $state (elapsed ${elapsed / 1000}s)")
}
