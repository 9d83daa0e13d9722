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
    */
  def await(status: () => String,
      pollIntervalMs: Long = 30000L,
      timeoutMs: Long = 7200000L,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep): String = {
    val start = clock()
    var state = status()
    while (!TerminalStates.contains(state) && clock() - start < timeoutMs) {
      sleep(pollIntervalMs)
      state = status()
    }
    if (TerminalStates.contains(state)) state else "timeout"
  }
}
