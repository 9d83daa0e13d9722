package graft.genai

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight request validation — distributed form of the reference's
  * `validate_request` (openai_batch_processor.py:92): instead of one
  * synchronous probe call, every request is structurally checked, and
  * the pipeline can halt on any invalid row (as the reference halts on
  * a failed probe).
  *
  * Scale: per-row predicates, codegen'd, no shuffle.
  */
object Validation {
  private val allowedModels = Seq("gpt-4.1-nano", "gpt-4o-mini", "gpt-4o")

  /** Adds is_valid + reason (first failing rule, else NULL). */
  def validate(requests: DataFrame): DataFrame =
    requests
      .withColumn("reason",
        when(col("max_tokens") <= 0, lit("max_tokens_out_of_range"))
          .when(!col("model").isin(allowedModels.map(lit(_)): _*), lit("unknown_model"))
          .when(length(col("user_content")) === 0, lit("empty_prompt"))
          .when(length(col("user_content")) > 4000, lit("prompt_too_long"))
          .otherwise(lit(null).cast("string")))
      .withColumn("is_valid", col("reason").isNull)
}
