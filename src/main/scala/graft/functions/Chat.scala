package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Conversation-structure predicates over (roles, bodies) array
  * columns — ONE definition shared by the batch screen
  * (`d41_turn_validate`) and the ingest-time streaming twin
  * (`Pipelines.streamTurnValidate`), so the two gates can never
  * drift. All predicates are in-row array folds: no explode, no
  * join, no aggregation state — scan-speed at any corpus size, and
  * trivially stateless on a stream. Flags are 0/1 longs (the d41
  * column convention).
  */
object Chat {

  /** Prompt identity: the d8 polynomial fingerprint of the normalized
    * first user turn (first 8 whitespace tokens) — ONE definition
    * shared by the batch dedup (`d42_prompt_dedup`), the preference-
    * pair builder (`d44_preference_pairs`) and the ingest-time screen
    * (`Pipelines.streamPromptScreen`). */
  def promptFingerprint(text: Column): Column =
    Text.fingerprint(array_join(slice(Text.tokens(text), 1, 8), " "))

  /** The conversation opens with the user. */
  def firstUser(roles: Column): Column =
    when(element_at(roles, 1) === "user", 1L).otherwise(0L)

  /** Roles alternate strictly — no two consecutive turns share a
    * role. Single-turn conversations pass vacuously. */
  def alternationOk(roles: Column): Column =
    when(size(roles) < 2 ||
      size(filter(sequence(lit(0L), size(roles).cast("long") - 2), i =>
        element_at(roles, (i + 1).cast("int")) ===
          element_at(roles, (i + 2).cast("int")))) === 0, 1L)
      .otherwise(0L)

  /** No empty turn bodies. */
  def noEmpty(bodies: Column): Column =
    when(size(filter(bodies, b => b === "")) === 0, 1L).otherwise(0L)

  /** The conversation closes with the assistant (a trailing user turn
    * has no supervised target). */
  def endsAssistant(roles: Column): Column =
    when(element_at(roles, size(roles)) === "assistant", 1L).otherwise(0L)

  /** All structural gates at once, plus the ≥ 1 full exchange
    * requirement. */
  def valid(roles: Column, bodies: Column): Column =
    firstUser(roles) * alternationOk(roles) * noEmpty(bodies) *
      endsAssistant(roles) * when(size(roles) >= 2, 1L).otherwise(0L)
}
