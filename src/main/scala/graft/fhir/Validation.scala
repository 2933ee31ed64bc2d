package graft.fhir

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic validation pack (SURVEY A18 semantic half + A20):
  * R4B constraints as boolean Column expressions, evaluated either as a
  * summary aggregation or IN-BAND via `Dataset.observe` (metrics ride the
  * same job as the transform — no second scan, which is the 100 TB way to
  * validate: one pass, counters collected by the driver via listener).
  *
  * Constraint inventory mirrors the Google-validator error corpus the
  * reference transforms exist to fix
  * (/root/reference/scripts/README-transform.md:9-31), including the
  * deliberate waiver for attachment.size (R4 unsignedInt vs R5 integer64,
  * transform.py:139-141): the size rule only requires non-negativity.
  */
object Validation {

  final case class Rule(name: String, valid: Column)

  private val EncounterStatuses = Seq("planned", "arrived", "triaged",
    "in-progress", "onleave", "finished", "cancelled", "entered-in-error",
    "unknown")

  /** R4B Encounter constraints (status vocab, class presence). */
  def encounterRules: Seq[Rule] = Seq(
    Rule("status_in_vocab", col("status").isInCollection(EncounterStatuses)),
    Rule("class_present", col("class").isNotNull))

  /** R4B DocumentReference constraints: subject must not be a Specimen
    * (README-assay.md:22-24) and attachment sizes non-negative (the
    * unsignedInt half of the waived rule).
    */
  def documentReferenceRules: Seq[Rule] = Seq(
    Rule("subject_not_specimen",
      coalesce(!col("subject.reference").startsWith("Specimen/"), lit(true))),
    Rule("attachment_size_nonneg",
      coalesce(forall(col("content"), c =>
        coalesce(c.getField("attachment").getField("size") >= 0L, lit(true))),
        lit(true))))

  /** R4B ResearchSubject: status vocabulary (R5 "active" is invalid). */
  def researchSubjectRules: Seq[Rule] = Seq(
    Rule("status_in_vocab", col("status").isInCollection(Seq(
      "candidate", "eligible", "follow-up", "ineligible", "not-registered",
      "off-study", "on-study", "on-study-intervention",
      "on-study-observation", "pending-on-study", "potential-candidate",
      "screening", "withdrawn"))))

  /** One summary row: violation count per rule. */
  def summarize(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      rules.map(r => sum(when(!r.valid, 1L).otherwise(0L)).as(s"bad_${r.name}")): _*)

  /** In-band validation: attach the violation counters to `df` itself via
    * Dataset.observe — they materialize when the CALLER's action runs, so
    * validation costs zero extra scans. Read them from the observation
    * listener or `Observation.get`.
    */
  def observed(df: DataFrame, metricName: String, rules: Seq[Rule]): DataFrame =
    df.observe(metricName,
      count(lit(1)).as("n_rows"),
      rules.map(r => sum(when(!r.valid, 1L).otherwise(0L)).as(s"bad_${r.name}")): _*)
}
