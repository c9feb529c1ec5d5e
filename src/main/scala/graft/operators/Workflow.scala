package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed, branching, multi-step WORKFLOWS over DataFrames — the
  * reference's workflow engine (workflows.py:33-54 ActionType, :139-208
  * execute dispatch, :556 WorkflowManager) re-expressed as a fold of
  * masked column transformations:
  *
  *   - every step runs under a row MASK (which rows the step applies to);
  *     `Conditional` splits the mask by a predicate over the CURRENT
  *     columns — i.e. over earlier steps' outputs — exactly the
  *     reference's per-document context threading (workflows.py:166-171:
  *     `output_variable` lands in the context; :397-430 conditional
  *     branches read it);
  *   - the whole chain compiles to nested when-ladders in ONE projection:
  *     single scan, whole-stage codegen, no shuffle, no UDFs. A step that
  *     needs the kernel tier (a pooled-parser pass) runs as a preceding
  *     `mapPartitions` stage whose output column the workflow consumes —
  *     the standard steps themselves are pure expressions;
  *   - `auditCol` accumulates the names of the steps that ACTUALLY ran
  *     per row, in execution order (the reference's per-step results list,
  *     workflows.py:476-502).
  *
  * Orchestrator-level actions with no engine analog (send_email, webhook,
  * delay) are out of scope by SURVEY.md; move_file/copy_file map to
  * [[SetOutput]] on a destination column — at engine scale "moving" a
  * document IS routing its row to a sink partition.
  */
object Workflow {

  sealed trait Step { def name: String }

  /** ocr_process (workflows.py:215-243): run an engine over `textCol`,
    * writing `<outPrefix>_text` and `<outPrefix>_quality`.
    */
  final case class Process(
      name: String, engine: Fallback.Engine, textCol: String,
      outPrefix: String = "ocr") extends Step

  /** extract_fields (workflows.py:342-361; templates.py:281-298): one
    * output struct field per template field, built from a Column function
    * of the text (e.g. `regexp_extract`). A non-matching field is the
    * empty string / null — the "required field not found" marker the
    * validate step consumes.
    */
  final case class ExtractFields(
      name: String, textCol: String,
      fields: Seq[(String, Column => Column)],
      out: String = "extracted_fields") extends Step

  /** validate_data (workflows.py:362-396): `required`-rule subset — the
    * output boolean is true iff every required field extracted non-empty.
    */
  final case class ValidateData(
      name: String, required: Seq[String],
      in: String = "extracted_fields", out: String = "validation_ok") extends Step

  /** conditional (workflows.py:397-430): split the current mask by a
    * predicate over the evolving columns; each branch is a full sub-chain.
    * The predicate is pinned to a temp column BEFORE either branch runs,
    * so branch mutations cannot flip the other branch's membership
    * (the reference evaluates `condition` once, then executes one list).
    */
  final case class Conditional(
      name: String, condition: Column,
      ifTrue: Seq[Step], ifFalse: Seq[Step] = Seq.empty) extends Step

  /** move_file/copy_file/set-variable analog (workflows.py:244-290): write
    * `value` into column `out` for the masked rows.
    */
  final case class SetOutput(name: String, out: String, value: Column) extends Step

  /** Masked column write: rows outside `m` keep their existing value
    * (or stay null when the column is being created).
    */
  private def maskedSet(df: DataFrame, out: String, m: Column, v: Column): DataFrame =
    if (df.columns.contains(out)) df.withColumn(out, when(m, v).otherwise(col(out)))
    else df.withColumn(out, when(m, v))

  private def applyStep(df0: DataFrame, step: Step, m: Column,
      auditCol: Option[String],
      pinSeq: java.util.concurrent.atomic.AtomicInteger): DataFrame = {
    // audit BEFORE applying, so a Conditional's name precedes its branch
    // steps' names (execution order: the conditional runs, then one arm)
    val df = auditCol match {
      case Some(a) => df0.withColumn(a,
        when(m, array_append(col(a), lit(step.name))).otherwise(col(a)))
      case None => df0
    }
    step match {
      case Process(_, e, textCol, pre) =>
        val t = e.result(col(textCol))
        val q = coalesce(e.quality(t), lit(0.0))
        maskedSet(maskedSet(df, s"${pre}_text", m, t), s"${pre}_quality", m, q)

      case ExtractFields(_, textCol, fields, out) =>
        val st = struct(fields.map { case (n, f) => f(col(textCol)).as(n) }: _*)
        maskedSet(df, out, m, st)

      case ValidateData(_, required, in, out) =>
        val ok = required
          .map(f => col(in).getField(f).isNotNull && col(in).getField(f) =!= "")
          .reduceOption(_ && _).getOrElse(lit(true))
        maskedSet(df, out, m, ok)

      case Conditional(name, condition, ifTrue, ifFalse) =>
        // unique pin per Conditional INSTANCE: a nested conditional that
        // reuses an outer conditional's name must not clobber (or drop)
        // the outer pin mid-branch
        // sanitized pin name: a step name containing '.' (or backticks)
        // would make col(pin) mis-resolve as nested field access
        val pin = s"__wf_cond_${name.replaceAll("[^A-Za-z0-9_]", "_")}_" +
          pinSeq.getAndIncrement()
        // evaluate the predicate ONLY under the current mask: rows a
        // parent branch excluded may be exactly the rows where the
        // expression errors (ANSI division by zero, malformed casts) —
        // the reference evaluates conditions only for documents that
        // reach the step
        val pinned = df.withColumn(pin, coalesce(when(m, condition), lit(false)))
        val afterTrue = ifTrue.foldLeft(pinned)(
          (d, s) => applyStep(d, s, m && col(pin), auditCol, pinSeq))
        val afterFalse = ifFalse.foldLeft(afterTrue)(
          (d, s) => applyStep(d, s, m && !col(pin), auditCol, pinSeq))
        afterFalse.drop(pin)

      case SetOutput(_, out, value) =>
        maskedSet(df, out, m, value)
    }
  }

  /** Execute the workflow: steps in list order over every row (mask =
    * true), branching per [[Conditional]]. Returns the input plus every
    * step's output columns (and the audit column when requested).
    */
  def run(df: DataFrame, steps: Seq[Step],
      auditCol: Option[String] = None): DataFrame = {
    val seeded = auditCol match {
      case Some(a) if !df.columns.contains(a) =>
        df.withColumn(a, array().cast("array<string>"))
      case _ => df
    }
    val pinSeq = new java.util.concurrent.atomic.AtomicInteger(0)
    steps.foldLeft(seeded)((d, s) => applyStep(d, s, lit(true), auditCol, pinSeq))
  }
}
