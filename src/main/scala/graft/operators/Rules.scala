package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's generic predicate/rule engine re-expressed as pure
  * Catalyst `Column` expressions (SURVEY.md P5/P6; rules.py:31-176,249-301).
  *
  * All 16 condition operators compile to built-in expressions — no UDFs, so
  * every rule evaluation stays inside whole-stage codegen and is eligible
  * for predicate pushdown when used as a filter.
  *
  * Dot-path fields (`a.b.c` into nested structs) map directly to Spark's
  * `col("a.b.c")` struct access.
  */
object Rules {

  /** rules.py ConditionOperator values, 1:1. */
  object Op extends Enumeration {
    val Equals, NotEquals, GreaterThan, LessThan, GreaterEqual, LessEqual,
      Contains, NotContains, StartsWith, EndsWith, RegexMatch,
      InList, NotInList, IsEmpty, IsNotEmpty, Between = Value
  }

  /** One condition over a dot-path field (rules.py:31-48). For string ops
    * `caseSensitive=false` lowercases both sides (rules.py:101-104).
    */
  final case class Condition(
      field: String,
      op: Op.Value,
      value: Any = null,
      value2: Any = null, // upper bound for Between
      caseSensitive: Boolean = true)

  private def litOf(v: Any): Column = v match {
    case c: Column => c
    case other     => lit(other)
  }

  /** Compile one condition to a Column predicate. Null field values fail
    * every operator except IsEmpty (rules.py:93-99: None → is_empty true,
    * is_not_empty false, everything else false).
    */
  def compile(c: Condition): Column = {
    val raw = col(c.field)
    def str(x: Column): Column = if (c.caseSensitive) x else lower(x)
    val f = str(raw.cast("string"))
    val v = str(litOf(c.value).cast("string"))
    val base: Column = c.op match {
      // numeric values compare NUMERICALLY (the reference's Python ==:
      // 1 == 1.0 is True); the string-cast form would render them
      // differently ("1" vs "1.0") and silently never match. Strings keep
      // the documented case handling.
      case Op.Equals => c.value match {
        case _: String => f === v
        case _ => raw === litOf(c.value)
      }
      case Op.NotEquals => c.value match {
        case _: String => f =!= v
        case _ => raw =!= litOf(c.value)
      }
      case Op.GreaterThan  => raw > litOf(c.value)
      case Op.LessThan     => raw < litOf(c.value)
      case Op.GreaterEqual => raw >= litOf(c.value)
      case Op.LessEqual    => raw <= litOf(c.value)
      case Op.Contains     => f.contains(v)
      case Op.NotContains  => !f.contains(v)
      case Op.StartsWith   => f.startsWith(v)
      case Op.EndsWith     => f.endsWith(v)
      // rules.py:101-104 lowercases BOTH sides when case-insensitive —
      // lowercasing only the subject would make any pattern containing an
      // uppercase letter match nothing; null pattern matches nothing
      case Op.RegexMatch =>
        if (c.value == null) lit(false)
        else f.rlike(
          if (c.caseSensitive) c.value.toString else c.value.toString.toLowerCase)
      case Op.InList =>
        val vs = c.value.asInstanceOf[Seq[Any]].map(x => if (c.caseSensitive) x.toString else x.toString.toLowerCase)
        f.isin(vs: _*)
      case Op.NotInList =>
        val vs = c.value.asInstanceOf[Seq[Any]].map(x => if (c.caseSensitive) x.toString else x.toString.toLowerCase)
        !f.isin(vs: _*)
      case Op.IsEmpty    => raw.isNull || trim(raw.cast("string")) === ""
      case Op.IsNotEmpty => raw.isNotNull && trim(raw.cast("string")) =!= ""
      case Op.Between    => raw.between(litOf(c.value), litOf(c.value2))
    }
    if (c.op == Op.IsEmpty) base
    else raw.isNotNull && base
  }

  /** A rule: ALL conditions must hold (conjunction, rules.py:276-283);
    * higher priority wins on overlap (rules.py:262: sorted desc).
    */
  final case class Rule(name: String, priority: Int, conditions: Seq[Condition])

  /** Conjunction of conditions (empty = always true) — the one shared
    * definition of "this rule matches", used by both the tagging ladder
    * and the action engine so their semantics can never drift.
    */
  def conditionsMatch(cs: Seq[Condition]): Column =
    cs.map(compile).reduceOption(_ && _).getOrElse(lit(true))

  def ruleMatches(r: Rule): Column = conditionsMatch(r.conditions)

  /** Apply a rule set as a priority-ordered when-ladder producing the name
    * of the first (highest-priority) matching rule, else `default`.
    */
  def firstMatch(rules: Seq[Rule], default: String = "none"): Column =
    rules.sortBy(r => (-r.priority, r.name))
      .foldRight(lit(default): Column)((r, acc) => when(ruleMatches(r), lit(r.name)).otherwise(acc))

  /** Tag a DataFrame with the winning rule per row. */
  def applyRules(df: DataFrame, rules: Seq[Rule], outCol: String = "rule"): DataFrame =
    df.withColumn(outCol, firstMatch(rules))

  // ------------------------- rule ACTIONS (P6) -------------------------
  // rules.py:180-246 RuleAction.execute + :249-301 ProcessingRule.execute +
  // :587-610 RuleEngine.apply_rules: rules run in priority-desc order over
  // an EVOLVING context (later rules see earlier rules' mutations); a rule
  // fires when ALL its conditions hold; its actions run in list order;
  // stop_processing short-circuits every later rule for that row.

  // LOG_MESSAGE (rules.py:213-217) has no column-mutation analog: its
  // engine-shaped counterpart is the `appliedCol` audit trail, which
  // records exactly which rules fired per row.
  sealed trait Action
  /** rules.py:190-196 — dot-path context mutation. */
  final case class SetValue(fieldPath: String, value: Any) extends Action
  /** rules.py:198-201 — context["confidence_threshold"] = c. */
  final case class SetConfidence(confidence: Double = 0.75) extends Action
  /** rules.py:203-206 — context["ocr_language"] = l. */
  final case class SetLanguage(language: String = "eng") extends Action
  /** rules.py:208-211 — context["ocr_mode"] = m. */
  final case class SetMode(mode: String = "hybrid") extends Action
  /** rules.py:219-221 — context["stop_processing"] = True. */
  case object StopProcessing extends Action
  /** templates.py:317-320 add_preprocessing — APPEND steps to the
    * context's preprocessing list (the only list-valued rule action).
    */
  final case class AddPreprocessing(
      steps: Seq[String], fieldPath: String = "preprocessing_steps") extends Action

  /** A rule with actions (ProcessingRule, rules.py:249-262). */
  final case class ActionRule(
      name: String, priority: Int,
      conditions: Seq[Condition], actions: Seq[Action])

  /** The reference's default processing context (config.py defaults). */
  val defaultContext: Seq[(String, Column)] = Seq(
    "ocr_mode" -> lit("hybrid"),
    "ocr_language" -> lit("eng"),
    "confidence_threshold" -> lit(0.75),
    "stop_processing" -> lit(false))

  /** Seed the context columns a rule set mutates (only those absent). */
  def withContext(df: DataFrame, ctx: Seq[(String, Column)] = defaultContext): DataFrame =
    ctx.foldLeft(df) { case (d, (name, v)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, v)
    }

  /** Set a (possibly dot-nested) field to `v` where `m` holds, preserving
    * the row's value elsewhere — the columnar form of `_set_nested_value`
    * (rules.py:233-244: intermediate levels are created when missing).
    *
    * When the path traverses an EXISTING non-struct column (the dict-world
    * analog: `current[key]` is a string and the next level assignment
    * raises TypeError), the reference catches the exception and leaves the
    * context unchanged (rules.py:229-232: `except Exception` → the action
    * reports success=False, nothing mutates). In a fixed-schema DataFrame
    * the non-struct type is a schema-level property — the same TypeError
    * would fire for every row — so the faithful columnar translation is a
    * whole-action NO-OP, never a partial write (a `when(m, ...)` without
    * `.otherwise` here would silently null the column for unmatched rows —
    * data corruption the reference can't produce).
    */
  private def setPath(df: DataFrame, path: String, m: Column, v: Column): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val parts = path.split('.').toList

    /** struct literal for the remaining path, leaf = v (created levels) */
    def chain(rest: List[String]): Column = rest match {
      case Nil       => v
      case k :: more => struct(chain(more).as(k))
    }

    /** update inside an existing struct column; None = the path hit an
      * existing non-struct intermediate (reference TypeError → no-op)
      */
    def upd(c: Column, st: StructType, rest: List[String]): Option[Column] = rest match {
      case last :: Nil =>
        val existing =
          if (st.fieldNames.contains(last)) c.getField(last) else lit(null)
        Some(c.withField(last, when(m, v).otherwise(existing)))
      case k :: more =>
        st.find(_.name == k).map(_.dataType) match {
          case Some(child: StructType) =>
            // a per-row NULL inner struct would swallow the write exactly
            // like the top level (null.withField = null) — coalesce every
            // descended level to its typed all-null struct
            val childNull = struct(
              child.fields.toSeq.map(f0 => lit(null).cast(f0.dataType).as(f0.name)): _*)
            upd(coalesce(c.getField(k), childNull), child, more)
              .map(c.withField(k, _))
          case Some(_) => None // existing non-struct level: TypeError analog
          case None    =>
            // missing key: created level — the field did not exist, so null
            // where unmatched is exactly "key still absent"
            Some(c.withField(k, when(m, chain(more))))
        }
      case Nil => Some(c)
    }

    parts match {
      case head :: Nil if df.columns.contains(head) =>
        df.withColumn(head, when(m, v).otherwise(col(head)))
      case head :: Nil =>
        df.withColumn(head, when(m, v)) // new column; null where unmatched
      case head :: rest if df.columns.contains(head) =>
        df.schema(head).dataType match {
          case st: StructType =>
            // a NULL struct would swallow withField (null.withField = null):
            // coalesce to a typed all-null struct first — "absent key" maps
            // to a null FIELD inside an always-present struct (the fixed-
            // schema columnar analog of the reference's dict context)
            val nullStruct = struct(
              st.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
            upd(coalesce(col(head), nullStruct), st, rest)
              .map(df.withColumn(head, _))
              .getOrElse(df) // non-struct intermediate inside: no-op
          case _ => df // existing non-struct head: TypeError analog — no-op
        }
      case head :: rest =>
        df.withColumn(head, when(m, chain(rest)))
      case Nil => df
    }
  }

  /** Execute a rule set over the DataFrame: for each rule in priority-desc
    * order (ties broken by name, matching `applyRules`), rows where all
    * conditions hold — evaluated against the CURRENT, already-mutated
    * context — get the rule's actions applied in list order. A row whose
    * `stop_processing` was set by an earlier rule executes no further
    * rules. Everything compiles to when-ladders over columns: whole-stage
    * codegen, no UDFs, one narrow projection.
    *
    * `appliedCol` (optional) accumulates the names of the rules that fired
    * per row, in execution order.
    */
  def applyActions(
      df0: DataFrame, rules: Seq[ActionRule],
      appliedCol: Option[String] = None): DataFrame = {
    val matchedTmp = "__rule_matched"
    val seeded = {
      val d = withContext(df0)
      appliedCol match {
        case Some(c) if !d.columns.contains(c) =>
          d.withColumn(c, array().cast("array<string>"))
        case Some(c) =>
          // a pre-existing audit column with NULLs (outer join, user data)
          // would swallow every append (array_append(null, x) = null)
          d.withColumn(c, coalesce(col(c), array().cast("array<string>")))
        case _ => d
      }
    }
    val applied = rules.sortBy(r => (-r.priority, r.name)).foldLeft(seeded) { (d, r) =>
      // pin the evaluation: conditions are checked ONCE per rule, before
      // any of the rule's own actions mutate the columns they read
      val cond = conditionsMatch(r.conditions)
      // coalesce: a pre-existing stop_processing with NULLs (withContext
      // seeds only when absent) must read as "not stopped", matching the
      // reference context's always-initialized False
      val d1 = d.withColumn(matchedTmp,
        !coalesce(col("stop_processing"), lit(false)) && cond)
      val m = col(matchedTmp)
      val d2 = r.actions.foldLeft(d1) { (dd, a) =>
        a match {
          case SetValue(p, value)   => setPath(dd, p, m, litOf(value))
          case SetConfidence(c)     => setPath(dd, "confidence_threshold", m, lit(c))
          case SetLanguage(l)       => setPath(dd, "ocr_language", m, lit(l))
          case SetMode(mode)        => setPath(dd, "ocr_mode", m, lit(mode))
          case StopProcessing       =>
            dd.withColumn("stop_processing", col("stop_processing") || m)
          case AddPreprocessing(steps, path) =>
            // templates.py:318: steps = config.get(path, []); steps.extend(...)
            // FLAT column only: a dotted path would create a literal
            // dotted top-level column the read-back then mis-resolves as
            // nested access — reject eagerly (nested writes are SetValue's
            // dot-path semantics, list-append has no nested analog here)
            require(!path.contains('.'),
              s"AddPreprocessing fieldPath must be a flat column name, got '$path'")
            val existing =
              if (dd.columns.contains(path)) col(path)
              else array().cast("array<string>")
            val appended = concat(coalesce(existing, array().cast("array<string>")),
              array(steps.map(lit): _*))
            dd.withColumn(path, when(m, appended)
              .otherwise(if (dd.columns.contains(path)) col(path)
                else array().cast("array<string>")))
        }
      }
      val d3 = appliedCol.fold(d2)(c => d2.withColumn(c,
        when(m, array_append(col(c), lit(r.name))).otherwise(col(c))))
      d3.drop(matchedTmp)
    }
    applied
  }
}
