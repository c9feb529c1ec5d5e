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
      case Op.Equals       => f === v
      case Op.NotEquals    => f =!= v
      case Op.GreaterThan  => raw > litOf(c.value)
      case Op.LessThan     => raw < litOf(c.value)
      case Op.GreaterEqual => raw >= litOf(c.value)
      case Op.LessEqual    => raw <= litOf(c.value)
      case Op.Contains     => f.contains(v)
      case Op.NotContains  => !f.contains(v)
      case Op.StartsWith   => f.startsWith(v)
      case Op.EndsWith     => f.endsWith(v)
      case Op.RegexMatch   => f.rlike(c.value.toString)
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

  def ruleMatches(r: Rule): Column =
    r.conditions.map(compile).reduceOption(_ && _).getOrElse(lit(true))

  /** Apply a rule set as a priority-ordered when-ladder producing the name
    * of the first (highest-priority) matching rule, else `default`.
    */
  def firstMatch(rules: Seq[Rule], default: String = "none"): Column =
    rules.sortBy(r => (-r.priority, r.name))
      .foldRight(lit(default): Column)((r, acc) => when(ruleMatches(r), lit(r.name)).otherwise(acc))

  /** Tag a DataFrame with the winning rule per row. */
  def applyRules(df: DataFrame, rules: Seq[Rule], outCol: String = "rule"): DataFrame =
    df.withColumn(outCol, firstMatch(rules))
}
