package graft

import java.time.Instant
import graft.ir.Expr._
import graft.ir.{Expr, TimeInterval}

/** `func.*` façade — the complete reference function library
  * (/root/reference/src/model/func/__init__.py:1-38; whitelist dispatch
  * compilers/sql_function.py:40-74). Everything lowers to Spark built-ins.
  */
package object funcs {

  def col(name: String): Expr = ColRef(name)
  def lit(v: Any): Expr = Lit(v)
  /** Intentionally-private column: dunder-named, stripped from results by
    * post-processing (reference private_column.py:5-18 — the internal API
    * around the `.named` dunder guard). */
  def privateColumn(name: String, e: Expr): Expr = {
    require(Expr.isPrivateName(name),
      s"private column names must be `__name__` form, got '$name'")
    Named(e, name)
  }
  /** `column(sql=...)` raw-fragment escape hatch (reference column.py:24-31). */
  def sql(fragment: String): Expr = RawSql(fragment)

  // --- aggregates (_sql_functions.py:16-72) ---
  def count(): Expr = Call("count", Seq.empty)
  def count(e: Expr): Expr = Call("count", Seq(e))
  def countDistinct(e: Expr): Expr = Call("count", Seq(e), distinct = true)
  /** `distinct(x)` inside count (reference _sql_functions.py:33-38). */
  def distinct(e: Expr): Expr = Call("distinct", Seq(e))
  def max(e: Expr): Expr = Call("max", Seq(e))
  def min(e: Expr): Expr = Call("min", Seq(e))
  def sum(e: Expr): Expr = Call("sum", Seq(e))
  def avg(e: Expr): Expr = Call("avg", Seq(e))

  /** Exact interpolated percentile (beyond-reference analytic measure):
    * the value at fraction `p` of the sorted distribution, linearly
    * interpolated between the two closest ranks — identical semantics to
    * DuckDB's `quantile_cont`, so oracles replay directly. Exact (sort-
    * based), hence deterministic; round the result to 6 dp when gating
    * against an oracle to absorb interpolation ulps. For sketched
    * quantiles at extreme scale swap to approx_percentile — same call
    * shape, documented accuracy trade. */
  def percentile(e: Expr, p: Double): Expr = {
    require(p >= 0.0 && p <= 1.0, s"percentile fraction must be in [0,1], got $p")
    Call("percentile", Seq(e, Lit(p)))
  }
  /** Median = percentile 0.5. */
  def median(e: Expr): Expr = percentile(e, 0.5)

  /** Approximate percentile — [[percentile]]'s extreme-scale variant.
    * Same call shape plus an `accuracy` knob; lowers to Spark's
    * `approx_percentile` (a bounded-memory QuantileSummaries sketch —
    * O(accuracy·log n) state per group instead of the exact aggregate's
    * per-group value buffer, rank error ≤ n/accuracy). Returns an actual
    * element of the distribution (no interpolation), so results are
    * deterministic for a fixed input but NOT bit-comparable to
    * quantile_cont — gate on plan shape / tolerance, not hash. */
  def approxPercentile(e: Expr, p: Double, accuracy: Int = 10000): Expr = {
    require(p >= 0.0 && p <= 1.0,
      s"approx_percentile fraction must be in [0,1], got $p")
    require(accuracy > 0, s"approx_percentile accuracy must be positive, got $accuracy")
    Call("approx_percentile", Seq(e, Lit(p), Lit(accuracy)))
  }

  /** `approx_count_distinct(e[, rsd])` — the extreme-scale swap for
    * [[countDistinct]]: Spark's HyperLogLog++ sketch aggregate, fixed
    * O(1/rsd²) bytes of state per group instead of the exact distinct's
    * per-group value set and its extra shuffle. Same call shape, so the
    * swap is one word. Values are cardinality-approximate (relative
    * standard deviation `rsd`), so this is spec-gated on plan shape +
    * error bound, not oracle-hashed. */
  def approxCountDistinct(e: Expr, rsd: Double = 0.05): Expr = {
    require(rsd > 0 && rsd < 1, s"approx_count_distinct rsd must be in (0,1), got $rsd")
    Call("approx_count_distinct", Seq(e, Lit(rsd)))
  }

  /** `count_if(cond)` — rewritten at definition time to
    * sum(cases((cond,1), other=0)), exactly like the reference
    * (_sql_functions.py:25-30). */
  def countIf(cond: Expr): Expr =
    Call("sum", Seq(Cases(Seq(cond -> Lit(1L)), Some(Lit(0L)))))

  // --- scalars ---
  def floor(e: Expr): Expr = Call("floor", Seq(e))
  // general scalar helpers (beyond-reference convenience)
  def coalesce(es: Expr*): Expr = Call("coalesce", es)
  def abs(e: Expr): Expr = Call("abs", Seq(e))
  def round(e: Expr, digits: Int = 0): Expr = Call("round", Seq(e, Lit(digits)))
  def concat(es: Expr*): Expr = Call("concat", es)
  def substring(e: Expr, pos: Int, len: Int): Expr =
    Call("substring", Seq(e, Lit(pos), Lit(len)))
  def replace(e: Expr, search: Expr, repl: Expr): Expr =
    Call("replace", Seq(e, search, repl))
  def ceiling(e: Expr): Expr = Call("ceiling", Seq(e))
  // beyond-reference scalar string helpers (LLM text operators)
  def lower(e: Expr): Expr = Call("lower", Seq(e))
  def upper(e: Expr): Expr = Call("upper", Seq(e))
  def trim(e: Expr): Expr = Call("trim", Seq(e))
  def length(e: Expr): Expr = Call("length", Seq(e))
  def md5(e: Expr): Expr = Call("md5", Seq(e))

  /** Extract a JSON field as a string (NULL on missing path / invalid
    * JSON). `path` is a constant JSONPath like `$.k` or `$.a.b` — the
    * subset Spark's `get_json_object` and DuckDB's `json_extract_string`
    * both accept, so oracles replay it unchanged. Covers the reference's
    * STRUCT/RECORD/JSON → JSON type mapping (type_names.py:99-102): the
    * reference reads JSON columns back as strings and leaves extraction to
    * raw SQL; graft makes extraction first-class. */
  def jsonGet(e: Expr, path: String): Expr = {
    require(path.startsWith("$"), s"jsonGet path must start with '$$': $path")
    Call("json_get", Seq(e, Lit(path)))
  }
  /** `cast` — reachable only via wire format in the reference
    * (compilers/sql_function.py:63-70). */
  def cast(e: Expr, typeName: String): Expr = Call(s"cast:$typeName", Seq(e))

  // --- logical (_logical.py:8-27) ---
  def and(es: Expr*): Expr = es.reduce(_ && _)
  def or(es: Expr*): Expr = es.reduce(_ || _)
  def not(e: Expr): Expr = Not(e)

  /** CASE expression (reference _cases.py:11-37). */
  def cases(branches: (Expr, Expr)*): Expr = Cases(branches, None)
  def cases(branches: Seq[(Expr, Expr)], otherwise: Expr): Expr =
    Cases(branches, Some(otherwise))

  // --- temporal (_temporal.py:6-12) ---
  /** Seconds between timestamps (ts1 - ts2); Spark lowering is the
    * reference's own Databricks recipe `unix_timestamp(a)-unix_timestamp(b)`
    * (compilers/sql_function.py:90-91). */
  def diffSeconds(ts1: Expr, ts2: Expr): Expr = Call("diffSeconds", Seq(ts1, ts2))

  /** `now()` is materialized at definition time as a literal, matching the
    * reference (compilers/sql_function.py:48-55). Pass a fixed instant for
    * deterministic tests. */
  def now(at: Instant = Instant.now()): Expr = Lit(at)

  def interval(num: Long, unit: String): TimeInterval = TimeInterval(num, unit)

  /** EXISTS(model) (_sql_functions.py:99-104). */
  def exists(m: graft.model.Model): Expr = ExistsE(m)
  /** Model as scalar subquery (subquery_expression.py:10-37). */
  def scalar(m: graft.model.Model): Expr = ScalarSubquery(m)

  // --- temporal predicate helpers (column_expression.py:209-310):
  //     range checks [trunc(now), trunc(now)+1unit) built from
  //     now() + granularity + interval arithmetic ---
  private def inUnitRange(e: Expr, unit: String, offsetUnits: Long, at: Instant): Expr = {
    val start0 = Granularity(Lit(at), unit)
    val start =
      if (offsetUnits == 0) start0
      else AddInterval(start0, TimeInterval(-offsetUnits, unit), negate = false)
    val end = AddInterval(start, TimeInterval(1, unit), negate = false)
    (e >= start) && (e < end)
  }
  def isToday(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "day", 0, at)
  def isYesterday(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "day", 1, at)
  def isThisWeek(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "week", 0, at)
  def isLastWeek(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "week", 1, at)
  def isThisMonth(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "month", 0, at)
  def isLastMonth(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "month", 1, at)
  def isThisQuarter(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "quarter", 0, at)
  def isLastQuarter(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "quarter", 1, at)
  def isThisYear(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "year", 0, at)
  def isLastYear(e: Expr, at: Instant = Instant.now()): Expr = inUnitRange(e, "year", 1, at)

  /** Top-N breakout: value if in literal list else "Other"
    * (reference column_expression.py:352-378 `bucket_other`). */
  def bucketOther(e: Expr, keep: Seq[Any], other: Any = "Other"): Expr =
    Cases(Seq(InValues(e, keep) -> e), Some(Lit(other)))
  /** bucket_other against a model subquery (top-N breakout via IN (SELECT …)). */
  def bucketOther(e: Expr, sub: graft.model.Model, subCol: Expr, other: Any): Expr =
    Cases(Seq(InModel(e, sub, subCol) -> e), Some(Lit(other)))
}
