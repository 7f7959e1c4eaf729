package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cypher scalar/aggregate function surface → Spark Column expressions.
  *
  * Reference analog: the function dispatch in
  * /root/reference/src/executor.ts (string/numeric/list/temporal function
  * evaluation, e.g. duration handling at executor.ts:4049, collect at
  * executor.ts:611). Every mapping here is a thin wrapper over Spark's
  * codegen'd `org.apache.spark.sql.functions` (never a UDF) so the whole
  * expression tree stays inside WholeStageCodegen.
  *
  * Type-dependent Cypher functions (`size` on string vs list, temporal
  * component access) take the argument's resolved [[DataType]] when the
  * caller can provide it.
  */
object CypherFunctions {

  val aggregateNames: Set[String] = Set("count", "sum", "avg", "min", "max",
    "collect", "stdev", "stdevp", "percentilecont", "percentiledisc")

  def isAggregate(name: String): Boolean = aggregateNames(name.toLowerCase)

  /** Internal columns of graph structs, excluded from `properties()`/`keys()`. */
  private val internalFields = Set("_id", "_src", "_dst", "_eid", "_label", "_hops", "_eids")

  /** Resolve an aggregate call. `star` marks count(*). */
  def aggregate(name: String, args: Seq[Column], distinct: Boolean, star: Boolean): Column =
    name.toLowerCase match {
      case "count" if star => count(lit(1))
      case "count" if distinct => count_distinct(args.head, args.tail: _*)
      case "count" => count(args.head)
      case "sum" => sum(args.head)
      case "avg" => avg(args.head)
      case "min" => min(args.head)
      case "max" => max(args.head)
      case "collect" if distinct => collect_set(args.head)
      case "collect" => collect_list(args.head)
      case "stdev" => stddev_samp(args.head)
      case "stdevp" => stddev_pop(args.head)
      // exact percentile (Spark's `percentile` is exact; matches DuckDB
      // quantile_cont); disc = EXACT nearest-rank (ceil(p*n)-th smallest
      // actual element, Neo4j semantics) via sort over the collected
      // group — groups must fit in executor memory, same contract as
      // collect()/percentile itself
      case "percentilecont" => percentile(args.head, args(1))
      case "percentiledisc" =>
        val sorted = sort_array(collect_list(args.head))
        element_at(sorted,
          greatest(ceil(size(sorted) * args(1)), lit(1)).cast(IntegerType))
      case other => throw new IllegalArgumentException(s"Unknown aggregate: $other")
    }

  /** Resolve a scalar call. `argType(i)` is the resolved Spark type of
    * argument i when statically known (None inside lambdas).
    */
  def scalar(name: String, args: Seq[Column], argType: Int => Option[DataType],
      argLit: Int => Option[Any] = _ => None): Column = {
    def a0 = args.head
    name.toLowerCase match {
      // ---- string ----
      case "toupper" | "upper" => upper(a0)
      case "tolower" | "lower" => lower(a0)
      case "trim" => trim(a0)
      case "ltrim" => ltrim(a0)
      case "rtrim" => rtrim(a0)
      case "replace" => call_function("replace", args: _*)
      case "split" =>
        // Cypher split = literal delimiter; Spark split = regex. Quote
        // literal delimiters so "." or "|" split as characters.
        argLit(1) match {
          case Some(d: String) => split(a0, java.util.regex.Pattern.quote(d))
          case _ => split(a0, args(1).cast(StringType).toString)
        }
      case "substring" =>
        // Cypher 0-based start; Spark 1-based
        if (args.size >= 3) substr(a0, args(1) + lit(1), args(2))
        else substr(a0, args(1) + lit(1), length(a0))
      case "left" => substr(a0, lit(1), args(1))
      case "right" => a0.substr(length(a0) - args(1) + lit(1), args(1))
      case "reverse" =>
        argType(0) match {
          case Some(_: ArrayType) => org.apache.spark.sql.functions.reverse(a0)
          case _ => org.apache.spark.sql.functions.reverse(a0)
        }
      case "tostring" => a0.cast(StringType)
      case "tointeger" | "toint" => a0.cast(DoubleType).cast(LongType)
      case "tofloat" => a0.cast(DoubleType)
      case "toboolean" => a0.cast(BooleanType)
      // ---- size / length: list → cardinality, string → char count.
      // size(x) is wrapped null-safe: Spark's non-ANSI legacy size(NULL)
      // is -1, Cypher requires null ----
      case "size" | "length" =>
        def nullSafeSize(c: Column) = when(c.isNull, lit(null)).otherwise(size(c))
        argType(0) match {
          case Some(_: ArrayType) | Some(_: MapType) => nullSafeSize(a0)
          case Some(StringType) => length(a0).cast(LongType)
          case Some(st: StructType) if st.fieldNames.contains("_hops") =>
            a0.getField("_hops") // length(varlength rel) = hop count
          case _ => nullSafeSize(a0)
        }
      // ---- numeric ----
      case "abs" => abs(a0)
      case "ceil" | "ceiling" => ceil(a0).cast(DoubleType)
      case "floor" => floor(a0).cast(DoubleType)
      case "round" =>
        if (args.size >= 2) round(a0, argLit(1).map(_.toString.toInt).getOrElse(0))
        else round(a0)
      case "sqrt" => sqrt(a0)
      case "sign" => signum(a0).cast(LongType)
      case "exp" => exp(a0)
      case "log" => log(a0)
      case "log10" => log10(a0)
      case "sin" => sin(a0); case "cos" => cos(a0); case "tan" => tan(a0)
      case "asin" => asin(a0); case "acos" => acos(a0)
      case "atan" => atan(a0)
      case "atan2" => atan2(a0, args(1))
      case "pi" => lit(math.Pi)
      case "e" => lit(math.E)
      case "rand" => rand()
      case "randomuuid" => expr("uuid()")
      // ---- list ----
      case "head" => element_at(a0, 1)
      case "last" => element_at(a0, -1)
      case "tail" => slice(a0, lit(2), greatest(size(a0) - lit(1), lit(0)))
      case "range" =>
        if (args.size >= 3) sequence(a0, args(1), args(2))
        else sequence(a0, args(1))
      // ---- graph ----
      case "id" => a0.getField("_id")
      case "labels" => array(a0.getField("_label"))
      case "type" => a0.getField("_label")
      case "startnode" => a0.getField("_src")
      case "endnode" => a0.getField("_dst")
      case "properties" =>
        argType(0) match {
          case Some(st: StructType) =>
            val props = st.fields.filterNot(f => internalFields(f.name))
            struct(props.toIndexedSeq.map(f => a0.getField(f.name).as(f.name)): _*)
          case _ => a0
        }
      case "keys" =>
        argType(0) match {
          case Some(st: StructType) =>
            val props = st.fields.filterNot(f => internalFields(f.name)).map(_.name)
            array(props.toIndexedSeq.map(lit): _*)
          case Some(_: MapType) => map_keys(a0)
          case _ => map_keys(a0)
        }
      case "exists" => a0.isNotNull
      case "coalesce" => coalesce(args: _*)
      case "nullif" => nullif(a0, args(1))
      // ---- temporal ----
      case "date" => if (args.isEmpty) current_date() else to_date(a0)
      case "datetime" | "localdatetime" =>
        if (args.isEmpty) current_timestamp() else to_timestamp(a0)
      // TIME values have no Spark type — represented as HH:mm:ss strings
      // (divergence documented; the reference stores strings too)
      case "time" | "localtime" =>
        if (args.isEmpty) date_format(current_timestamp(), "HH:mm:ss")
        else date_format(to_timestamp(a0), "HH:mm:ss")
      case "timestamp" => (unix_timestamp() * 1000).cast(LongType)
      case "epochmillis" => (a0.cast(DoubleType) * 1000).cast(LongType)
      case "duration_between_days" => datediff(args(1), a0).cast(LongType)
      case other =>
        // fall through to any Spark SQL builtin with matching name/arity —
        // keeps the surface wide without re-listing every math function
        call_function(other, args: _*)
    }
  }

  /** Temporal component access (`d.year`) for date/timestamp values. */
  def temporalComponent(c: Column, key: String): Option[Column] = key.toLowerCase match {
    case "year" => Some(year(c).cast(LongType))
    case "month" => Some(month(c).cast(LongType))
    case "day" => Some(dayofmonth(c).cast(LongType))
    case "hour" => Some(hour(c).cast(LongType))
    case "minute" => Some(minute(c).cast(LongType))
    case "second" => Some(second(c).cast(LongType))
    case "dayofweek" => Some(dayofweek(c).cast(LongType))
    case "dayofyear" | "ordinalday" => Some(dayofyear(c).cast(LongType))
    case "week" => Some(weekofyear(c).cast(LongType))
    // ISO week-based year = calendar year of this week's Thursday
    // (weekday() is 0=Mon..6=Sun, so Thursday = d + (3 - weekday))
    case "weekyear" =>
      Some(year(date_add(c.cast(DateType), lit(3) - weekday(c.cast(DateType)))).cast(LongType))
    case "quarter" => Some(quarter(c).cast(LongType))
    case "decade" => Some((year(c) / 10).cast(LongType))
    case "century" => Some((year(c) / 100).cast(LongType))
    case "millennium" => Some((year(c) / 1000).cast(LongType))
    case "millisecond" =>
      Some((pmod(unix_micros(c.cast(TimestampType)), lit(1000000L)) / 1000).cast(LongType))
    case "microsecond" =>
      Some(pmod(unix_micros(c.cast(TimestampType)), lit(1000000L)).cast(LongType))
    case "epochseconds" => Some(unix_seconds(c.cast(TimestampType)))
    case "epochmillis" => Some(unix_millis(c.cast(TimestampType)))
    case _ => None
  }
}
