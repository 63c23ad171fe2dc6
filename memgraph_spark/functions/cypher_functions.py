"""The Cypher scalar/aggregate function library ("awesome functions").

Reference registry: NameToFunction, src/query/interpret/
awesome_memgraph_functions.cpp:2218 (SURVEY §2.9). Each entry maps the Cypher
name to a pyspark Column builder — built-in JVM functions wherever one exists;
no Python UDFs in this registry.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _head(c: Column) -> Column:
    return F.try_element_at(c, F.lit(1))


def _last(c: Column) -> Column:
    return F.try_element_at(F.reverse(c), F.lit(1))


def _range(*args: Column) -> Column:
    # RANGE(a, b[, step]) with step defaulting to +1: an empty range when
    # the bounds run against the step (Spark's 2-arg sequence would infer a
    # negative step instead; range test: RANGE(1, -1) = [])
    if len(args) == 2:
        lo, hi = args
        return F.when(lo <= hi, F.sequence(lo, hi, F.lit(1))) \
                .otherwise(F.array().cast("array<bigint>"))
    lo, hi, step = args
    return (F.when(step == 0, F.raise_error(F.lit(
                "range() step must not be zero"))
                .cast("array<bigint>"))
            .when((step > 0) & (lo <= hi), F.sequence(lo, hi, step))
            .when((step < 0) & (lo >= hi), F.sequence(lo, hi, step))
            .otherwise(F.array().cast("array<bigint>")))


def _to_integer(c: Column) -> Column:
    # '2.9' parses via double then truncates toward zero (TCK: toInteger
    # on a list of strings)
    return F.coalesce(c.try_cast("long"),
                      c.try_cast("double").cast("long"))


def _to_float(c: Column) -> Column:
    return c.try_cast("double")


def _to_boolean(c: Column) -> Column:
    return c.try_cast("boolean")


def _to_string(c: Column) -> Column:
    return c.cast("string")


_STRFTIME = [("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
             ("%H", "HH"), ("%I", "hh"), ("%M", "mm"), ("%S", "ss"),
             ("%f", "SSSSSS"), ("%p", "a"), ("%z", "xx"), ("%Z", "zz"),
             ("%j", "DDD"), ("%a", "EEE"), ("%A", "EEEE"), ("%b", "MMM"),
             ("%B", "MMMM"), ("%%", "%")]


def _strftime_to_java(fmt: Column) -> Column:
    """python strftime directives -> Java SimpleDateFormat (the reference's
    temporal.format takes strftime patterns, Spark's date_format takes Java)."""
    out = fmt
    for py, java in _STRFTIME:
        out = F.replace(out, F.lit(py), F.lit(java))
    return out


# name (lowercased) -> fn(*Column) -> Column
FUNCTIONS: dict[str, object] = {
    # lists ("size"/"length" are type-dependent -> resolved in the expression
    # compiler, which can probe the frame's schema)
    "head": _head,
    "last": _last,
    "tail": lambda c: F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0))),
    "reverse": F.reverse,
    "range": _range,
    "toset": F.array_distinct,
    # math
    "abs": F.abs,
    "ceil": lambda c: F.ceil(c).cast("double"),
    "floor": lambda c: F.floor(c).cast("double"),
    "round": lambda c: F.round(c, 0),
    "exp": F.exp,
    # temporal constructors (awesome_memgraph_functions.cpp DATE/DATETIME/...)
    "date": F.to_date,
    # ZonedDateTime text may carry a trailing [Zone/Id] (temporal.hpp);
    # normalize before parsing — offsets (+02:00) parse natively
    "datetime": lambda c: F.to_timestamp(
        F.regexp_replace(c.cast("string"), r"\[[^\]]*\]$", "")),
    "localdatetime": F.to_timestamp,
    # LocalTime as a normalized HH:MM:SS.nnnnnnnnn string — lexical order ==
    # chronological, so min/max/comparisons work without a Spark TIME type
    # (TIME exists in 4.1 but this build rejects it: UNSUPPORTED_TIME_TYPE)
    "localtime": lambda c: F.concat(
        F.date_format(F.to_timestamp(F.concat(F.lit("1970-01-01 "), c)),
                      "HH:mm:ss.SSSSSS"), F.lit("000")),
    "log": F.log,
    "log10": F.log10,
    "sqrt": F.sqrt,
    "sign": lambda c: F.signum(c).cast("long"),
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "atan2": F.atan2,
    "pi": lambda: F.lit(math.pi),
    "e": lambda: F.lit(math.e),
    "rand": F.rand,
    # strings
    "tolower": F.lower, "lower": F.lower,
    "toupper": F.upper, "upper": F.upper,
    "trim": F.trim, "ltrim": F.ltrim, "rtrim": F.rtrim,
    "replace": lambda s, a, b: F.replace(s, a, b),
    "split": F.split,
    "substring": lambda s, start, *ln: (
        F.substring(s, start + 1, ln[0]) if ln else F.substring(s, start + 1, 0x7FFFFFFF)
    ),
    "left": lambda s, n: F.substring(s, 1, n),
    "right": lambda s, n: s.substr(F.greatest(F.length(s) - n + 1, F.lit(1)), n),
    # conversions
    "tointeger": _to_integer,
    "tofloat": _to_float,
    "toboolean": _to_boolean,
    "tostring": _to_string,
    "tointegerornull": _to_integer,
    "tofloatornull": _to_float,
    "tobooleanornull": _to_boolean,
    # list conversions: per-element, unconvertible -> null
    "tointegerlist": lambda c: F.transform(c, _to_integer),
    "tofloatlist": lambda c: F.transform(c, _to_float),
    "tobooleanlist": lambda c: F.transform(c, _to_boolean),
    "tostringlist": lambda c: F.transform(c, _to_string),
    # spatial (memgraph_spark.functions.spatial; point() itself is compiled
    # in the expression layer because its argument is a map literal)
    "point.distance": None,  # bound below
    "point.withinbbox": None,
    # byte strings (awesome_memgraph_functions.cpp:1514-1567): hex text with
    # a 0x prefix <-> binary; odd-length hex gets an implied leading zero
    "tobytestring": lambda c: F.unhex(
        F.when(F.length(F.regexp_replace(c, r"^0[xX]", "")) % 2 == 1,
               F.concat(F.lit("0"), F.regexp_replace(c, r"^0[xX]", "")))
        .otherwise(F.regexp_replace(c, r"^0[xX]", ""))),
    "frombytestring": lambda c, *min_len: F.concat(
        F.lit("0x"),
        F.repeat(F.lit("0"),
                 F.greatest((min_len[0] if min_len else F.lit(0)) * 2
                            - F.length(F.hex(c)), F.lit(0)).cast("int")),
        F.lower(F.hex(c))),
    # uniformSample(list, n): n draws with replacement
    # (awesome_memgraph_functions.cpp:1085)
    "uniformsample": lambda lst, n: F.when(
        lst.isNotNull() & n.isNotNull() & (F.size(lst) > 0),
        F.transform(F.sequence(F.lit(1), n),
                    # coalesce keeps the analyzer happy on typed-NULL input
                    # (the when() guard means it never evaluates then)
                    lambda _: F.element_at(
                        F.coalesce(lst, F.array()),
                        (F.floor(F.rand() * F.size(lst)) + 1).cast("int")))),
    # -- MAGE "magic function" modules (scalar functions callable in
    # -- expressions; reference src/mage/cpp/<module>_module/algorithm/*.hpp)
    # collections_module
    "collections.sum": lambda l: F.aggregate(
        l, F.lit(0.0), lambda acc, x: acc + x.cast("double")),
    "collections.sum_longs": lambda l: F.aggregate(
        l, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")),
    "collections.avg": lambda l: F.aggregate(
        l, F.lit(0.0), lambda acc, x: acc + x.cast("double")) / F.size(l),
    "collections.max": F.array_max,
    "collections.min": F.array_min,
    "collections.sort": F.sort_array,
    "collections.to_set": F.array_distinct,
    "collections.flatten": F.flatten,
    "collections.contains": F.array_contains,
    "collections.contains_sorted": F.array_contains,
    "collections.contains_all": lambda l, items:
        F.size(F.array_except(items, l)) == 0,
    "collections.intersection": F.array_intersect,
    "collections.union": F.array_union,
    "collections.union_all": F.concat,
    "collections.subtract": F.array_except,
    "collections.disjunction": lambda a, b: F.array_union(
        F.array_except(a, b), F.array_except(b, a)),
    "collections.remove_all": lambda l, rem: F.filter(
        l, lambda x: ~F.array_contains(rem, x)),
    "collections.duplicates": lambda l: F.filter(
        F.array_distinct(l),
        lambda x: F.size(F.filter(l, lambda y: y == x)) > 1),
    "collections.pairs": lambda l: F.zip_with(
        F.slice(l, 1, F.greatest(F.size(l) - 1, F.lit(0))),
        F.slice(l, 2, F.greatest(F.size(l) - 1, F.lit(0))),
        lambda a, b: F.array(a, b)),
    "collections.partition": lambda l, n: F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(l) / n).cast("int") - 1),
        lambda i: F.slice(l, (i * n + 1).cast("int"), n.cast("int"))),
    # map_module
    "map.from_pairs": lambda ps: F.map_from_entries(
        F.transform(ps, lambda p: F.struct(
            F.element_at(p, 1).alias("key"),
            F.element_at(p, 2).alias("value")))),
    "map.from_lists": F.map_from_arrays,
    "map.from_values": lambda l: F.map_from_arrays(
        F.filter(l, lambda _, i: i % 2 == 0),
        F.filter(l, lambda _, i: i % 2 == 1)),
    "map.merge": lambda m1, m2: F.aggregate(
        F.map_entries(m2), m1,
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _: k != e["key"]),
            F.create_map(e["key"], e["value"]))),
    "map.set_key": lambda m, k, v: F.map_concat(
        F.map_filter(m, lambda mk, _: mk != k), F.create_map(k, v)),
    "map.remove_key": lambda m, k: F.map_filter(m, lambda mk, _: mk != k),
    "map.remove_keys": lambda m, ks: F.map_filter(
        m, lambda mk, _: ~F.array_contains(ks, mk)),
    "map.merge_list": lambda ms: F.aggregate(
        F.slice(ms, 2, F.greatest(F.size(ms) - 1, F.lit(0))),
        F.element_at(ms, 1),
        lambda acc, m: F.aggregate(
            F.map_entries(m), acc,
            lambda acc2, e: F.map_concat(
                F.map_filter(acc2, lambda k, _: k != e["key"]),
                F.create_map(e["key"], e["value"])))),
    # text_module
    # call_function: the py wrappers of array_join/instr demand python-str
    # args; the SQL functions take expressions
    "text.join": lambda l, d: F.call_function("array_join", l, d),
    "text.replace": lambda s, a, b: F.replace(s, a, b),
    "text.regreplace": F.regexp_replace,
    "text.distance": F.levenshtein,
    "text.indexof": lambda s, sub:
        (F.call_function("instr", s, sub) - 1).cast("long"),
    "text.regexgroups": lambda s, p: F.regexp_extract_all(s, p, 0),
    "text.compare_cleaned": lambda a, b:
        F.regexp_replace(F.lower(a), r"[^a-z0-9]", "")
        == F.regexp_replace(F.lower(b), r"[^a-z0-9]", ""),
    # each param fills the leftmost remaining {} placeholder
    "text.format": lambda s, ps: F.aggregate(
        ps, s, lambda acc, p: F.when(
            F.instr(acc, "{}") > 0,
            F.concat(F.substring(acc, 1, F.instr(acc, "{}") - 1),
                     p.cast("string"),
                     F.substring(acc, F.instr(acc, "{}") + 2, 0x7FFFFFFF)))
        .otherwise(acc)),
    # collections.split(list, delim): sublists between delimiter elements
    # (collections_module Split); slice(l,1,0) types the empty accumulators
    "collections.split": lambda l, d: F.aggregate(
        l,
        F.struct(F.slice(F.array(F.slice(l, 1, 0)), 1, 0).alias("parts"),
                 F.slice(l, 1, 0).alias("cur")),
        lambda acc, x: F.when(
            x == d,
            F.struct(F.array_append(acc["parts"], acc["cur"]).alias("parts"),
                     F.slice(l, 1, 0).alias("cur")))
        .otherwise(F.struct(acc["parts"].alias("parts"),
                            F.array_append(acc["cur"], x).alias("cur"))),
        lambda acc: F.array_append(acc["parts"], acc["cur"])),
    # map.flatten(m, delim): one-level nested-map flattening is a typed
    # operation in Spark; for the common map<string,map<string,T>> shape
    "map.flatten": lambda m, *d: F.map_from_entries(F.flatten(F.transform(
        F.map_entries(m),
        lambda e: F.transform(
            F.map_entries(e["value"]),
            lambda i: F.struct(
                F.concat(e["key"], (d[0] if d else F.lit(".")), i["key"])
                .alias("key"),
                i["value"].alias("value")))))),
    # math_module (src/mage/cpp/math_module): round with explicit mode
    "math.round": lambda v, *a: _math_round(v, *a),
    # date_module magic function date.add (query_modules/date.py:122)
    "date.add": lambda t, u, av, au: (
        (t * _unit_us(u) + av * _unit_us(au)) / _unit_us(u)).cast("long"),
    # vector_search.cosine_similarity magic function
    # (query_modules/vector_search_module.cpp) — zip_with dot product over
    # array columns, JVM-side
    "vector_search.cosine_similarity": lambda a, b: _cosine_sim(a, b),
    # convert module (query_modules/convert.cpp): JSON <-> values via the
    # Spark 4 VariantType (schema-less parse, exactly the reference's shape)
    "convert.str2object": F.parse_json,
    "convert.from_json_map": lambda c: F.parse_json(c),
    "convert.from_json_list": lambda c: F.parse_json(c),
    "convert.to_json": F.to_json,
    # temporal.format(value, strftime_format) (src/mage/python/temporal.py:8)
    "temporal.format": lambda ts, fmt: F.call_function(
        "date_format", ts,
        _strftime_to_java(fmt)),
    # util_module / uuid_module
    "util_module.md5": lambda c: F.md5(c.cast("string")),
    "util.md5": lambda c: F.md5(c.cast("string")),
    "uuid.get": F.uuid,
    # misc
    "coalesce": F.coalesce,
    "randomuuid": F.uuid,
    "timestamp": lambda: (F.unix_micros(F.current_timestamp())),
    "exists": lambda c: c.isNotNull(),
    # quantifiers (compiled list of booleans -> reduce)
    "__quant_all": lambda c: F.forall(c, lambda x: x),
    "__quant_any": lambda c: F.exists(c, lambda x: x),
    "__quant_none": lambda c: ~F.exists(c, lambda x: x),
    "__quant_single": lambda c: F.size(F.filter(c, lambda x: x)) == 1,
}

def _cosine_sim(a: Column, b: Column) -> Column:
    """vector_search.cosine_similarity (vector_search_module.cpp): dot
    product over zip_with; dimension mismatch raises at runtime."""
    def norm2(v: Column) -> Column:
        return F.aggregate(v, F.lit(0.0),
                           lambda acc, x: acc + x.cast("double")
                           * x.cast("double"))
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    ok = F.assert_true(F.size(a) == F.size(b),
                       "Vectors must have the same dimension")
    return F.when(ok.isNull(), dot / (F.sqrt(norm2(a)) * F.sqrt(norm2(b))))


def _unit_us(u: Column) -> Column:
    """Time unit name -> microseconds (query_modules/date.py to_timedelta)."""
    lu = F.lower(u)
    return (F.when(lu.isin("ms", "milliseconds"), F.lit(1000))
            .when(lu.isin("s", "sec", "seconds"), F.lit(1_000_000))
            .when(lu.isin("m", "min", "minutes"), F.lit(60_000_000))
            .when(lu.isin("h", "hours"), F.lit(3_600_000_000))
            .when(lu.isin("d", "days"), F.lit(86_400_000_000))
            .otherwise(F.lit(1)))  # us


def _math_round(v: Column, *a: Column) -> Column:
    """math.round(value, precision=0, mode='HALF_UP')
    (src/mage/cpp/math_module/algorithm/math.hpp): java.math.RoundingMode
    names over a dynamic precision."""
    precision = a[0] if len(a) >= 1 else F.lit(0)
    mode = F.upper(a[1]) if len(a) >= 2 else F.lit("HALF_UP")
    f = F.pow(F.lit(10.0), precision)
    x = v * f
    sign = F.when(v < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ax = F.abs(x)
    rounded = (
        F.when(mode == "HALF_DOWN", sign * F.ceil(ax - 0.5))
        .when(mode == "HALF_EVEN",
              # banker's: round half to even via floor + parity check
              F.when((ax % 1 == 0.5) & (F.floor(ax) % 2 == 0),
                     sign * F.floor(ax))
              .otherwise(sign * F.floor(ax + 0.5)))
        .when(mode == "UP", sign * F.ceil(ax))
        .when(mode == "DOWN", sign * F.floor(ax))
        .when(mode == "CEILING", F.ceil(x))
        .when(mode == "FLOOR", F.floor(x))
        .otherwise(sign * F.floor(ax + 0.5))  # HALF_UP default
    )
    return (rounded / f).cast("double")


# aggregate name -> fn(Column, distinct: bool) -> Column
def _agg(fn):
    return lambda c, distinct=False: fn(c)


from memgraph_spark.functions.spatial import point_distance, point_withinbbox  # noqa: E402

FUNCTIONS["point.distance"] = point_distance
FUNCTIONS["point.withinbbox"] = point_withinbbox


AGGREGATES: dict[str, object] = {
    "count": lambda c, distinct=False: (F.count_distinct(c) if distinct else F.count(c)),
    # Cypher SUM over no values is 0, not null (CompactAggregationValue
    # initializes the sum slot to int 0)
    "sum": lambda c, distinct=False: F.coalesce(
        F.sum_distinct(c) if distinct else F.sum(c), F.lit(0)),
    "min": _agg(F.min),
    "max": _agg(F.max),
    "avg": lambda c, distinct=False: (
        F.sum_distinct(c) / F.count_distinct(c) if distinct else F.avg(c)),
    "collect": lambda c, distinct=False: (
        F.collect_set(c) if distinct else F.collect_list(c)),
    "stdev": _agg(F.stddev_samp),
    "stdevp": _agg(F.stddev_pop),
    # percentileDisc: an actual element of the set (SQL percentile_disc);
    # percentileCont: linear interpolation (awesome_memgraph_functions
    # aggregates) — compiled specially in exprs.py because the percentile
    # argument arrives as a second expression
    "percentiledisc": None,
    "percentilecont": None,
    # graph-value aggregations — compiled specially in plans/exprs.py
    # (PROJECT_PATH / DERIVE, aggregation.hpp:27); registered here so
    # contains_aggregate() routes the projection through groupBy
    "project": None,
    "derive": None,
}
