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
    if len(args) == 2:
        return F.sequence(args[0], args[1])
    return F.sequence(args[0], args[1], args[2])


def _to_integer(c: Column) -> Column:
    return c.try_cast("long")


def _to_float(c: Column) -> Column:
    return c.try_cast("double")


def _to_boolean(c: Column) -> Column:
    return c.try_cast("boolean")


def _to_string(c: Column) -> Column:
    return c.cast("string")


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
    "datetime": F.to_timestamp,
    "localdatetime": F.to_timestamp,
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

# aggregate name -> fn(Column, distinct: bool) -> Column
def _agg(fn):
    return lambda c, distinct=False: fn(c)


from memgraph_spark.functions.spatial import point_distance, point_withinbbox  # noqa: E402

FUNCTIONS["point.distance"] = point_distance
FUNCTIONS["point.withinbbox"] = point_withinbbox


AGGREGATES: dict[str, object] = {
    "count": lambda c, distinct=False: (F.count_distinct(c) if distinct else F.count(c)),
    "sum": lambda c, distinct=False: (F.sum_distinct(c) if distinct else F.sum(c)),
    "min": _agg(F.min),
    "max": _agg(F.max),
    "avg": lambda c, distinct=False: F.avg(c),
    "collect": lambda c, distinct=False: (
        F.collect_set(c) if distinct else F.collect_list(c)),
    "stdev": _agg(F.stddev_samp),
    "stdevp": _agg(F.stddev_pop),
}
