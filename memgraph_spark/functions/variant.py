"""Variant property representation (SURVEY §1.3): when one property holds
values of conflicting types across rows (the reference is schemaless —
PropertyStore stores any type per object), the column falls back to a tagged
struct `STRUCT<vb boolean, vi bigint, vd double, vs string>` with exactly one
slot set. Comparisons keep Cypher semantics: same-category compares, numbers
compare across int/float, cross-category yields null.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

VARIANT_FIELDS = ("vb", "vi", "vd", "vs", "va", "vj")
VARIANT_T = ("struct<vb:boolean,vi:bigint,vd:double,vs:string,"
             "va:array<string>,vj:string>")


def is_variant_type(t) -> bool:
    if not isinstance(t, T.StructType):
        return False
    names = tuple(t.names)
    # current 6-slot shape plus the older 4/5-slot shapes (stored data)
    return names in (VARIANT_FIELDS, VARIANT_FIELDS[:5], VARIANT_FIELDS[:4])


def _slots(b=None, i=None, d=None, s=None, a=None, j=None) -> Column:
    return F.struct(
        (b if b is not None else F.lit(None).cast("boolean")).alias("vb"),
        (i if i is not None else F.lit(None).cast("long")).alias("vi"),
        (d if d is not None else F.lit(None).cast("double")).alias("vd"),
        (s if s is not None else F.lit(None).cast("string")).alias("vs"),
        (a if a is not None
         else F.lit(None).cast("array<string>")).alias("va"),
        # nested/mixed lists and maps: canonical JSON (one level of struct
        # typing cannot recurse; JSON keeps equality + display exact)
        (j if j is not None else F.lit(None).cast("string")).alias("vj"),
    )


def to_variant(col: Column, t) -> Column:
    """Lift a typed column into the variant struct (null value -> null
    struct, so IS NULL / exists() keep working)."""
    if is_variant_type(t):
        return col
    if isinstance(t, T.BooleanType):
        v = _slots(b=col)
    elif isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        v = _slots(i=col.cast("long"))
    elif isinstance(t, (T.DoubleType, T.FloatType, T.DecimalType)):
        v = _slots(d=col.cast("double"))
    elif isinstance(t, T.StringType):
        v = _slots(s=col)
    elif isinstance(t, T.ArrayType) and isinstance(t.elementType,
                                                   T.StringType):
        v = _slots(a=col)
    elif isinstance(t, T.DayTimeIntervalType):
        # durations in conflict with scalars: tag the interval's string
        # rendering into the json slot (to_json rejects interval input)
        v = _slots(j=F.concat(F.lit('{"__mg_dur":"'),
                              col.cast("string"), F.lit('"}')))
    else:
        # lists/maps/temporals in conflict with scalars: JSON-encode into the
        # dedicated json slot (observable, groupable; ordering diverges).
        # Cypher maps keep explicit null entries ({age: null} after a nested
        # SET to null), so null fields must survive the encoding.
        v = _slots(j=F.to_json(col, {"ignoreNullFields": "false"}))
    return F.when(col.isNotNull(), v)


def variant_num(v: Column) -> Column:
    """Numeric view of a variant (int slot widened to double)."""
    return F.coalesce(v.getField("vi").cast("double"), v.getField("vd"))


def variant_cmp(l: Column, lt, r: Column, rt, op: str) -> Column:
    """Cypher comparison where at least one side is a variant struct.
    Same category -> compare; int/double compare numerically; different
    categories -> null (TypedValue operator< semantics, typed_value.cpp)."""
    def apply(a: Column, b: Column) -> Column:
        return {"=": a == b, "<>": a != b, "<": a < b, ">": a > b,
                "<=": a <= b, ">=": a >= b}[op]

    if not is_variant_type(lt):
        l, r = r, l
        lt, rt = rt, lt
        op = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)
    # l is now variant
    if not is_variant_type(rt):
        if isinstance(rt, T.BooleanType):
            return apply(l.getField("vb"), r)
        if isinstance(rt, (T.LongType, T.IntegerType, T.ShortType,
                           T.ByteType, T.DoubleType, T.FloatType,
                           T.DecimalType)):
            return apply(variant_num(l), r.cast("double"))
        if isinstance(rt, T.StringType):
            return apply(l.getField("vs"), r)
        return F.lit(None).cast("boolean")
    # variant vs variant: compare within the matching category
    return (
        F.when(l.getField("vs").isNotNull() & r.getField("vs").isNotNull(),
               apply(l.getField("vs"), r.getField("vs")))
        .when(variant_num(l).isNotNull() & variant_num(r).isNotNull(),
              apply(variant_num(l), variant_num(r)))
        .when(l.getField("vb").isNotNull() & r.getField("vb").isNotNull(),
              apply(l.getField("vb"), r.getField("vb")))
    )


def variant_nonnum(v: Column) -> Column:
    """True when a non-null variant holds a non-numeric value."""
    return (v.getField("vb").isNotNull() | v.getField("vs").isNotNull()
            | v.getField("va").isNotNull() | v.getField("vj").isNotNull())


def variant_render(v: Column) -> Column:
    """Display string of a variant's scalar slots (string + concat)."""
    return F.coalesce(
        v.getField("vs"), v.getField("vi").cast("string"),
        v.getField("vd").cast("string"),
        F.when(v.getField("vb"), F.lit("true"))
        .when(~v.getField("vb"), F.lit("false")),
        v.getField("vj"))


def variant_arith(l: Column, lt, r: Column, rt, op: str) -> Column:
    """Arithmetic where at least one side is a numeric-capable variant
    (mixed-type property, SURVEY §1.3). Mirrors TypedValue's arithmetic
    operators (typed_value.cpp): int op int stays int, any double makes
    the result double, `+` with a string operand concatenates, any other
    non-numeric operand is a runtime type error. The result is again a
    variant struct so per-row int/float typing survives."""
    lv = l if is_variant_type(lt) else to_variant(l, lt)
    rv = r if is_variant_type(rt) else to_variant(r, rt)
    li, ri = lv.getField("vi"), rv.getField("vi")
    ln, rn = variant_num(lv), variant_num(rv)
    both_int = li.isNotNull() & ri.isNotNull()
    if op == "+":
        int_val = li + ri
        num_val = ln + rn
    elif op == "-":
        int_val = li - ri
        num_val = ln - rn
    elif op == "*":
        int_val = li * ri
        num_val = ln * rn
    elif op == "/":
        int_val = (li / ri).cast("long")
        num_val = ln / rn
    elif op == "%":
        int_val = li % ri
        num_val = ln % rn
    elif op == "^":
        int_val = None
        num_val = F.pow(ln, rn)
    else:  # pragma: no cover
        raise ValueError(op)
    bad = variant_nonnum(lv) | variant_nonnum(rv)
    if op == "+":
        # string + anything concatenates (typed_value.cpp operator+)
        str_side = (lv.getField("vs").isNotNull()
                    | rv.getField("vs").isNotNull())
        good = (F.when(str_side,
                       _slots(s=F.concat(variant_render(lv),
                                         variant_render(rv))))
                .when(both_int, _slots(i=int_val))
                .otherwise(_slots(d=num_val)))
        bad = bad & ~str_side
    elif int_val is None:
        good = _slots(d=num_val)
    else:
        good = F.when(both_int, _slots(i=int_val)) \
            .otherwise(_slots(d=num_val))
    return (F.when(lv.isNull() | rv.isNull(), F.lit(None).cast(
                "struct<vb:boolean,vi:bigint,vd:double,vs:string,"
                "va:array<string>,vj:string>"))
            .when(bad, F.raise_error(F.lit(
                f"invalid operand types for '{op}'")).cast(
                "struct<vb:boolean,vi:bigint,vd:double,vs:string,"
                "va:array<string>,vj:string>"))
            .otherwise(good))


def variant_eq_strict(l: Column, r: Column) -> Column:
    """Element equality for IN / membership over heterogeneous lists:
    same-category values compare (int/double numerically); different
    categories are simply NOT equal (false, not null) — the reference's
    TypedValue operator== (typed_value.cpp; gql_behave In tests: `2 IN
    [1, '2']` is false)."""
    num_l, num_r = variant_num(l), variant_num(r)
    return F.coalesce(
        F.when(num_l.isNotNull() & num_r.isNotNull(), num_l == num_r)
        .when(l.getField("vs").isNotNull() & r.getField("vs").isNotNull(),
              l.getField("vs") == r.getField("vs"))
        .when(l.getField("vb").isNotNull() & r.getField("vb").isNotNull(),
              l.getField("vb") == r.getField("vb"))
        .when(l.getField("va").isNotNull() & r.getField("va").isNotNull(),
              l.getField("va") == r.getField("va"))
        .when(l.getField("vj").isNotNull() & r.getField("vj").isNotNull(),
              l.getField("vj") == r.getField("vj")),
        F.lit(False))


def variant_element(v: Column, idx: int) -> Column:
    """Subscript into a list-valued variant (va string list or vj JSON
    list): decode element `idx` back into a variant. JSON element kind is
    recovered lexically (get_json_object strips string quotes, so a JSON
    number and the same-looking string collapse — documented corner)."""
    j = F.get_json_object(v.getField("vj"), f"$[{int(idx)}]")
    from_json = (
        F.when(j.rlike(r"^[\[{]"), _slots(j=j))
        .when(j == "true", _slots(b=F.lit(True)))
        .when(j == "false", _slots(b=F.lit(False)))
        .when(j.rlike(r"^-?[0-9]+$"), _slots(i=j.cast("long")))
        .when(j.rlike(r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"),
              _slots(d=j.cast("double")))
        .otherwise(_slots(s=j)))
    sa = v.getField("va")
    return (F.when(v.getField("vj").isNotNull() & j.isNotNull(), from_json)
            .when(sa.isNotNull(),
                  _slots(s=F.get(sa, F.lit(int(idx))))))


def _lex_variant(x: Column) -> Column:
    """Recover a variant from a JSON element's TEXT (same lexical corner as
    variant_element: a JSON number and the same-looking string collapse)."""
    return (F.when(x.isNull(), F.lit(None).cast(VARIANT_T))
            .when(x.rlike(r"^[\[{]"), _slots(j=x))
            .when(x == "true", _slots(b=F.lit(True)))
            .when(x == "false", _slots(b=F.lit(False)))
            .when(x.rlike(r"^-?[0-9]+$"), _slots(i=x.cast("long")))
            .when(x.rlike(r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"),
                  _slots(d=x.cast("double")))
            .otherwise(_slots(s=x)))


def variant_list_elements(v: Column) -> Column:
    """Decode a LIST-valued variant (va string list or vj JSON list) into
    an array of element variants; null when the variant holds no list.
    from_json to array<string> coerces every JSON element kind — numbers,
    booleans, nested arrays/objects — to its text, which _lex_variant maps
    back to a typed slot."""
    sa = v.getField("va")
    vj = v.getField("vj")
    js = F.from_json(vj, "array<string>")
    return (F.when(vj.isNotNull() & js.isNotNull(),
                   F.transform(js, _lex_variant))
            .when(sa.isNotNull(),
                  F.transform(sa, lambda x: _slots(s=x))))


def variant_sort_key(v: Column) -> Column:
    """Total-order sort key for ORDER BY over a variant column: the
    reference's cross-type ordering groups by type (bool < int/double <
    string), values ordered within the type."""
    rank = (F.when(v.getField("vb").isNotNull(), 0)
            .when(variant_num(v).isNotNull(), 1)
            .when(v.getField("vs").isNotNull(), 2))
    return F.struct(
        rank.alias("r"),
        v.getField("vb").cast("int").alias("b"),
        variant_num(v).alias("n"),
        v.getField("vs").alias("s"),
    )
