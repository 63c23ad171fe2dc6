"""Cypher AST (mirrors the shape of the reference's ast.hpp node families,
reduced to the query surface the behavior corpus exercises)."""

from __future__ import annotations

from dataclasses import dataclass, field, fields, is_dataclass


# property names that collide with internal meta columns (id/labels on
# nodes, eid/type/src/dst on rels) are escaped with this prefix in storage
# and frame columns; display layers strip it back
RESERVED_PROPS = frozenset({"id", "labels", "eid", "type", "src", "dst"})
PROP_ESCAPE = "p__"


def prop_col(name: str) -> str:
    """Storage/frame column name for a property name."""
    return PROP_ESCAPE + name if name in RESERVED_PROPS else name


def prop_name(col: str) -> str:
    """Display property name for a storage/frame column name."""
    return col[len(PROP_ESCAPE):] if col.startswith(PROP_ESCAPE) else col


def walk(node):
    """Yield every dataclass node in an expression/clause subtree."""
    if not is_dataclass(node):
        return
    yield node
    for f in fields(node):
        v = getattr(node, f.name)
        if isinstance(v, dict):
            v = list(v.values())
        for x in (v if isinstance(v, (list, tuple)) else [v]):
            yield from walk(x)


def rename_vars(node, mapping: dict):
    """Clone an expression subtree substituting variable names — used to
    alpha-rename traversal-lambda parameters so they can't shadow bound
    symbols (the reference scopes lambda symbols separately,
    symbol_generator.cpp)."""
    if isinstance(node, Var):
        return Var(mapping.get(node.name, node.name))
    if not is_dataclass(node):
        return node

    def sub(v):
        if isinstance(v, list):
            return [sub(x) for x in v]
        if isinstance(v, tuple):
            return tuple(sub(x) for x in v)
        if isinstance(v, dict):
            return {k: sub(x) for k, x in v.items()}
        return rename_vars(v, mapping) if is_dataclass(v) else v

    return type(node)(**{f.name: sub(getattr(node, f.name))
                         for f in fields(node)})


# -- expressions ------------------------------------------------------------

@dataclass
class Expr:
    pass


@dataclass
class Literal(Expr):
    value: object  # None | bool | int | float | str


@dataclass
class ListLiteral(Expr):
    items: list[Expr]


@dataclass
class MapLiteral(Expr):
    items: dict[str, Expr]


@dataclass
class MapProjection(Expr):
    """`n {.name, .*, age: n.age, other}` (MapProjectionLiteral,
    src/query/frontend/ast/ast.hpp:1005). items: ("prop", name) |
    ("all",) | ("kv", name, Expr) | ("var", name)."""
    subject: Expr
    items: list[tuple]


@dataclass
class EnumLiteral(Expr):
    """`Status::Good` (enumValueAccess, Cypher.g4:381)."""
    typ: str
    value: str


@dataclass
class Param(Expr):
    name: str


@dataclass
class Var(Expr):
    name: str


@dataclass
class Property(Expr):
    subject: Expr
    key: str


@dataclass
class UnaryOp(Expr):
    op: str  # NOT | - | +
    operand: Expr


@dataclass
class BinaryOp(Expr):
    op: str  # AND OR XOR = <> < > <= >= + - * / % ^ IN STARTS ENDS CONTAINS =~
    left: Expr
    right: Expr


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool


@dataclass
class FuncCall(Expr):
    name: str
    args: list[Expr]
    distinct: bool = False


@dataclass
class CountStar(Expr):
    pass


@dataclass
class CaseExpr(Expr):
    test: Expr | None            # simple CASE subject or None (searched)
    whens: list[tuple[Expr, Expr]]
    default: Expr | None


@dataclass
class Subscript(Expr):
    subject: Expr
    index: Expr


@dataclass
class Slice(Expr):
    subject: Expr
    lo: Expr | None
    hi: Expr | None


@dataclass
class ListComprehension(Expr):
    var: str
    source: Expr
    where: Expr | None
    projection: Expr | None


@dataclass
class ReduceExpr(Expr):
    """reduce(acc = init, x IN list | expr) (ast.hpp Reduce :1322)."""
    acc: str
    init: Expr
    var: str
    source: Expr
    body: Expr


@dataclass
class PatternPredicate(Expr):
    """exists((n)-[:T]->(m)) or bare pattern in WHERE."""
    pattern: "PatternPart"
    negated: bool = False


@dataclass
class ExistsSubquery(Expr):
    """EXISTS { MATCH ... [WHERE ...] [RETURN ...] [UNION ...] }
    (ast.hpp ExistsSubquery; memgraph_exists.feature): true when the
    correlated subquery yields at least one row."""
    parts: list             # list[SingleQuery]
    alls: list              # UNION [ALL] flags (existence ignores them)
    negated: bool = False


@dataclass
class PatternComprehension(Expr):
    """[(n)-[:T]->(m) WHERE pred | projection] — RollUpApply
    (operator.hpp:3185): a list of projections per pattern match."""
    pattern: "PatternPart"
    where: Expr | None
    projection: Expr


@dataclass
class LabelsTest(Expr):
    subject: Expr
    labels: list[str]
    # dynamic label expressions (`n:other.prop`, MemgraphCypher dynamic
    # labels) — each entry an Expr evaluating to the label string per row
    dyn_labels: list = field(default_factory=list)


# -- patterns ---------------------------------------------------------------

@dataclass
class NodePattern:
    var: str | None
    labels: list[str]
    props: dict[str, Expr] = field(default_factory=dict)
    # a `{...}` block was present (even empty) — `CREATE (bound {})` must
    # raise VariableAlreadyBound, unlike bare `CREATE (bound)`
    braced: bool = False
    # dynamic label expressions (`CREATE (m:node.name)`)
    dyn_labels: list = field(default_factory=list)
    # :L1|L2 label disjunction (match any label instead of all)
    labels_or: bool = False


@dataclass
class RelPattern:
    var: str | None
    types: list[str]
    direction: str          # out | in | both
    props: dict[str, Expr] = field(default_factory=dict)
    var_length: bool = False
    # dynamic type expressions (`CREATE ()-[:node.name]->()`)
    dyn_types: list = field(default_factory=list)
    lo: int | None = None
    hi: int | None = None
    # memgraph traversal modes (EdgeAtom::Type, ast.hpp:1807):
    # None = plain DFS enumeration, else 'bfs' | 'wshortest' | 'allshortest'
    mode: str | None = None
    # expansion filter lambda `(e, n [, p] | expr)` (filter_lambda_,
    # ast.hpp EdgeAtom::Lambda) — params then body
    flt: tuple[list[str], "Expr"] | None = None
    # weight lambda `(e, n | expr)` (weight_lambda_, wShortest/allShortest)
    weight: tuple[list[str], "Expr"] | None = None
    # total-weight output symbol (total_weight_, e.g. `... ) total_weight]`)
    weight_var: str | None = None


@dataclass
class PatternPart:
    var: str | None         # named path
    start: NodePattern
    chain: list[tuple[RelPattern, NodePattern]] = field(default_factory=list)


# -- clauses ----------------------------------------------------------------

@dataclass
class Clause:
    pass


@dataclass
class Match(Clause):
    patterns: list[PatternPart]
    where: Expr | None = None
    optional: bool = False


@dataclass
class Unwind(Clause):
    expr: Expr
    var: str


@dataclass
class ReturnItem:
    expr: Expr
    alias: str | None
    text: str               # original text (Cypher result column name)


@dataclass
class OrderItem:
    expr: Expr
    ascending: bool


@dataclass
class With(Clause):
    items: list[ReturnItem]
    star: bool = False
    distinct: bool = False
    order: list[OrderItem] = field(default_factory=list)
    skip: Expr | None = None
    limit: Expr | None = None
    where: Expr | None = None


@dataclass
class Return(Clause):
    items: list[ReturnItem]
    star: bool = False
    distinct: bool = False
    order: list[OrderItem] = field(default_factory=list)
    skip: Expr | None = None
    limit: Expr | None = None


@dataclass
class Create(Clause):
    patterns: list[PatternPart]


@dataclass
class Merge(Clause):
    pattern: PatternPart
    on_match: list["SetItem"] = field(default_factory=list)
    on_create: list["SetItem"] = field(default_factory=list)


@dataclass
class SetItem:
    subject: Expr           # Property(n, key) or Var (for n = {..} / n += {..})
    value: Expr
    op: str = "="           # '=' | '+=' | 'label' (SET n:Label)
    labels: list[str] = field(default_factory=list)
    dyn_labels: list = field(default_factory=list)


@dataclass
class SetClause(Clause):
    items: list[SetItem]


@dataclass
class RemoveItem:
    subject: Expr
    key: str | None = None
    labels: list[str] = field(default_factory=list)
    dyn_labels: list = field(default_factory=list)


@dataclass
class RemoveClause(Clause):
    items: list[RemoveItem]


@dataclass
class Delete(Clause):
    exprs: list[Expr]
    detach: bool = False


@dataclass
class Foreach(Clause):
    """FOREACH (x IN list | update-clauses) (operator.hpp:3032)."""
    var: str
    source: Expr
    updates: list[Clause]


@dataclass
class CallSubquery(Clause):
    """CALL { ... } (Apply, operator.hpp:3061): correlated via a leading
    WITH import, uncorrelated otherwise. Scoped form CALL (x, y) { ... }
    declares imports up front (`scope`; ["*"] imports everything); UNION
    branches live in `extra_parts`/`alls`."""
    query: "SingleQuery"
    scope: list | None = None
    extra_parts: list = field(default_factory=list)
    alls: list = field(default_factory=list)


@dataclass
class CallProc(Clause):
    """CALL module.proc(args) YIELD a, b AS c (CallProcedure,
    operator.hpp:2891 — procedures are UDTFs)."""
    name: str                       # dotted module.proc
    args: list[Expr]
    yields: list[tuple[str, str | None]]  # (column, alias)
    where: Expr | None = None       # CALL … YIELD … WHERE pred
    explicit: bool = True           # parens present (explicit argument mode)
    yield_mode: str = "none"        # none | star | dash | list


@dataclass
class LoadFile(Clause):
    """LOAD CSV/PARQUET/JSONL FROM path AS row (operator.hpp:2935-3000)."""
    kind: str                       # csv | parquet | jsonl
    path: Expr
    var: str
    header: bool = True
    delimiter: str | None = None
    quote: str | None = None
    nullif: str | None = None


# -- query ------------------------------------------------------------------

@dataclass
class SingleQuery:
    clauses: list[Clause]


@dataclass
class UnionQuery:
    parts: list[SingleQuery]
    alls: list[bool]        # len(parts)-1 flags: UNION ALL vs UNION
    # USING HOPS LIMIT n (MemgraphCypher.g4:413, src/query/hops_limit.hpp):
    # global cap on edges expanded by this query; None = unlimited
    hops_limit: int | None = None
    # USING PERIODIC COMMIT n (PeriodicCommit, operator.hpp:3215): commit
    # batch size; under per-batch commits, use-after-delete becomes a real
    # runtime error in the reference (deleted in batch k, touched in k+1)
    periodic_commit: int | None = None
    # USING INDEX :Label(prop,…) hints (MemgraphCypher.g4:415-419,
    # plan/hint_provider.cpp). Advisory here: Catalyst's pushdown plays the
    # index role, so hints parse and record but don't alter the plan.
    index_hints: list = field(default_factory=list)
