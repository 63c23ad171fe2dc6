"""Recursive-descent openCypher parser (reference: ANTLR Cypher.g4 +
CypherMainVisitor, src/query/frontend/ast/cypher_main_visitor.cpp)."""

from __future__ import annotations

from functools import lru_cache

from memgraph_spark.plans import cypher_ast as A
from memgraph_spark.plans.lexer import Token, tokenize

AGG_FUNCS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "COLLECT", "STDEV", "STDEVP"}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.value in kws

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in ops

    def eat_kw(self, *kws: str) -> str:
        if not self.at_kw(*kws):
            raise SyntaxError(f"expected {kws} at {self.peek()}")
        return self.next().value

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SyntaxError(f"expected {op!r} at {self.peek()}")
        self.next()

    def try_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def name(self) -> str:
        t = self.next()
        if t.kind == "NAME":
            return t.value
        if t.kind == "KEYWORD":    # keywords usable as identifiers keep case
            return t.raw or t.value
        raise SyntaxError(f"expected name at {t}")

    # -- entry --------------------------------------------------------------
    def parse(self) -> A.UnionQuery:
        hops_limit = None
        periodic_commit = None
        index_hints: list = []
        if self.at_kw("USING"):
            # preQueryDirectives (MemgraphCypher.g4:409-423): USING
            # directive (, directive)* with directive = HOPS LIMIT n |
            # INDEX :L(p,…)… | PERIODIC COMMIT n | PARALLEL EXECUTION [k]
            self.next()
            while True:
                t = self.peek()
                word = str(t.value).upper() if t.kind in ("NAME", "KEYWORD") \
                    else ""
                if word == "PERIODIC":
                    # chunked commits; our snapshot write model applies the
                    # whole batch atomically, which subsumes the chunking
                    self.next()
                    c = self.next()
                    if not (c.kind == "NAME"
                            and str(c.value).upper() == "COMMIT"):
                        raise SyntaxError(f"expected COMMIT at {c}")
                    t = self.next()
                    if t.kind != "INT":
                        raise SyntaxError(
                            f"expected integer commit size at {t}")
                    periodic_commit = int(t.value)
                elif word == "INDEX":
                    # advisory (hint_provider.cpp): Catalyst pushdown is the
                    # index; parse `:Label(prop,…)` list, record, continue
                    self.next()
                    while True:
                        if not self.at_op(":"):
                            raise SyntaxError(
                                f"expected :Label in index hint at "
                                f"{self.peek()}")
                        self.next()
                        label = self.name()
                        props = []
                        if self.at_op("("):
                            self.next()
                            while not self.at_op(")"):
                                props.append(self.name())
                                if self.at_op(","):
                                    self.next()
                            self.next()
                        index_hints.append((label, tuple(props)))
                        # a following `, :` continues the hint list; a
                        # following `, <word>` starts another directive
                        if self.at_op(",") and self.peek(1).kind == "OP":
                            self.next()
                            continue
                        break
                elif word == "PARALLEL":
                    # ScanParallel*/RewriteParallelExecution — free on Spark
                    self.next()
                    e = self.next()
                    if not (e.kind in ("NAME", "KEYWORD")
                            and str(e.value).upper() == "EXECUTION"):
                        raise SyntaxError(f"expected EXECUTION at {e}")
                    if self.peek().kind == "INT":
                        self.next()
                else:
                    self.eat_kw("HOPS")
                    self.eat_kw("LIMIT")
                    t = self.next()
                    if t.kind != "INT":
                        raise SyntaxError(
                            f"expected integer hops limit at {t}")
                    hops_limit = int(t.value)
                if self.at_op(","):
                    self.next()
                    continue
                break
        parts = [self.single_query()]
        alls: list[bool] = []
        while self.at_kw("UNION"):
            self.next()
            alls.append(self.try_kw("ALL"))
            parts.append(self.single_query())
        if self.at_op(";"):
            self.next()
        if self.peek().kind != "EOF":
            raise SyntaxError(f"unexpected trailing input at {self.peek()}")
        return A.UnionQuery(parts, alls, hops_limit, periodic_commit,
                            index_hints)

    def single_query(self) -> A.SingleQuery:
        clauses: list[A.Clause] = []
        while True:
            if self.at_kw("OPTIONAL"):
                self.next()
                self.eat_kw("MATCH")
                clauses.append(self.match_clause(optional=True))
            elif self.at_kw("MATCH"):
                self.next()
                clauses.append(self.match_clause(optional=False))
            elif self.at_kw("UNWIND"):
                self.next()
                e = self.expr()
                self.eat_kw("AS")
                clauses.append(A.Unwind(e, self.name()))
            elif self.at_kw("WITH"):
                self.next()
                clauses.append(self.projection_clause(A.With))
            elif self.at_kw("RETURN"):
                self.next()
                clauses.append(self.projection_clause(A.Return))
            elif self.at_kw("CREATE"):
                self.next()
                clauses.append(A.Create(self.patterns()))
            elif self.at_kw("MERGE"):
                self.next()
                clauses.append(self.merge_clause())
            elif self.at_kw("DELETE"):
                self.next()
                clauses.append(self.delete_clause(detach=False))
            elif self.at_kw("DETACH"):
                self.next()
                self.eat_kw("DELETE")
                clauses.append(self.delete_clause(detach=True))
            elif self.at_kw("SET"):
                self.next()
                clauses.append(A.SetClause(self.set_items()))
            elif self.at_kw("CALL"):
                self.next()
                scope = None
                if self.at_op("("):
                    # scoped CALL (x, y) { … } / (*) { … } / () { … }
                    self.next()
                    scope = []
                    if self.at_op("*"):
                        self.next()
                        scope = ["*"]
                    elif not self.at_op(")"):
                        scope.append(self.name())
                        while self.at_op(","):
                            self.next()
                            scope.append(self.name())
                    self.eat_op(")")
                if self.at_op("{"):
                    self.next()
                    inner = self.single_query()
                    extra, alls = [], []
                    while self.at_kw("UNION"):
                        self.next()
                        alls.append(self.try_kw("ALL"))
                        extra.append(self.single_query())
                    self.eat_op("}")
                    if self.at_kw("IN"):
                        # CALL { … } IN TRANSACTIONS [OF n ROWS]
                        # (periodic_commit.feature): batch-commit execution
                        # detail — results identical to the unbatched run
                        self.next()
                        t = self.next()
                        if (t.kind != "NAME"
                                or t.value.upper() != "TRANSACTIONS"):
                            raise SyntaxError(
                                f"expected TRANSACTIONS at {t}")
                        if self.at_kw("OF") or (
                                self.peek().kind == "NAME"
                                and self.peek().value.upper() == "OF"):
                            self.next()
                            n = self.next()
                            if n.kind != "INT":
                                raise SyntaxError(
                                    f"expected batch size at {n}")
                            r = self.next()
                            if (r.kind != "NAME"
                                    or r.value.upper() not in ("ROWS",
                                                               "ROW")):
                                raise SyntaxError(f"expected ROWS at {r}")
                    clauses.append(A.CallSubquery(inner, scope, extra,
                                                  alls))
                elif scope is not None:
                    raise SyntaxError("scoped CALL needs a { … } body")
                else:
                    clauses.append(self.call_clause())
            elif self.at_kw("FOREACH"):
                self.next()
                self.eat_op("(")
                v = self.name()
                self.eat_kw("IN")
                src = self.expr()
                self.eat_op("|")
                updates = self.foreach_updates()
                self.eat_op(")")
                clauses.append(A.Foreach(v, src, updates))
            elif self.at_kw("LOAD"):
                self.next()
                clauses.append(self.load_clause())
            elif self.at_kw("REMOVE"):
                self.next()
                clauses.append(A.RemoveClause(self.remove_items()))
            else:
                break
        if not clauses:
            raise SyntaxError(f"expected a clause at {self.peek()}")
        return A.SingleQuery(clauses)

    # -- clauses ------------------------------------------------------------
    def match_clause(self, optional: bool) -> A.Match:
        pats = self.patterns()
        where = self.expr() if self.try_kw("WHERE") else None
        return A.Match(pats, where, optional)

    def projection_clause(self, cls):
        distinct = self.try_kw("DISTINCT")
        star = False
        items: list[A.ReturnItem] = []
        if self.at_op("*"):
            self.next()
            star = True
            if self.at_op(","):
                self.next()
        if not star or self.peek().kind != "KEYWORD" or items:
            pass
        if not star:
            items.append(self.return_item())
        while self.at_op(","):
            self.next()
            items.append(self.return_item())
        order: list[A.OrderItem] = []
        if self.at_kw("ORDER"):
            self.next()
            self.eat_kw("BY")
            order.append(self.order_item())
            while self.at_op(","):
                self.next()
                order.append(self.order_item())
        skip = None
        if self.try_kw("SKIP"):
            skip = self.expr()
        limit = None
        if self.try_kw("LIMIT"):
            limit = self.expr()
        if cls is A.With:
            # WITH requires every non-variable expression to be aliased
            # (NoExpressionsInWith, MiscellaneousErrorAcceptance)
            for it in items:
                if it.alias is None and not isinstance(it.expr, A.Var):
                    raise SyntaxError(
                        f"expression in WITH must be aliased: {it.text!r}")
            where = self.expr() if self.try_kw("WHERE") else None
            return A.With(items, star, distinct, order, skip, limit, where)
        # duplicate output names in RETURN are a syntax error
        # (ColumnNameConflict, MiscellaneousErrorAcceptance)
        names = [it.alias or it.text for it in items]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise SyntaxError(
                f"multiple result columns with the same name {sorted(dupes)}")
        return A.Return(items, star, distinct, order, skip, limit)

    def return_item(self) -> A.ReturnItem:
        start = self.peek().pos
        e = self.expr()
        end = self.peek().pos
        text = self.text[start:end].strip()
        alias = None
        if self.try_kw("AS"):
            alias = self.name()
        return A.ReturnItem(e, alias, text)

    def order_item(self) -> A.OrderItem:
        e = self.expr()
        asc = True
        if self.at_kw("ASC", "ASCENDING"):
            self.next()
        elif self.at_kw("DESC", "DESCENDING"):
            self.next()
            asc = False
        return A.OrderItem(e, asc)

    def merge_clause(self) -> A.Merge:
        # optional parenthesized pattern: MERGE ((a)-[r:X]-(b))
        wrapped = (self.at_op("(") and self.peek(1).kind == "OP"
                   and self.peek(1).value == "(")
        if wrapped:
            self.next()
        pat = self.pattern_part()
        if wrapped:
            self.eat_op(")")
        on_match: list[A.SetItem] = []
        on_create: list[A.SetItem] = []
        while self.at_kw("ON"):
            self.next()
            which = self.eat_kw("MATCH", "CREATE")
            self.eat_kw("SET")
            items = self.set_items()
            (on_match if which == "MATCH" else on_create).extend(items)
        return A.Merge(pat, on_match, on_create)

    def foreach_updates(self) -> list[A.Clause]:
        updates: list[A.Clause] = []
        while True:
            if self.at_kw("SET"):
                self.next()
                updates.append(A.SetClause(self.set_items()))
            elif self.at_kw("REMOVE"):
                self.next()
                updates.append(A.RemoveClause(self.remove_items()))
            elif self.at_kw("CREATE"):
                self.next()
                updates.append(A.Create(self.patterns()))
            elif self.at_kw("MERGE"):
                self.next()
                updates.append(self.merge_clause())
            elif self.at_kw("DELETE"):
                self.next()
                updates.append(self.delete_clause(detach=False))
            elif self.at_kw("DETACH"):
                self.next()
                self.eat_kw("DELETE")
                updates.append(self.delete_clause(detach=True))
            elif self.at_kw("FOREACH"):
                self.next()
                self.eat_op("(")
                v = self.name()
                self.eat_kw("IN")
                src = self.expr()
                self.eat_op("|")
                inner = self.foreach_updates()
                self.eat_op(")")
                updates.append(A.Foreach(v, src, inner))
            else:
                break
        if not updates:
            raise SyntaxError("FOREACH needs at least one update clause")
        return updates

    def call_clause(self) -> A.CallProc:
        parts = [self.name()]
        while self.at_op("."):
            self.next()
            parts.append(self.name())
        args: list[A.Expr] = []
        explicit = False  # parens = explicit argument mode (TCK
        # ProcedureCallAcceptance: no parens binds args from parameters)
        if self.at_op("("):
            explicit = True
            self.next()
            if not self.at_op(")"):
                args.append(self.expr())
                while self.at_op(","):
                    self.next()
                    args.append(self.expr())
            self.eat_op(")")
        yields: list[tuple[str, str | None]] = []
        if self.try_kw("YIELD"):
            if self.at_op("*"):
                self.next()  # YIELD *: every result column joins the frame
                where = self.expr() if self.try_kw("WHERE") else None
                return A.CallProc(".".join(parts), args, [], where,
                                  explicit, "star")
            if self.at_op("-"):
                self.next()  # YIELD -: keep cardinality, drop all outputs
                return A.CallProc(".".join(parts), args, [], None,
                                  explicit, "dash")
            while True:
                col = self.name()
                alias = self.name() if self.try_kw("AS") else None
                yields.append((col, alias))
                if not self.at_op(","):
                    break
                self.next()
        # CALL … YIELD … WHERE pred (procedure_call.feature): filters the
        # yielded rows before the next clause
        where = (self.expr() if yields and self.try_kw("WHERE") else None)
        return A.CallProc(".".join(parts), args, yields, where, explicit,
                          "list" if yields else "none")

    def load_clause(self) -> A.LoadFile:
        kind = self.eat_kw("CSV", "PARQUET", "JSONL").lower()
        self.eat_kw("FROM")
        path = self.expr()
        header, delimiter, quote, nullif = True, None, None, None
        if kind == "csv":
            if self.try_kw("WITH"):
                self.eat_kw("HEADER")
            elif self.try_kw("NO"):
                self.eat_kw("HEADER")
                header = False
            if self.try_kw("DELIMITER"):
                delimiter = self.next().value
            if self.try_kw("QUOTE"):
                quote = self.next().value
            if self.try_kw("NULLIF"):
                nullif = self.next().value
        self.eat_kw("AS")
        return A.LoadFile(kind, path, self.name(), header, delimiter,
                          quote, nullif)

    def delete_clause(self, detach: bool) -> A.Delete:
        exprs = [self.expr()]
        while self.at_op(","):
            self.next()
            exprs.append(self.expr())
        return A.Delete(exprs, detach)

    def set_items(self) -> list[A.SetItem]:
        items = [self.set_item()]
        while self.at_op(","):
            self.next()
            items.append(self.set_item())
        return items

    def set_item(self) -> A.SetItem:
        # target is a postfix expression only (n, n.prop, n:Label) — a full
        # expr would swallow the '=' as a comparison operator
        subj = self.postfix()
        if isinstance(subj, A.LabelsTest):
            return A.SetItem(subj.subject, A.Literal(None), "label",
                             subj.labels, dyn_labels=subj.dyn_labels)
        if self.at_op("+="):
            self.next()
            return A.SetItem(subj, self.expr(), "+=")
        self.eat_op("=")
        return A.SetItem(subj, self.expr(), "=")

    def remove_items(self) -> list[A.RemoveItem]:
        items = []
        while True:
            subj = self.expr()
            if isinstance(subj, A.Property):
                items.append(A.RemoveItem(subj.subject, subj.key))
            elif isinstance(subj, A.Var) and self.at_op(":"):
                labels, dyn = [], []
                while self.at_op(":"):
                    self.next()
                    entry = self._label_entry()
                    (labels if isinstance(entry, str) else dyn).append(entry)
                items.append(A.RemoveItem(subj, None, labels,
                                          dyn_labels=dyn))
            elif isinstance(subj, A.LabelsTest):
                items.append(A.RemoveItem(subj.subject, None, subj.labels,
                                          dyn_labels=subj.dyn_labels))
            else:
                raise SyntaxError("REMOVE expects n.prop or n:Label")
            if not self.at_op(","):
                break
            self.next()
        return items

    # -- patterns -----------------------------------------------------------
    def patterns(self) -> list[A.PatternPart]:
        parts = [self.pattern_part()]
        while self.at_op(","):
            self.next()
            parts.append(self.pattern_part())
        return parts

    def pattern_part(self) -> A.PatternPart:
        var = None
        if (self.peek().kind == "NAME" and self.peek(1).kind == "OP"
                and self.peek(1).value == "=" and self.peek(2).kind == "OP"
                and self.peek(2).value == "("):
            var = self.name()
            self.eat_op("=")
        start = self.node_pattern()
        chain: list[tuple[A.RelPattern, A.NodePattern]] = []
        while self.at_op("-", "<"):
            rel = self.rel_pattern()
            node = self.node_pattern()
            chain.append((rel, node))
        return A.PatternPart(var, start, chain)

    def _label_entry(self):
        """One label after ':' — a plain name, a `$param` label, or a dotted
        dynamic label expression `var.prop[...]` (MemgraphCypher dynamic
        labels)."""
        if self.peek().kind == "PARAM":
            t = self.next()
            return A.Param(t.value)
        name = self.name()
        if not self.at_op("."):
            return name
        e: A.Expr = A.Var(name)
        while self.at_op("."):
            self.next()
            e = A.Property(e, self.name())
        return e

    def node_pattern(self) -> A.NodePattern:
        self.eat_op("(")
        var = None
        if self.peek().kind == "NAME" and not self.at_op(")"):
            var = self.name()
        labels: list = []
        dyn: list[A.Expr] = []
        labels_or = False
        while self.at_op(":"):
            self.next()
            entry = self._label_entry()
            if isinstance(entry, (str, A.Param)) and self.at_op("|"):
                # label disjunction :L1|L2 (MemgraphCypher label expression)
                labels_or = True
                labels.append(entry)
                while self.at_op("|"):
                    self.next()
                    labels.append(self._label_entry())
                continue
            (labels if isinstance(entry, (str, A.Param))
             else dyn).append(entry)
        props: dict[str, A.Expr] = {}
        braced = False
        if self.at_op("{"):
            props = self.map_entries()
            braced = True
        self.eat_op(")")
        return A.NodePattern(var, labels, props, braced=braced,
                             dyn_labels=dyn, labels_or=labels_or)

    def rel_pattern(self) -> A.RelPattern:
        direction = "both"
        if self.at_op("<"):
            self.next()
            self.eat_op("-")
            direction = "in"
        else:
            self.eat_op("-")
        var = None
        types: list[str] = []
        dyn_types: list[A.Expr] = []
        props: dict[str, A.Expr] = {}
        var_length = False
        lo = hi = None
        mode = flt = weight = weight_var = None
        if self.at_op("["):
            self.next()
            if self.peek().kind == "NAME" and not self.at_op(":"):
                var = self.name()
            if self.at_op(":"):
                self.next()
                entry = self._label_entry()
                (types if isinstance(entry, str)
                 else dyn_types).append(entry)
                while self.at_op("|"):
                    self.next()
                    if self.at_op(":"):
                        self.next()
                    types.append(self.name())
                # [:T|:T] matches each edge once (MatchAcceptance2
                # "relationship predicate with multiples of the same type")
                types[:] = list(dict.fromkeys(types))
            if self.at_op("*"):
                self.next()
                var_length = True
                t = self.peek()
                if (t.kind == "NAME"
                        and str(t.value).lower() in ("bfs", "wshortest",
                                                     "allshortest")):
                    mode = str(t.value).lower()
                    self.next()
                if self.peek().kind == "INT":
                    n = self.next().value
                    if self.at_op(".."):
                        self.next()
                        lo = n
                        if self.peek().kind == "INT":
                            hi = self.next().value
                    elif mode in ("wshortest", "allshortest"):
                        hi = n   # single int = upper bound for *wShortest n
                    else:
                        lo = hi = n
                elif self.at_op(".."):
                    self.next()
                    if self.peek().kind == "INT":
                        hi = self.next().value
                if self.at_op("{"):
                    props = self.map_entries()
                lam = (self.traversal_lambda() if self.at_op("(") else None)
                if mode in ("wshortest", "allshortest"):
                    weight = lam
                    if self.peek().kind == "NAME":
                        weight_var = self.name()
                    if self.at_op("("):
                        flt = self.traversal_lambda()
                else:
                    flt = lam
            if self.at_op("{"):
                props = self.map_entries()
            self.eat_op("]")
        if self.at_op("-"):
            self.next()
        if self.at_op(">"):
            self.next()
            # `<-[..]->` means either direction in the reference's grammar
            # (patterns.feature 'reverse arrow')
            direction = "both" if direction == "in" else "out"
        if not var_length:
            mode = flt = weight = weight_var = None
        return A.RelPattern(var, types, direction, props, var_length,
                            dyn_types=dyn_types, lo=lo, hi=hi, mode=mode,
                            flt=flt, weight=weight, weight_var=weight_var)

    def traversal_lambda(self) -> tuple[list[str], A.Expr]:
        """`(e, n [, p] | expr)` — EdgeAtom::Lambda (ast.hpp:1796):
        per-expansion filter / weight with the current edge, target vertex
        and (optionally) the accumulated path bound."""
        self.eat_op("(")
        params = [self.name()]
        while self.at_op(","):
            self.next()
            params.append(self.name())
        self.eat_op("|")
        body = self.expr()
        self.eat_op(")")
        return (params, body)

    def map_entries(self) -> dict[str, A.Expr]:
        self.eat_op("{")
        out: dict[str, A.Expr] = {}
        if not self.at_op("}"):
            while True:
                # keys may be identifiers, backticked, or string literals
                # ({'k1': 'v1', "k2": 2} — server_side_parameters.feature)
                if self.peek().kind == "STRING":
                    k = self.next().value
                else:
                    k = self.name()
                self.eat_op(":")
                out[k] = self.expr()
                if not self.at_op(","):
                    break
                self.next()
        self.eat_op("}")
        return out

    def map_projection(self, subject: A.Var) -> A.Expr:
        """`n {.name, .*, age: expr, other}` (ast.hpp:1005)."""
        self.eat_op("{")
        items: list[tuple] = []
        if not self.at_op("}"):
            while True:
                if self.at_op("."):
                    self.next()
                    if self.at_op("*"):
                        self.next()
                        items.append(("all",))
                    else:
                        items.append(("prop", self.name()))
                elif (self.peek().kind in ("NAME", "KEYWORD")
                        and self.peek(1).kind == "OP"
                        and self.peek(1).value == ":"):
                    k = self.name()
                    self.eat_op(":")
                    items.append(("kv", k, self.expr()))
                else:
                    items.append(("var", self.name()))
                if not self.at_op(","):
                    break
                self.next()
        self.eat_op("}")
        return A.MapProjection(subject, items)

    # -- expressions (precedence climbing) ----------------------------------
    def expr(self) -> A.Expr:
        return self.or_expr()

    def or_expr(self) -> A.Expr:
        left = self.xor_expr()
        while self.at_kw("OR"):
            self.next()
            left = A.BinaryOp("OR", left, self.xor_expr())
        return left

    def xor_expr(self) -> A.Expr:
        left = self.and_expr()
        while self.at_kw("XOR"):
            self.next()
            left = A.BinaryOp("XOR", left, self.and_expr())
        return left

    def and_expr(self) -> A.Expr:
        left = self.not_expr()
        while self.at_kw("AND"):
            self.next()
            left = A.BinaryOp("AND", left, self.not_expr())
        return left

    def not_expr(self) -> A.Expr:
        if self.at_kw("NOT"):
            self.next()
            # NOT (pattern) — pattern predicate
            operand = self.not_expr()
            if isinstance(operand, (A.PatternPredicate, A.ExistsSubquery)):
                operand.negated = not operand.negated
                return operand
            return A.UnaryOp("NOT", operand)
        return self.comparison()

    def comparison(self) -> A.Expr:
        left = self.additive()
        out = None
        while True:
            if self.at_op("=", "<>", "!=", "<", ">", "<=", ">=", "=~"):
                op = self.next().value
                if op == "!=":   # Cypher.g4 alternative spelling of <>
                    op = "<>"
                right = self.additive()
                node = A.BinaryOp(op, left, right)
                out = node if out is None else A.BinaryOp("AND", out, node)
                left = right
            elif self.at_kw("IN"):
                self.next()
                node = A.BinaryOp("IN", left, self.additive())
                out = node if out is None else A.BinaryOp("AND", out, node)
            elif self.at_kw("STARTS"):
                self.next()
                self.eat_kw("WITH") if self.at_kw("WITH") else None
                node = A.BinaryOp("STARTS", left, self.additive())
                out = node if out is None else A.BinaryOp("AND", out, node)
            elif self.at_kw("ENDS"):
                self.next()
                self.eat_kw("WITH") if self.at_kw("WITH") else None
                node = A.BinaryOp("ENDS", left, self.additive())
                out = node if out is None else A.BinaryOp("AND", out, node)
            elif self.at_kw("CONTAINS"):
                self.next()
                node = A.BinaryOp("CONTAINS", left, self.additive())
                out = node if out is None else A.BinaryOp("AND", out, node)
            elif self.at_kw("IS"):
                self.next()
                neg = self.try_kw("NOT")
                self.eat_kw("NULL")
                node = A.IsNull(left, neg)
                out = node if out is None else A.BinaryOp("AND", out, node)
            else:
                break
        return out if out is not None else left

    def additive(self) -> A.Expr:
        left = self.multiplicative()
        while self.at_op("+", "-"):
            op = self.next().value
            left = A.BinaryOp(op, left, self.multiplicative())
        return left

    def multiplicative(self) -> A.Expr:
        left = self.power()
        while self.at_op("*", "/", "%"):
            op = self.next().value
            left = A.BinaryOp(op, left, self.power())
        return left

    def power(self) -> A.Expr:
        left = self.unary()
        if self.at_op("^"):
            self.next()
            return A.BinaryOp("^", left, self.power())
        return left

    def unary(self) -> A.Expr:
        if self.at_op("-"):
            self.next()
            return A.UnaryOp("-", self.unary())
        if self.at_op("+"):
            self.next()
            return self.unary()
        return self.postfix()

    def postfix(self) -> A.Expr:
        e = self.atom()
        while True:
            if self.at_op("."):
                self.next()
                e = A.Property(e, self.name())
            elif self.at_op("["):
                self.next()
                if self.at_op(".."):
                    self.next()
                    hi = None if self.at_op("]") else self.expr()
                    e = A.Slice(e, None, hi)
                else:
                    idx = self.expr()
                    if self.at_op(".."):
                        self.next()
                        hi = None if self.at_op("]") else self.expr()
                        e = A.Slice(e, idx, hi)
                    else:
                        e = A.Subscript(e, idx)
                self.eat_op("]")
            elif self.at_op("{") and isinstance(e, A.Var):
                e = self.map_projection(e)
            elif self.at_op("::") and isinstance(e, A.Var):
                self.next()
                e = A.EnumLiteral(e.name, self.name())
            elif self.at_op(":") and isinstance(
                    e, (A.Var, A.Property, A.FuncCall, A.Subscript)):
                labels, dyn = [], []
                while self.at_op(":"):
                    self.next()
                    entry = self._label_entry()
                    (labels if isinstance(entry, str) else dyn).append(entry)
                e = A.LabelsTest(e, labels, dyn_labels=dyn)
            else:
                return e

    def atom(self) -> A.Expr:
        t = self.peek()
        if t.kind in ("INT", "FLOAT", "STRING"):
            self.next()
            return A.Literal(t.value)
        if t.kind == "PARAM":
            self.next()
            return A.Param(t.value)
        if t.kind == "KEYWORD":
            if t.value in ("TRUE", "FALSE"):
                self.next()
                return A.Literal(t.value == "TRUE")
            if t.value == "NULL":
                self.next()
                return A.Literal(None)
            if t.value == "COUNT" and not (self.peek(1).kind == "OP"
                                           and self.peek(1).value == "("):
                # `count` used as a plain variable (WITH count(*) AS count
                # RETURN count > 0 — SkipLimitAcceptance)
                self.next()
                return A.Var(t.raw or "count")
            if t.value == "COUNT":
                self.next()
                self.eat_op("(")
                if self.at_op("*"):
                    self.next()
                    self.eat_op(")")
                    return A.CountStar()
                distinct = self.try_kw("DISTINCT")
                arg = self.expr()
                self.eat_op(")")
                return A.FuncCall("count", [arg], distinct)
            if t.value == "CASE":
                return self.case_expr()
            if t.value == "EXISTS":
                self.next()
                if self.at_op("{"):
                    # EXISTS { ... } subquery (memgraph_exists.feature):
                    # bare-pattern body or a full query with UNION branches
                    self.next()
                    if self.at_op("("):
                        pat = self.pattern_part()
                        self.eat_op("}")
                        return A.PatternPredicate(pat)
                    parts = [self.single_query()]
                    alls: list[bool] = []
                    while self.at_kw("UNION"):
                        self.next()
                        alls.append(self.try_kw("ALL"))
                        parts.append(self.single_query())
                    self.eat_op("}")
                    return A.ExistsSubquery(parts, alls)
                self.eat_op("(")
                if self.at_op("("):
                    pat = self.pattern_part()
                    self.eat_op(")")
                    return A.PatternPredicate(pat)
                inner = self.expr()
                self.eat_op(")")
                return A.FuncCall("exists", [inner])
            if t.value == "ALL":          # all(x IN list WHERE pred)
                return self.quantifier("all")
            if t.value == "NOT":
                pass  # handled by not_expr
        if t.kind == "NAME":
            nxt = self.peek(1)
            if (t.value.lower() in ("any", "none", "single")
                    and nxt.kind == "OP" and nxt.value == "("):
                return self.quantifier(t.value.lower())
            # dotted function names: point.distance(a, b), duration.between(...)
            if (nxt.kind == "OP" and nxt.value == "."
                    and self.peek(2).kind in ("NAME", "KEYWORD")
                    and self.peek(3).kind == "OP" and self.peek(3).value == "("):
                mod = self.name()
                self.eat_op(".")
                fname = f"{mod}.{self.name()}"
                self.eat_op("(")
                args = []
                if not self.at_op(")"):
                    args.append(self.expr())
                    while self.at_op(","):
                        self.next()
                        args.append(self.expr())
                self.eat_op(")")
                return A.FuncCall(fname, args)
            if (nxt.kind == "OP" and nxt.value == "("
                    and t.value.lower() == "reduce"):
                # reduce(acc = init, x IN list | expr) (ast.hpp Reduce :1322)
                self.next()
                self.eat_op("(")
                acc = self.name()
                self.eat_op("=")
                init = self.expr()
                self.eat_op(",")
                v = self.name()
                self.eat_kw("IN")
                src = self.expr()
                self.eat_op("|")
                body = self.expr()
                self.eat_op(")")
                return A.ReduceExpr(acc, init, v, src, body)
            if nxt.kind == "OP" and nxt.value == "(":
                fname = self.name()
                self.eat_op("(")
                distinct = self.try_kw("DISTINCT")
                args = []
                if not self.at_op(")"):
                    args.append(self.expr())
                    while self.at_op(","):
                        self.next()
                        args.append(self.expr())
                self.eat_op(")")
                return A.FuncCall(fname, args, distinct)
            if t.value in ("any", "none", "single", "all") and nxt.kind == "OP" and nxt.value == "(":
                return self.quantifier(t.value)
            self.next()
            return A.Var(t.value)
        if t.kind == "OP" and t.value == "(":
            # parenthesized expression OR a pattern predicate (n)-[...]->(m)
            save = self.i
            try:
                pat = self.pattern_part()
                if pat.chain:   # a bare node in parens is just a grouped var
                    return A.PatternPredicate(pat)
                raise SyntaxError("not a pattern")
            except SyntaxError:
                self.i = save
            self.next()
            e = self.expr()
            self.eat_op(")")
            return e
        if t.kind == "OP" and t.value == "[":
            self.next()
            # pattern comprehension: [(n)-[:T]->(m) WHERE p | proj]
            if self.at_op("("):
                save = self.i
                try:
                    pat = self.pattern_part()
                    if not pat.chain:
                        raise SyntaxError("not a pattern comprehension")
                    where = self.expr() if self.try_kw("WHERE") else None
                    self.eat_op("|")
                    proj = self.expr()
                    self.eat_op("]")
                    return A.PatternComprehension(pat, where, proj)
                except SyntaxError:
                    self.i = save
            # named-path pattern comprehension:
            # [p = (n)-->(m) WHERE pred | size(nodes(p))]
            if (self.peek().kind == "NAME" and self.peek(1).kind == "OP"
                    and self.peek(1).value == "="
                    and self.peek(2).kind == "OP"
                    and self.peek(2).value == "("):
                save = self.i
                try:
                    pv = self.name()
                    self.eat_op("=")
                    pat = self.pattern_part()
                    if not pat.chain:
                        raise SyntaxError("not a pattern comprehension")
                    pat.var = pv
                    where = self.expr() if self.try_kw("WHERE") else None
                    self.eat_op("|")
                    proj = self.expr()
                    self.eat_op("]")
                    return A.PatternComprehension(pat, where, proj)
                except SyntaxError:
                    self.i = save
            # list comprehension: [x IN src WHERE p | proj] vs literal
            if (self.peek().kind == "NAME" and self.peek(1).kind == "KEYWORD"
                    and self.peek(1).value == "IN"):
                v = self.name()
                self.eat_kw("IN")
                src = self.expr()
                where = self.expr() if self.try_kw("WHERE") else None
                proj = None
                if self.at_op("|"):
                    self.next()
                    proj = self.expr()
                self.eat_op("]")
                return A.ListComprehension(v, src, where, proj)
            items = []
            if not self.at_op("]"):
                items.append(self.expr())
                while self.at_op(","):
                    self.next()
                    items.append(self.expr())
            self.eat_op("]")
            return A.ListLiteral(items)
        if t.kind == "OP" and t.value == "{":
            return A.MapLiteral(self.map_entries())
        raise SyntaxError(f"unexpected token {t}")

    def quantifier(self, kind: str) -> A.Expr:
        self.next()  # consume name/ALL
        self.eat_op("(")
        v = self.name()
        self.eat_kw("IN")
        src = self.expr()
        where = self.expr() if self.try_kw("WHERE") else A.Literal(True)
        self.eat_op(")")
        return A.FuncCall(f"__quant_{kind}", [A.ListComprehension(v, src, where, None)])

    def case_expr(self) -> A.Expr:
        self.eat_kw("CASE")
        test = None
        if not self.at_kw("WHEN"):
            test = self.expr()
        whens = []
        while self.try_kw("WHEN"):
            cond = self.expr()
            self.eat_kw("THEN")
            whens.append((cond, self.expr()))
        default = self.expr() if self.try_kw("ELSE") else None
        self.eat_kw("END")
        return A.CaseExpr(test, whens, default)


def parse(text: str) -> A.UnionQuery:
    """AST cache keyed on query text (reference parity: the stripped-query
    AST/plan LRU, src/query/frontend/stripped.cpp + interpreter caches).
    Parameters travel out-of-band in our API, so raw text is a sound key;
    compilation never mutates AST nodes, so entries are shareable."""
    return _parse_cached(text)


@lru_cache(maxsize=256)
def _parse_cached(text: str) -> A.UnionQuery:
    return Parser(text).parse()
