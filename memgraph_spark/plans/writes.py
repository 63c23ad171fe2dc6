"""Write clauses (SURVEY §2.8): CREATE / SET / REMOVE / DELETE / MERGE as
batch table-version producers.

Reference: CreateNode (operator.hpp:411), CreateExpand (:494), Delete
(operator.cpp:4764), SetProperty/SetProperties/SetLabels (:1448-1590), Merge
(:7194) mutate MVCC storage per pulled row. Spark re-expression: every write
computes a *diff DataFrame* from the current frame, eagerly materializes it
(localCheckpoint — the Accumulate barrier, operator.hpp:1870, comes free:
reads after a write see the new table version, reads before it were planned
against the old one), and swaps a new immutable table version into the
PropertyGraph. At lake scale the same diffs become Delta/Iceberg MERGE /
append commits; correctness never depends on in-place mutation.

Deliberately NOT ported (SURVEY §1.2): per-object MVCC delta chains, WAL,
replication — a table version IS the snapshot.

Known MERGE limitation (flagged): when one MERGE both matches some rows and
creates others, ON MATCH SET is skipped for the matched subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from memgraph_spark.catalog import KEY_BITS, LABEL_CODES, register_label
from memgraph_spark.operators.scan import prefix_columns
from memgraph_spark.plans import cypher_ast as A
from memgraph_spark.plans.exprs import CompileError, compile_expr


def _union_missing(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.unionByName(right, allowMissingColumns=True)


class WriteMixin:
    """Write-clause handlers mixed into QueryCompiler (plans/session.py).
    Uses: self.g, self.df, self.symbols, self._env(), self._seed(),
    self._anon_sym(), self._node_df(), self._expand_single(), self.counters."""

    # -- CREATE --------------------------------------------------------------
    def _create(self, cl: A.Create) -> None:
        for part in cl.patterns:
            sym = part.start.var or self._anon_sym("n")
            if sym not in self.symbols:
                self._create_node(part.start, sym)
            prev = sym
            for rel, node in part.chain:
                to_sym = node.var or self._anon_sym("n")
                if to_sym not in self.symbols:
                    self._create_node(node, to_sym)
                self._create_edge(prev, rel, to_sym)
                prev = to_sym

    def _create_node(self, np: A.NodePattern, sym: str) -> None:
        """CreateNode (operator.hpp:411): one node per input row. Ids are
        (label_code << KEY_BITS) + key; key comes from the pattern's `key`
        property if given, else is allocated past the label's current max."""
        # unlabeled nodes live in the reserved "" table with an empty label
        # set (the reference's vertices may carry zero labels, vertex.hpp:41)
        label = np.labels[0] if np.labels else ""
        code = register_label(label)
        if self.df is None:
            self.df = self._seed()
        # pattern comprehensions in property values roll up first
        np = A.NodePattern(np.var, np.labels,
                           {k: self._lift(v) for k, v in np.props.items()})
        env = self._env()
        if "key" in np.props:
            key = compile_expr(np.props["key"], env).cast("long")
        else:
            existing = self.g.nodes.get(label)
            base = 0
            if existing is not None and "key" in existing.columns:
                row = existing.agg(F.max("key")).first()
                base = (row[0] or 0) + 1
            rn = F.row_number().over(
                Window.orderBy(F.monotonically_increasing_id()))
            key = (F.lit(base) + rn - 1).cast("long")
        aug = self.df.withColumn(f"{sym}_key", key).withColumn(
            f"{sym}_id", F.lit(code * (1 << KEY_BITS)) + F.col(f"{sym}_key"))
        for k, ve in np.props.items():
            if k != "key":
                aug = aug.withColumn(f"{sym}_{A.prop_col(k)}",
                                     compile_expr(ve, env))
        aug = aug.withColumn(
            f"{sym}_labels",
            F.array(*[F.lit(x) for x in np.labels]).cast("array<string>"))
        aug = aug.localCheckpoint(eager=True)  # pin allocated ids
        prop_cols = [c for c in aug.columns
                     if c.startswith(f"{sym}_") and c != f"{sym}_labels"]
        diff = aug.select(*[F.col(c).alias(c[len(sym) + 1:])
                            for c in prop_cols])
        for lbl in np.labels[1:]:
            register_label(lbl)
            add = diff.select("id").withColumn("label", F.lit(lbl))
            self.g.extra_labels = (add if self.g.extra_labels is None
                                   else self.g.extra_labels.unionByName(add))
        existing = self.g.nodes.get(label)
        self.g.set_node_version(
            label, diff if existing is None else _union_missing(existing, diff))
        self.counters["nodes_created"] += diff.count()
        self.df = aug
        self.symbols[sym] = "node"

    def _create_edge(self, from_sym: str, rel: A.RelPattern, to_sym: str) -> None:
        """CreateExpand (operator.hpp:494): append (src, dst, props) rows."""
        if len(rel.types) != 1:
            raise CompileError("CREATE relationship needs exactly one type")
        if rel.direction == "both":
            raise CompileError("CREATE relationship needs a direction")
        etype = rel.types[0]
        src, dst = ((from_sym, to_sym) if rel.direction == "out"
                    else (to_sym, from_sym))
        rsym = rel.var or self._anon_sym("r")
        props = {k: self._lift(v) for k, v in rel.props.items()}
        rel = A.RelPattern(rel.var, rel.types, rel.direction, props)
        env = self._env()
        aug = self.df.withColumn(f"{rsym}_src", F.col(f"{src}_id")) \
                     .withColumn(f"{rsym}_dst", F.col(f"{dst}_id"))
        for k, ve in rel.props.items():
            aug = aug.withColumn(f"{rsym}_{A.prop_col(k)}",
                                 compile_expr(ve, env))
        aug = (aug.withColumn(
                   f"{rsym}_eid",
                   F.xxhash64(F.lit(etype), F.lit(self.g.next_epoch()),
                              F.monotonically_increasing_id()))
               .withColumn(f"{rsym}_type", F.lit(etype))
               .localCheckpoint(eager=True))
        cols = {f"{rsym}_src": "src", f"{rsym}_dst": "dst",
                f"{rsym}_eid": "eid"}
        cols.update({c: c[len(rsym) + 1:] for c in aug.columns
                     if c.startswith(f"{rsym}_")
                     and c not in cols and c != f"{rsym}_type"})
        diff = aug.select(*[F.col(c).alias(n) for c, n in cols.items()])
        existing = self.g.edges.get(etype)
        self.g.set_edge_version(
            etype, diff if existing is None else _union_missing(existing, diff))
        self.counters["relationships_created"] += diff.count()
        self.df = aug
        self.symbols[rsym] = "rel"

    # -- SET / REMOVE --------------------------------------------------------
    def _set(self, items: list[A.SetItem]) -> None:
        for item in items:
            # SET on a DELETEd symbol is a silent no-op (delete.feature:
            # 'Delete node, set property' expects an empty result, no error)
            subj = item.subject
            while isinstance(subj, A.Property):
                subj = subj.subject
            if isinstance(subj, A.Var) and subj.name in self.deleted:
                if self.periodic:
                    # per-batch commits: the object is already gone by the
                    # time the next batch's SET runs (operator.cpp:5358)
                    raise CompileError(
                        f"cannot SET on deleted object `{subj.name}`")
                continue
            if item.op == "label":
                self._set_labels(item)
            elif isinstance(item.subject, A.Property):
                self._set_property(item.subject, item.value)
            elif isinstance(item.subject, A.Var):
                self._set_properties(item.subject.name, item.value,
                                     replace=(item.op == "="))
            else:
                raise CompileError("unsupported SET target")

    def _set_labels(self, item: A.SetItem) -> None:
        """SetLabels (operator.hpp:1590) -> rows in the extra_labels table."""
        sym = item.subject.name
        ids = self.df.select(F.col(f"{sym}_id").alias("id")).dropDuplicates()
        for lbl in item.labels:
            register_label(lbl)
            add = (ids.withColumn("label", F.lit(lbl))
                   .localCheckpoint(eager=True))
            self.g.extra_labels = (add if self.g.extra_labels is None
                                   else self.g.extra_labels.unionByName(add)
                                   .dropDuplicates())
            self.counters["labels_added"] += add.count()
        self.df = self.df.withColumn(
            f"{sym}_labels",
            F.array_union(f"{sym}_labels",
                          F.array(*[F.lit(x) for x in item.labels])))

    def _set_property(self, prop: A.Property, value: A.Expr) -> None:
        """SetProperty (operator.hpp:1448): join matched (id, value) pairs
        into every label table holding those ids."""
        if not isinstance(prop.subject, A.Var):
            raise CompileError("SET target must be a bound symbol")
        sym = prop.subject.name
        kind = self.symbols.get(sym)
        skey = A.prop_col(prop.key)
        val = compile_expr(self._lift(value), self._env())
        if kind == "node":
            updates = (self.df.select(F.col(f"{sym}_id").alias("id"),
                                      val.alias("__v"))
                       .dropDuplicates(["id"])
                       .withColumn("__hit", F.lit(True))
                       .localCheckpoint(eager=True))
            self._apply_node_update(updates, skey)
        elif kind == "rel":
            updates = (self.df.select(F.col(f"{sym}_eid").alias("eid"),
                                      val.alias("__v"))
                       .dropDuplicates(["eid"])
                       .withColumn("__hit", F.lit(True))
                       .localCheckpoint(eager=True))
            self._apply_edge_update(updates, skey)
        else:
            raise CompileError(f"cannot SET a property on a {kind}")
        self.df = self.df.withColumn(f"{sym}_{skey}", val)
        self.counters["properties_set"] += updates.count()

    def _apply_node_update(self, updates: DataFrame, key: str) -> None:
        # only touch label tables whose id range intersects the update set
        codes = {r[0] for r in updates.select(
            (F.col("id") / (1 << KEY_BITS)).cast("long")).distinct().collect()}
        for label, code in LABEL_CODES.items():
            if code not in codes or label not in self.g.nodes:
                continue
            t = self.g.node(label)
            old = F.col(key) if key in t.columns else F.lit(None)
            self.g.set_node_version(label, (
                t.join(updates, on="id", how="left")
                .withColumn(key, F.when(F.col("__hit"), F.col("__v"))
                            .otherwise(old))
                .drop("__v", "__hit")))

    def _apply_edge_update(self, updates: DataFrame, key: str) -> None:
        for etype, t in list(self.g.edges.items()):
            old = F.col(key) if key in t.columns else F.lit(None)
            self.g.set_edge_version(etype, (
                t.join(updates, on="eid", how="left")
                .withColumn(key, F.when(F.col("__hit"), F.col("__v"))
                            .otherwise(old))
                .drop("__v", "__hit")))

    def _set_properties(self, sym: str, value: A.Expr, replace: bool) -> None:
        """SetProperties = / += (operator.hpp:1539) from a map literal."""
        if not isinstance(value, A.MapLiteral):
            raise CompileError("SET n = / += needs a map literal")
        if replace:
            keep = ({"id", "labels", "key"}
                    | {A.prop_col(k) for k in value.items})
            cols = {c[len(sym) + 1:] for c in self.df.columns
                    if c.startswith(f"{sym}_")}
            for k in sorted(cols - keep):
                self._set_property(A.Property(A.Var(sym), A.prop_name(k)),
                                   A.Literal(None))
        for k, ve in value.items.items():
            self._set_property(A.Property(A.Var(sym), k), ve)

    def _remove(self, cl: A.RemoveClause) -> None:
        for item in cl.items:
            if (isinstance(item.subject, A.Var)
                    and item.subject.name in self.deleted):
                if self.periodic:
                    raise CompileError(
                        f"cannot REMOVE on deleted object "
                        f"`{item.subject.name}`")
                continue  # no-op on deleted, like SET
            if item.key is not None:
                self._set_property(A.Property(item.subject, item.key),
                                   A.Literal(None))
            elif item.labels:
                sym = item.subject.name
                ids = self.df.select(F.col(f"{sym}_id").alias("id"))
                if self.g.extra_labels is not None:
                    self.g.extra_labels = self.g.extra_labels.join(
                        ids.crossJoin(self.g.spark.createDataFrame(
                            [(x,) for x in item.labels], "label string")),
                        on=["id", "label"], how="left_anti")
                self.df = self.df.withColumn(
                    f"{sym}_labels",
                    F.array_except(f"{sym}_labels",
                                   F.array(*[F.lit(x) for x in item.labels])))

    # -- DELETE --------------------------------------------------------------
    def _delete(self, cl: A.Delete) -> None:
        """Delete (operator.cpp:4764): anti-join victims out of their tables.
        Plain DELETE errors on still-connected vertices; DETACH also removes
        incident edges — the reference's contract."""
        node_ids = None
        for e in cl.exprs:
            if not isinstance(e, A.Var):
                raise CompileError("DELETE expects bound symbols")
            sym, kind = e.name, self.symbols.get(e.name)
            if kind == "rel":
                eids = (self.df.select(F.col(f"{sym}_eid").alias("eid"))
                        .dropDuplicates().localCheckpoint(eager=True))
                n = 0
                for etype, t in list(self.g.edges.items()):
                    kept = t.join(eids, on="eid", how="left_anti")
                    n += t.count() - kept.count()
                    self.g.set_edge_version(etype, kept)
                self.counters["relationships_deleted"] += n
                self.deleted.add(sym)
            elif kind == "node":
                ids = (self.df.select(F.col(f"{sym}_id").alias("id"))
                       .dropDuplicates())
                node_ids = ids if node_ids is None else node_ids.unionByName(ids)
                self.deleted.add(sym)
            elif kind == "path":
                # deleting a path deletes its relationships and nodes
                # (reference: Delete on TypedValue::Path, operator.cpp:4764)
                if self.periodic:
                    # paths deleted per-batch touch objects deleted by
                    # earlier batches (periodic_delete.feature expects error)
                    raise CompileError(
                        "cannot periodically DELETE a path")
                eids = (self.df.select(
                            F.explode(F.col(f"{sym}_eids")).alias("eid"))
                        .dropDuplicates().localCheckpoint(eager=True))
                n = 0
                for etype, t in list(self.g.edges.items()):
                    kept = t.join(eids, on="eid", how="left_anti")
                    n += t.count() - kept.count()
                    self.g.set_edge_version(etype, kept)
                self.counters["relationships_deleted"] += n
                ids = self.df.select(
                    F.explode(F.col(f"{sym}_nids")).alias("id"))
                node_ids = ids if node_ids is None else node_ids.unionByName(ids)
                self.deleted.add(sym)
            else:
                raise CompileError(f"cannot DELETE a {kind}")
        if node_ids is None:
            return
        node_ids = node_ids.dropDuplicates().localCheckpoint(eager=True)
        incident = 0
        for etype, t in list(self.g.edges.items()):
            hit = (t.join(node_ids.withColumnRenamed("id", "src"),
                          on="src", how="left_semi").count()
                   + t.join(node_ids.withColumnRenamed("id", "dst"),
                            on="dst", how="left_semi").count())
            if hit and not cl.detach:
                raise CompileError("cannot DELETE a vertex that still has "
                                   "edges (use DETACH DELETE)")
            if hit:
                kept = (t.join(node_ids.withColumnRenamed("id", "src"),
                               on="src", how="left_anti")
                        .join(node_ids.withColumnRenamed("id", "dst"),
                              on="dst", how="left_anti"))
                incident += t.count() - kept.count()
                self.g.set_edge_version(etype, kept)
        self.counters["relationships_deleted"] += incident
        deleted = 0
        for label, t in list(self.g.nodes.items()):
            kept = t.join(node_ids, on="id", how="left_anti")
            deleted += t.count() - kept.count()
            self.g.set_node_version(label, kept)
        if self.g.extra_labels is not None:
            self.g.extra_labels = self.g.extra_labels.join(
                node_ids, on="id", how="left_anti")
        self.counters["nodes_deleted"] += deleted

    # -- MERGE ---------------------------------------------------------------
    def _merge(self, cl: A.Merge) -> None:
        """Merge (operator.cpp:7194): MATCH-else-CREATE per input row,
        re-expressed as: left-join the pattern -> CREATE the distinct missing
        bindings -> re-join so every row binds."""
        part = cl.pattern
        if not part.chain:
            self._merge_node(part.start, cl)
        elif (len(part.chain) == 1
              and part.chain[0][0].direction != "both"
              and not cl.pattern.chain[0][0].props
              and not part.chain[0][1].props
              and part.start.var in self.symbols
              and part.chain[0][1].var in self.symbols):
            self._merge_edge(part, cl)
        else:
            self._merge_general(part, cl)

    def _merge_general(self, part: A.PatternPart, cl: A.Merge) -> None:
        """Full-pattern MERGE: per input row, bind the whole pattern if it
        matches, else create it (Merge cursor, operator.cpp:7194, runs its
        match branch then its create branch per pulled row)."""
        if self.df is None:
            self.df = self._seed()
        frame = (self.df.withColumn("__mrow", F.monotonically_increasing_id())
                 .localCheckpoint(eager=True))
        env = self._env(frame)
        # null literal/expression properties are a merge error
        prop_exprs = list(part.start.props.values())
        for rel, node in part.chain:
            prop_exprs += list(rel.props.values()) + list(node.props.values())
        null_cond = None
        compilable = []
        for ve in prop_exprs:
            try:
                v = compile_expr(ve, env)
            except CompileError:
                continue
            compilable.append(ve)
            null_cond = v.isNull() if null_cond is None \
                else null_cond | v.isNull()
        if null_cond is not None and frame.filter(null_cond).count():
            raise CompileError("cannot MERGE with a null property value")

        # 1) match attempt over the whole pattern
        sub = self._sub_compiler("mm")
        sub.df = frame
        sub.symbols = dict(self.symbols)
        sub._pattern_part(part)
        matched = sub.df.localCheckpoint(eager=True)
        have_match = not matched.isEmpty()
        missing = frame.join(matched.select("__mrow").dropDuplicates(),
                             "__mrow", "left_anti")

        if cl.on_match and have_match:
            subm = self._sub_compiler("om2")
            subm.df = matched
            subm.symbols = dict(sub.symbols)
            subm.counters = self.counters
            subm._set(cl.on_match)
        if not missing.isEmpty():
            # one creation per distinct (bound anchors, property values)
            dd = missing
            keys = [f"{s}_id" for s in self._pattern_syms([part])
                    if s in self.symbols
                    and self.symbols.get(s) == "node"]
            env_m = self._env(dd)
            for i, ve in enumerate(compilable):
                dd = dd.withColumn(f"__mp{i}", compile_expr(ve, env_m))
                keys.append(f"__mp{i}")
            # undirected single-rel merges are order-insensitive: one create
            # per unordered endpoint pair (sequential rows would re-match)
            if (len(part.chain) == 1
                    and part.chain[0][0].direction == "both"
                    and part.start.var in self.symbols
                    and part.chain[0][1].var in self.symbols):
                a, b = part.start.var, part.chain[0][1].var
                dd = (dd.withColumn("__mlo", F.least(F.col(f"{a}_id"),
                                                     F.col(f"{b}_id")))
                      .withColumn("__mhi", F.greatest(F.col(f"{a}_id"),
                                                      F.col(f"{b}_id"))))
                keys = [k for k in keys
                        if k not in (f"{a}_id", f"{b}_id")] \
                    + ["__mlo", "__mhi"]
            dd = dd.dropDuplicates(keys or ["__mrow"])
            # undirected merge creates in the written (out) direction
            chain = [(A.RelPattern(r.var, r.types,
                                   "out" if r.direction == "both"
                                   else r.direction, r.props), n)
                     for r, n in part.chain]
            creator = self._sub_compiler("mc2")
            creator.df = dd
            creator.symbols = dict(self.symbols)
            creator.counters = self.counters
            creator._create(A.Create([A.PatternPart(None, part.start, chain)]))
            if cl.on_create:
                creator._set(cl.on_create)
        # rebind every input row against the new table versions
        sub2 = self._sub_compiler("mr")
        sub2.df = frame
        sub2.symbols = dict(self.symbols)
        sub2._pattern_part(part)
        self.df = sub2.df.drop("__mrow")
        for s, k in sub2.symbols.items():
            self.symbols.setdefault(s, k)

    def _merge_node(self, np: A.NodePattern, cl: A.Merge) -> None:
        sym = np.var or self._anon_sym("n")
        if sym in self.symbols:
            raise CompileError(f"MERGE on already-bound symbol {sym}")
        if self.df is None:
            self.df = self._seed()
        frame = self.df.localCheckpoint(eager=True)
        if np.props:
            env0 = self._env(frame)
            null_cond = None
            for ve in np.props.values():
                try:
                    v = compile_expr(ve, env0)
                except CompileError:
                    continue   # comprehension props are lifted downstream
                null_cond = v.isNull() if null_cond is None \
                    else null_cond | v.isNull()
            if null_cond is not None and frame.filter(null_cond).count():
                raise CompileError("cannot MERGE with a null property value")

        def join_pattern(how: str) -> DataFrame:
            p = prefix_columns(self._node_df(np.labels), sym)
            cond = F.lit(True)
            env = self._env(frame)
            for k, ve in np.props.items():
                col = f"{sym}_{A.prop_col(k)}"
                c = F.col(col) if col in p.columns else F.lit(None)
                cond = cond & (c == compile_expr(ve, env))
            return frame.join(p, cond, how)

        matched = join_pattern("left")
        missing = (matched.filter(F.col(f"{sym}_id").isNull())
                   .select(*frame.columns))
        n_missing = missing.count()
        # ON MATCH applies to the rows that bound BEFORE the create step, so
        # mixed match+create batches set only the pre-existing nodes
        # (operator.cpp:7194 runs the two cursors per input row; batched, the
        # split is by the null-ness of the joined id)
        wrote_match = False
        if cl.on_match:
            found = matched.filter(F.col(f"{sym}_id").isNotNull())
            if not found.isEmpty():
                sub = self._sub_compiler("om")
                sub.df = found
                sub.symbols = dict(self.symbols)
                sub.symbols[sym] = "node"
                sub._set(cl.on_match)
                wrote_match = True
        if n_missing:
            env_m = self._env(missing)
            distinct = missing.select(
                *[compile_expr(ve, env_m).alias(f"__p_{k}")
                  for k, ve in np.props.items()]).dropDuplicates()
            creator = self._sub_compiler("mc")
            creator.df = distinct if np.props else missing.limit(1)
            creator.symbols = {}
            creator._create_node(
                A.NodePattern(sym, np.labels,
                              {k: A.Var(f"__p_{k}") for k in np.props}), sym)
            if cl.on_create:
                creator._set(cl.on_create)
        if n_missing or wrote_match:
            self.df = join_pattern("inner")  # rebind on the new table version
        else:
            self.df = matched
        self.symbols[sym] = "node"

    def _merge_edge(self, part: A.PatternPart, cl: A.Merge) -> None:
        rel, target = part.chain[0]
        a, b = part.start.var, target.var
        if len(rel.types) != 1 or rel.direction == "both":
            raise CompileError("MERGE relationship needs one type + direction")
        etype = rel.types[0]
        src, dst = (a, b) if rel.direction == "out" else (b, a)
        frame = self.df.localCheckpoint(eager=True)
        existing = self.g.edges.get(etype)
        if existing is not None:
            pairs = existing.select(F.col("src").alias("__s"),
                                    F.col("dst").alias("__d")).dropDuplicates()
            missing = frame.join(
                pairs, (F.col(f"{src}_id") == F.col("__s"))
                & (F.col(f"{dst}_id") == F.col("__d")), "left_anti")
        else:
            missing = frame
        n_missing = missing.count()
        # ON MATCH first, on the rows whose relationship already exists —
        # mixed batches set only those (see _merge_node note)
        if cl.on_match:
            found = (frame.join(missing.select(f"{src}_id", f"{dst}_id")
                                .dropDuplicates(),
                                [f"{src}_id", f"{dst}_id"], "left_anti")
                     if n_missing else frame)
            if not found.isEmpty():
                sub = self._sub_compiler("om")
                sub.df, sub.symbols = found, dict(self.symbols)
                bind_rel = A.RelPattern(rel.var or sub._anon_sym("r"),
                                        rel.types, rel.direction, rel.props)
                sub._expand_single(a, bind_rel, target, b)
                sub._set(cl.on_match)
        if n_missing:
            creator = self._sub_compiler("me")
            creator.df = missing.dropDuplicates([f"{src}_id", f"{dst}_id"])
            creator.symbols = dict(self.symbols)
            creator._create_edge(a, rel, b)
            if cl.on_create:
                creator._set(cl.on_create)
        # rebind against the (possibly new) edge version so the rel is visible
        self.df = frame
        self._expand_single(a, rel, target, b)

    def _sub_compiler(self, prefix: str):
        from memgraph_spark.plans.session import QueryCompiler
        sub = QueryCompiler(self.g, self.params, hops=self.hops, anon_prefix=prefix)
        sub.counters = self.counters
        return sub
