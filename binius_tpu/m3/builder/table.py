"""M3 table builder: typed column DSL over the core constraint system.

Mirrors `crates/m3/src/builder/` (constraint_system.rs, table.rs, column.rs,
channel.rs — subset, growing): tables own columns (committed, shifted,
computed, constant), zero constraints, and channel flushes; `compile()`
lowers everything to the core `ConstraintSystem` given per-table row counts.

Layout convention (matches the reference's vertical packing): a column with
2^v values per row becomes an oracle with log_rows + v variables; the value
index occupies the LOW v bits, the row index the high bits.
"""

from __future__ import annotations

import dataclasses

from ...constraint_system import oracle as om
from ...constraint_system.system import (ConstraintSet, ConstraintSystem, Flush,
                                         NonZeroClaim, PULL, PUSH)
from ...math.arith import ArithExpr


@dataclasses.dataclass(frozen=True)
class Col:
    """Typed column handle: tower level + log2(values per row)."""

    table_id: int
    index: int
    level: int
    log_values_per_row: int
    name: str = ""

    def expr(self) -> ArithExpr:
        raise TypeError("use table-local expression building via partition vars")


@dataclasses.dataclass
class _ColumnDef:
    col: Col
    kind: str                   # committed | shifted | computed | constant
    inner: object = None        # Col for shifted; ArithExpr over cols for computed
    shift_offset: int = 0
    shift_block_bits: int = 0
    shift_variant: str = ""
    expr_cols: tuple = ()       # for computed: the Cols appearing in expr order
    constant: int = 0


class TableBuilder:
    def __init__(self, table_id: int, name: str = ""):
        self.table_id = table_id
        self.name = name
        self.columns: list[_ColumnDef] = []
        self.zero_constraints: list = []   # (name, log_vpr, expr, cols, steps)
        self.flushes: list = []            # (channel_id, direction, [Col], multiplicity)
        self.fixed_log_rows: int | None = None
        self.size_spec: str = "arbitrary"  # TableSizeSpec (`mod.rs:115-122`)
        self.nonzero_cols: list = []

    def assert_nonzero(self, col: Col) -> None:
        """Column must be non-zero in every row (`builder/table.rs
        assert_nonzero`); proven via the grand-product phase."""
        assert col.log_values_per_row == 0
        self.nonzero_cols.append(col)

    def require_power_of_two_size(self) -> None:
        self.size_spec = "po2"

    def require_fixed_size(self, log_rows: int) -> None:
        """Pin this table to exactly 2^log_rows rows (the reference's
        `require_fixed_size`, used by indexed lookup tables)."""
        self.fixed_log_rows = log_rows
        self.size_spec = "fixed"

    # -- columns -----------------------------------------------------------
    def _new_col(self, level, log_vpr, name) -> Col:
        return Col(self.table_id, len(self.columns), level, log_vpr, name)

    def add_committed(self, name: str, level: int, log_values_per_row: int = 0) -> Col:
        c = self._new_col(level, log_values_per_row, name)
        self.columns.append(_ColumnDef(c, "committed"))
        return c

    def add_shifted(self, name: str, inner: Col, offset: int, block_bits: int,
                    variant: str) -> Col:
        assert block_bits <= inner.log_values_per_row, \
            "shift block must fit within a row"
        c = self._new_col(inner.level, inner.log_values_per_row, name)
        self.columns.append(_ColumnDef(c, "shifted", inner=inner, shift_offset=offset,
                                       shift_block_bits=block_bits,
                                       shift_variant=variant))
        return c

    def add_computed(self, name: str, expr: ArithExpr, cols: list) -> Col:
        """Column defined as an arithmetic expression of other columns (same
        values-per-row); lowered to a LinearCombination when linear, or a
        Composite oracle (eq-weighted sumcheck reduction) otherwise."""
        lvl = 7
        vpr = cols[0].log_values_per_row
        assert all(c.log_values_per_row == vpr for c in cols)
        c = self._new_col(lvl, vpr, name)
        self.columns.append(_ColumnDef(c, "computed", inner=expr, expr_cols=tuple(cols)))
        return c

    def add_constant(self, name: str, level: int, value: int,
                     log_values_per_row: int = 0) -> Col:
        c = self._new_col(level, log_values_per_row, name)
        self.columns.append(_ColumnDef(c, "constant", constant=value))
        return c

    def add_static_exp(self, name: str, bit_cols: list, base: int,
                       base_level: int) -> Col:
        """Committed column constrained (via the GKR exp phase) to equal
        base^(bit-composed exponent) of the B1 `bit_cols`, LSB first
        (`builder/table.rs add_static_exp`). The prover computes its values;
        do not fill it."""
        vpr = bit_cols[0].log_values_per_row
        assert all(c.log_values_per_row == vpr and c.level == 0 for c in bit_cols)
        assert len(bit_cols) <= 1 << base_level
        c = self._new_col(base_level, vpr, name)
        self.columns.append(_ColumnDef(c, "static_exp", expr_cols=tuple(bit_cols),
                                       constant=base))
        return c

    def add_dynamic_exp(self, name: str, bit_cols: list, base: Col) -> Col:
        """Committed column equal to base_col^(bit-composed exponent)
        (`builder/table.rs add_dynamic_exp`); result level = base level."""
        vpr = bit_cols[0].log_values_per_row
        assert all(c.log_values_per_row == vpr and c.level == 0 for c in bit_cols)
        assert base.log_values_per_row == vpr
        assert len(bit_cols) <= 1 << base.level
        c = self._new_col(base.level, vpr, name)
        self.columns.append(_ColumnDef(c, "dynamic_exp", inner=base,
                                       expr_cols=tuple(bit_cols)))
        return c

    def add_packed(self, name: str, inner: Col) -> Col:
        """Pack all 2^v per-row values of `inner` into ONE value per row at
        tower level inner.level + v (`builder/table.rs add_packed`)."""
        assert inner.log_values_per_row > 0
        c = self._new_col(inner.level + inner.log_values_per_row, 0, name)
        self.columns.append(_ColumnDef(c, "packed", inner=inner))
        return c

    def add_selected(self, name: str, inner: Col, index: int) -> Col:
        """Select per-row value `index` of a vertically packed column
        (`builder/table.rs add_selected`); lowers to a Projected oracle."""
        assert 0 <= index < (1 << inner.log_values_per_row)
        c = self._new_col(7, 0, name)
        self.columns.append(_ColumnDef(c, "selected", inner=inner,
                                       constant=index, shift_block_bits=0))
        return c

    def add_selected_block(self, name: str, inner: Col, index: int,
                           log_new_vpr: int) -> Col:
        """Select the 2^log_new_vpr per-row values starting at value-index
        index << log_new_vpr (`builder/table.rs add_selected_block`)."""
        v = inner.log_values_per_row
        assert log_new_vpr < v and 0 <= index < (1 << (v - log_new_vpr))
        c = self._new_col(7, log_new_vpr, name)
        self.columns.append(_ColumnDef(c, "selected", inner=inner,
                                       constant=index,
                                       shift_block_bits=log_new_vpr))
        return c

    def add_structured(self, name: str, level: int, expr: ArithExpr) -> Col:
        """MLE-structured column: value at row r is `expr` evaluated on the
        bits of r (var i = bit i, LSB first); `expr` must be multilinear.
        Covers both the reference's `add_structured` (StructuredDynSize) and
        its circuit-valued `add_fixed` (`builder/table.rs`,
        `builder/structured.rs`) — vars beyond the compiled log_rows are
        bound to zero."""
        c = self._new_col(level, 0, name)
        self.columns.append(_ColumnDef(c, "structured", inner=expr))
        return c

    def add_fixed(self, name: str, level: int, pattern: list,
                  log_values_per_row: int) -> Col:
        """Column repeating a public per-row pattern of 2^v values (the
        reference's `add_fixed`, `builder/table.rs`)."""
        assert len(pattern) == 1 << log_values_per_row
        c = self._new_col(level, log_values_per_row, name)
        self.columns.append(_ColumnDef(c, "fixed", inner=tuple(int(v) for v in pattern)))
        return c

    # -- constraints -------------------------------------------------------
    def assert_zero(self, name: str, cols: list, expr: ArithExpr,
                    group: str = "") -> None:
        """expr is over var(i) = cols[i]; all cols share values-per-row.

        All constraints of one (table, values-per-row) partition lower into
        ONE ConstraintSet, mirroring the reference
        (`builder/constraint_system.rs` compile: one
        `translate_constraint_set` per TablePartition); the prover groups
        structurally identical compositions WITHIN the claim for shared
        compiled round kernels, so `group` is accepted for source
        compatibility but no longer affects lowering.

        The canonical ArithCircuit steps are captured HERE, while the
        builder-constructed expression tree's object-sharing topology is
        intact — the reference likewise converts at assert_zero time
        (`table.rs:724-727` `ArithCircuit::from(expr.expr())`).
        """
        from ...constraint_system import canonical as canon
        vpr = cols[0].log_values_per_row
        assert all(c.log_values_per_row == vpr for c in cols)
        self.zero_constraints.append(
            (name, vpr, expr, tuple(cols), canon.circuit_steps(expr)))

    def stat(self):
        """Proving-cost statistics for this table (`builder/table.rs:825`)."""
        from .stat import TableStat
        return TableStat(self)

    # -- flushes -----------------------------------------------------------
    def _check_flush(self, cols: list, selector) -> None:
        """Flush columns must share a values-per-row; a multi-value flush
        (vpr > 0) contributes every value of every row to the channel
        (`builder/table.rs` flushes of Col<_, VALUES_PER_ROW>)."""
        vpr = cols[0].log_values_per_row
        assert all(c.log_values_per_row == vpr for c in cols), \
            "flush columns must share one values-per-row"
        assert selector is None or selector.log_values_per_row == vpr, \
            "flush selector must match the columns' values-per-row"

    def push(self, channel_id: int, cols: list, multiplicity: int = 1,
             selector=None) -> None:
        self._check_flush(cols, selector)
        self.flushes.append((channel_id, PUSH, tuple(cols), multiplicity, selector))

    def pull(self, channel_id: int, cols: list, multiplicity: int = 1,
             selector=None) -> None:
        self._check_flush(cols, selector)
        self.flushes.append((channel_id, PULL, tuple(cols), multiplicity, selector))


class M3ConstraintSystem:
    """Top-level builder: tables + channels (`builder/constraint_system.rs:36`)."""

    def __init__(self):
        self.tables: list[TableBuilder] = []
        self.n_channels = 0

    def add_table(self, name: str = "") -> TableBuilder:
        t = TableBuilder(len(self.tables), name)
        self.tables.append(t)
        return t

    def add_channel(self) -> int:
        c = self.n_channels
        self.n_channels += 1
        return c

    def compile(self, table_log_rows: list[int]):
        """Lower with power-of-two row counts (sugar for `compile_sizes`)."""
        return self.compile_sizes([1 << lr for lr in table_log_rows])

    def compile_sizes(self, table_sizes: list[int]):
        """Lower to the core system with ARBITRARY table sizes. Returns
        (ConstraintSystem, oracle_map) where oracle_map[(table_id,
        col_index)] = oracle id.

        Oracles are sized to the power-of-two capacity; tables whose size is
        below capacity get a StepDown selector appended to every flush so
        padding rows stay out of the channel balance
        (`constraint_system/verify.rs:390-430` augment_flush_po2_step_down).
        Zero constraints hold over the full capacity — gadget witnesses pad
        with zero rows, which every shipped gadget satisfies.
        """
        from ...constraint_system import canonical as canon

        assert len(table_sizes) == len(self.tables)
        table_log_rows = []
        for t, size in zip(self.tables, table_sizes):
            assert size >= 0
            log_cap = max(0, (size - 1).bit_length())
            if t.size_spec == "fixed":
                assert size == 1 << t.fixed_log_rows, \
                    f"table {t.name} requires exactly 2^{t.fixed_log_rows} rows"
            elif t.size_spec == "po2":
                assert size == 1 << log_cap, \
                    f"table {t.name} requires a power-of-two size"
            assert size == 1 << log_cap or not t.nonzero_cols, \
                "non-zero claims need a power-of-two table (padding rows are 0)"
            table_log_rows.append(log_cap)
        oracles = om.OracleSet()
        oracle_map: dict = {}
        constraint_sets = []
        flushes = []
        exponents = []
        non_zero_claims = []
        # sizeless (symbolic) records for the reference-format serialization
        # + digest (`constraint_system/canonical.py`); one record per oracle,
        # same dense id order. Step-down padding selectors are appended AFTER
        # all symbolic oracles (the reference augments them at prove time,
        # `verify.rs:390-430`, so they stay out of the symbolic description).
        sym_oracles: list = []
        sym_csets: list = []
        sym_flushes: list = []
        sym_exps: list = []
        pending_flushes: list = []  # (table_idx, Flush fields..., needs_sd, vpr)
        for t_idx, (t, log_rows, size) in enumerate(
                zip(self.tables, table_log_rows, table_sizes)):
            def rec(name, vpr, level, variant):
                sym_oracles.append(canon.SymbolicOracle(
                    name, t_idx, vpr, level, variant))

            for cd in t.columns:
                col = cd.col
                n_vars = log_rows + col.log_values_per_row
                key = (t.table_id, col.index)
                nm = f"{t.name}.{col.name}"
                if cd.kind == "committed":
                    oracle_map[key] = oracles.add_committed(n_vars, col.level, nm)
                    rec(nm, col.log_values_per_row, col.level, ("committed",))
                elif cd.kind == "shifted":
                    inner_id = oracle_map[(t.table_id, cd.inner.index)]
                    oracle_map[key] = oracles.add_shifted(
                        inner_id, cd.shift_offset, cd.shift_block_bits,
                        cd.shift_variant, nm)
                    rec(nm, col.log_values_per_row, col.level,
                        ("shifted", inner_id, cd.shift_offset,
                         cd.shift_block_bits, cd.shift_variant))
                elif cd.kind == "computed":
                    expr = cd.inner
                    inner_ids = [oracle_map[(t.table_id, c.index)] for c in cd.expr_cols]
                    if expr.degree() > 1:
                        oracle_map[key] = oracles.add_composite(
                            n_vars, inner_ids, expr, nm)
                        rec(nm, col.log_values_per_row, 7,
                            ("composite", tuple(inner_ids),
                             canon.circuit_steps(expr)))
                    else:
                        terms, offset = _linearize(expr, len(cd.expr_cols))
                        lc_terms = list(zip(inner_ids, terms))
                        oracle_map[key] = oracles.add_linear_combination(
                            n_vars, lc_terms, offset, nm)
                        rec(nm, col.log_values_per_row, 7,
                            ("linear_combination", offset, tuple(lc_terms)))
                elif cd.kind == "constant":
                    # reference lowering (`builder/constraint_system.rs:541-549`):
                    # a ONE-ROW transparent `{name}_single` wrapped in a
                    # Repeating virtual oracle `{name}` — two oracles, the
                    # repeating one registered for the column
                    from ...protocols.transparent import Constant
                    tp = Constant(col.log_values_per_row, cd.constant, col.level)
                    tid = oracles.add_transparent(tp, nm + "_single")
                    rec(nm + "_single", col.log_values_per_row, col.level,
                        ("transparent", "Constant",
                         (("usize", col.log_values_per_row),
                          ("f128", cd.constant), ("usize", col.level))))
                    oracle_map[key] = oracles.add_repeating(tid, log_rows, nm)
                    rec(nm, col.log_values_per_row, col.level,
                        ("repeating", tid))
                elif cd.kind == "fixed":
                    from ...protocols.transparent import MLEFromValues
                    tp = MLEFromValues(cd.inner, col.level)
                    tid = oracles.add_transparent(tp, nm + ".pattern")
                    rec(nm + ".pattern", col.log_values_per_row, col.level,
                        ("transparent", "MultilinearExtensionTransparent",
                         (("vec_f128", tuple(int(v) for v in cd.inner)),)))
                    oracle_map[key] = oracles.add_repeating(tid, log_rows, nm)
                    rec(nm, col.log_values_per_row, col.level,
                        ("repeating", tid))
                elif cd.kind == "packed":
                    inner_id = oracle_map[(t.table_id, cd.inner.index)]
                    oracle_map[key] = oracles.add_packed(
                        inner_id, cd.inner.log_values_per_row, nm)
                    rec(nm, col.log_values_per_row,
                        cd.inner.level + cd.inner.log_values_per_row,
                        ("packed", inner_id, cd.inner.log_values_per_row))
                elif cd.kind == "selected":
                    inner_id = oracle_map[(t.table_id, cd.inner.index)]
                    nb = cd.inner.log_values_per_row - cd.shift_block_bits
                    bits = tuple((cd.constant >> i) & 1 for i in range(nb))
                    oracle_map[key] = oracles.add_projected(
                        inner_id, bits, cd.shift_block_bits, nm)
                    rec(nm, col.log_values_per_row, 7,
                        ("projected", inner_id, bits,
                         ("offset", cd.shift_block_bits)))
                elif cd.kind == "structured":
                    from ...protocols.transparent import StructuredArith
                    expr = _bind_high_vars_zero(cd.inner, n_vars)
                    tp = StructuredArith(expr, n_vars, col.level)
                    oracle_map[key] = oracles.add_transparent(tp, nm)
                    # sizeless: the unbound circuit (variant 2 Structured)
                    rec(nm, col.log_values_per_row, col.level,
                        ("structured", canon.circuit_steps(cd.inner)))
                elif cd.kind in ("static_exp", "dynamic_exp"):
                    # oracle here, in declaration order; the Exp record is
                    # emitted in the partition loop below (reference
                    # `constraint_system.rs` compile: exps per partition)
                    oracle_map[key] = oracles.add_committed(n_vars, col.level, nm)
                    rec(nm, col.log_values_per_row, col.level, ("committed",))

            # --- per-partition emission, ascending values-per-row ---
            # The reference's compile() iterates table.partitions (a
            # SparseIndex keyed on log2(values_per_row) -> ascending) and for
            # each partition emits: Exp records (partition-column order),
            # flushes (call order), then ONE translated constraint set whose
            # oracle list is the USED partition columns in declaration order
            # (`translate_constraint_set`). Divergence 1(d) closure: this
            # replaces the old (vpr, group)-split, first-use-ordered sets.
            part_vprs = sorted({c.col.log_values_per_row for c in t.columns})
            from ...constraint_system.exp import Exp
            for vpr in part_vprs:
                # Exp records: partition columns in declaration order
                for cd in t.columns:
                    col = cd.col
                    if col.log_values_per_row != vpr or \
                            cd.kind not in ("static_exp", "dynamic_exp"):
                        continue
                    key = (t.table_id, col.index)
                    bits_ids = tuple(oracle_map[(t.table_id, b.index)]
                                     for b in cd.expr_cols)
                    if cd.kind == "static_exp":
                        exponents.append(Exp(bits_ids, oracle_map[key],
                                             col.level, base_const=cd.constant))
                        sym_exps.append(canon.SymbolicExp(
                            bits_ids, ("const", cd.constant, col.level),
                            oracle_map[key]))
                    else:
                        base_id = oracle_map[(t.table_id, cd.inner.index)]
                        exponents.append(Exp(bits_ids, oracle_map[key],
                                             col.level, base_oracle=base_id))
                        sym_exps.append(canon.SymbolicExp(
                            bits_ids, ("oracle", base_id), oracle_map[key]))

                # flushes of this partition, call order
                for channel_id, direction, cols, mult, selector in t.flushes:
                    if cols[0].log_values_per_row != vpr:
                        continue
                    sel_ids = ((oracle_map[(t.table_id, selector.index)],)
                               if selector is not None else ())
                    ids = tuple(oracle_map[(t.table_id, c.index)] for c in cols)
                    # reference gating (`verify.rs:408-410`): every flush of
                    # an Arbitrary-spec table gets a step-down selector, even
                    # when the runtime size happens to be a power of two (the
                    # mask is then all-ones) — matching ids/bytes requires
                    # matching this
                    pending_flushes.append((t_idx, channel_id, direction, ids,
                                            mult, sel_ids, vpr,
                                            t.size_spec not in ("fixed", "po2")))
                    sym_flushes.append(canon.SymbolicFlush(
                        t_idx, vpr, tuple(("oracle", i) for i in ids),
                        channel_id, direction, sel_ids, mult))

                # ONE constraint set per partition: used columns in
                # declaration order, constraints in assert_zero call order
                entries = [(name, expr, cols, steps)
                           for name, c_vpr, expr, cols, steps
                           in t.zero_constraints if c_vpr == vpr]
                if not entries:
                    continue
                used_idx: set = set()
                for _, expr, cols, _ in entries:
                    for i in expr.vars_used():
                        used_idx.add(cols[i].index)
                col_list = [c for cd in t.columns
                            for c in (cd.col,)
                            if c.log_values_per_row == vpr
                            and c.index in used_idx]
                dense = {c.index: pos for pos, c in enumerate(col_list)}
                exprs, sym_constraints = [], []
                for name, expr, cols, steps in entries:
                    remap = {i: dense[c.index] for i, c in enumerate(cols)
                             if i in expr.vars_used()}
                    exprs.append(expr.remap_vars(remap))
                    sym_constraints.append(canon.SymbolicConstraint(
                        name, canon.remap_steps(steps, remap), ("zero",)))
                ids = tuple(oracle_map[(t.table_id, c.index)] for c in col_list)
                constraint_sets.append(ConstraintSet(
                    log_rows + vpr, ids, tuple(exprs)))
                sym_csets.append(canon.SymbolicConstraintSet(
                    t_idx, vpr, ids, tuple(sym_constraints)))

            # non-zero claims: column declaration order (the reference pushes
            # them while adding column oracles, `add_oracles_for_columns`)
            for c in sorted(t.nonzero_cols, key=lambda c: c.index):
                non_zero_claims.append(NonZeroClaim(oracle_map[(t.table_id, c.index)]))

        # step-down padding selectors for non-power-of-two tables, appended
        # AFTER all symbolic oracles so the sizeless description above is a
        # clean prefix of the sized oracle set (the reference creates these
        # at prove/verify time, `verify.rs:390-430`). StepDown masks whole
        # rows of a multi-value flush: values are row-major (value index =
        # low bits), so StepDown over (log_rows + vpr, size << vpr) covers
        # exactly `size` rows.
        step_down_ids: dict = {}  # (table_idx, vpr) -> oracle id

        def _step_down(t_idx: int, vpr: int):
            key = (t_idx, vpr)
            if key not in step_down_ids:
                from ...protocols.transparent import StepDown
                t = self.tables[t_idx]
                log_rows = table_log_rows[t_idx]
                size = table_sizes[t_idx]
                step_down_ids[key] = oracles.add_transparent(
                    StepDown(log_rows + vpr, size << vpr),
                    f"{t.name}.stepdown{vpr}")
            return step_down_ids[key]

        for t_idx, channel_id, direction, ids, mult, sel_ids, vpr, needs_sd \
                in pending_flushes:
            if needs_sd:
                sel_ids = sel_ids + (_step_down(t_idx, vpr),)
            flushes.append(Flush(channel_id, direction, ids, mult, sel_ids))

        specs = []
        for t in self.tables:
            if t.size_spec == "fixed":
                specs.append(("fixed", t.fixed_log_rows))
            elif t.size_spec == "po2":
                specs.append(("po2",))
            else:
                specs.append(("arbitrary",))
        symbolic = canon.SymbolicSystem(
            tuple(sym_oracles), tuple(sym_csets), tuple(
                nz.oracle_id for nz in non_zero_claims),
            tuple(sym_flushes), tuple(sym_exps), self.n_channels,
            tuple(specs))
        return ConstraintSystem(oracles, constraint_sets, flushes,
                                self.n_channels, non_zero_claims,
                                exponents=exponents, symbolic=symbolic), oracle_map


def _bind_high_vars_zero(expr: ArithExpr, n_vars: int) -> ArithExpr:
    """Replace var(i >= n_vars) with const 0 (structured columns are defined
    against a max size; smaller tables zero the absent index bits)."""
    if expr.op == "var":
        return ArithExpr.const(0) if expr.value >= n_vars else expr
    if expr.op == "const":
        return expr
    args = tuple(_bind_high_vars_zero(a, n_vars) for a in expr.args)
    if expr.op == "add":
        return args[0] + args[1]
    if expr.op == "mul":
        return args[0] * args[1]
    return ArithExpr("pow", args, expr.value)


def _linearize(expr: ArithExpr, n_vars: int):
    """Extract (coeffs per var, constant offset) from a degree<=1 expression
    by evaluation at unit vectors (fields of char 2)."""
    offset = expr.evaluate_scalar(7, [0] * n_vars)
    coeffs = []
    for i in range(n_vars):
        pt = [0] * n_vars
        pt[i] = 1
        coeffs.append(expr.evaluate_scalar(7, pt) ^ offset)
    return coeffs, offset
