"""Witness index utilities: materialize virtual oracle columns on device.

Counterpart of `crates/core/src/witness.rs` (MultilinearExtensionIndex) plus
the flush-oracle witness construction of `constraint_system/prove.rs:329-338`.
A witness is a dict: oracle id -> (tower_level, device data).
"""

from __future__ import annotations

from ..fields import tower
from ..protocols import shift_ind
from . import oracle as om

LEVEL = 7


def _int_level(v: int) -> int:
    """Smallest tower level whose subfield contains the canonical int `v`
    (identity embedding: B_2^l is exactly [0, 2^(2^l)))."""
    for lvl in range(8):
        if v < (1 << (1 << lvl)):
            return lvl
    raise ValueError(f"not a B128 element: {v}")


def materialize(oracles: om.OracleSet, witness: dict, oid: int):
    """Compute (level, data) for a virtual oracle from its inner witnesses,
    caching into `witness`. Committed oracles must already be present.

    B1 columns may be stored bit-packed (`tower.P1`); this returns the
    unpacked element-per-word view and keeps the cache packed."""
    if oid in witness:
        return tower.resolve_p1(*witness[oid])
    o = oracles[oid]
    if o.variant == om.TRANSPARENT:
        out = o.transparent.mle()
    elif o.variant == om.REPEATING:
        ilvl, idata = materialize(oracles, witness, o.inner[0])
        reps = 1 << o.log_degree
        import jax.numpy as jnp
        out = (ilvl, jnp.concatenate([idata] * reps, axis=0))
    elif o.variant == om.LINEAR_COMBINATION:
        inner = [materialize(oracles, witness, iid) for iid in o.inner]
        lc_level = max([_int_level(o.lc_offset),
                        *(_int_level(c) for c in o.lc_coeffs),
                        *(ilvl for ilvl, _ in inner)])
        if lc_level <= 5:
            # combination closes in a subfield (e.g. keccak theta: XORs of
            # bits): materialize there — 1/32 the bytes of a B128 column and
            # the zerocheck kernels stay on the small-field path
            acc = tower.full(lc_level, (1 << o.n_vars,), o.lc_offset)
            for (ilvl, idata), coeff in zip(inner, o.lc_coeffs):
                x = tower.embed(ilvl, lc_level, idata)
                if coeff != 1:
                    x = tower.mul(lc_level, x, tower.full(lc_level, x.shape, coeff))
                acc = acc ^ x
            out = (lc_level, acc)
        else:
            acc = tower.full(LEVEL, (1 << o.n_vars,), o.lc_offset)
            for (ilvl, idata), coeff in zip(inner, o.lc_coeffs):
                c = tower.from_ints(LEVEL, [coeff])[0]
                # subfield data x B128 coefficient: coordinate-wise scale
                acc = tower.add(LEVEL, acc, tower.scale_subfield(ilvl, LEVEL, idata, c))
            out = (LEVEL, acc)
    elif o.variant == om.SHIFTED:
        ilvl, idata = materialize(oracles, witness, o.inner[0])
        out = (ilvl, shift_ind.apply_shift_device(
            ilvl, o.shift_variant, o.shift_block_bits, o.shift_offset, idata))
    elif o.variant == om.COMPOSITE:
        inner = [materialize(oracles, witness, iid) for iid in o.inner]
        expr = getattr(o.composite, "expr", o.composite)
        comp_level = max([expr.binary_tower_level(),
                          *(ilvl for ilvl, _ in inner)])
        if comp_level <= 5:
            # composition closes in a subfield (e.g. keccak chi: AND/XOR of
            # bits): evaluate and store there
            inner_data = [tower.embed(ilvl, comp_level, idata)
                          for ilvl, idata in inner]
            out = (comp_level, o.composite.evaluate(comp_level, inner_data))
        else:
            inner_data = [tower.embed(ilvl, LEVEL, idata) if ilvl < LEVEL
                          else idata for ilvl, idata in inner]
            out = (LEVEL, o.composite.evaluate(LEVEL, inner_data))
    elif o.variant == om.PACKED:
        ilvl, idata = materialize(oracles, witness, o.inner[0])
        inner = oracles[o.inner[0]]
        coeffs = idata.reshape(tower.elem_shape(
            ilvl, (1 << o.n_vars, 1 << o.log_degree)))
        out = (o.tower_level, tower.join_from_subfield(o.tower_level, ilvl, coeffs))
    elif o.variant == om.PROJECTED:
        from ..math import mle
        ilvl, idata = materialize(oracles, witness, o.inner[0])
        nb = len(o.proj_values)
        lo, hi = o.start_index, oracles[o.inner[0]].n_vars - o.start_index - nb
        eq = mle.eq_ind_partial_eval(LEVEL, tower.from_ints(LEVEL, list(o.proj_values)))
        d = idata.reshape(tower.elem_shape(ilvl, (1 << hi, 1 << nb, 1 << lo)))
        prod = tower.scale_subfield(ilvl, LEVEL, d, eq[None, :, None, :])
        folded = tower.xor_reduce(prod, axis=1)
        out = (LEVEL, folded.reshape((1 << o.n_vars, tower.n_limbs(LEVEL))))
    elif o.variant == om.ZERO_PADDED:
        ilvl, idata = materialize(oracles, witness, o.inner[0])
        import jax.numpy as jnp
        pad, lo = o.log_degree, o.start_index
        hi = oracles[o.inner[0]].n_vars - lo
        d = idata.reshape(tower.elem_shape(ilvl, (1 << hi, 1, 1 << lo)))
        shape = list(d.shape)
        shape[1] = 1 << pad
        z = jnp.zeros(shape, dtype=d.dtype)
        z = z.at[:, o.nonzero_index].set(d[:, 0])
        out = (ilvl, z.reshape(tower.elem_shape(ilvl, (1 << o.n_vars,))))
    else:
        raise KeyError(f"cannot materialize oracle {oid} ({o.variant})")
    witness[oid] = tower.maybe_pack_b1(*out)
    return out
