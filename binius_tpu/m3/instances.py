"""Small self-contained M3 instances shared by tests and the driver entry.

These are miniature versions of the reference's example circuits
(`examples/u32_add.rs`, keccak-class lookups+exp structure) used wherever a
real constraint system + witness is needed without a full example workload:
the multi-chip dryrun (`__graft_entry__.dryrun_multichip`) and the sharding
byte-equality tests (`tests/test_sharding.py`).
"""

from __future__ import annotations

import random


def u32_add_instance(log_rows: int = 4, seed: int = 5):
    """One u32_add table: the smallest full-pipeline instance (commit,
    zerocheck, evalcheck, ring switch, PIOP/FRI all engage)."""
    from .builder.table import M3ConstraintSystem
    from .builder.witness import WitnessIndex
    from .gadgets import arith

    prng = random.Random(seed)
    n_rows = 1 << log_rows
    m3 = M3ConstraintSystem()
    t = m3.add_table("u32add")
    xin = t.add_committed("xin", 0, arith.LOG_U32)
    yin = t.add_committed("yin", 0, arith.LOG_U32)
    adder = arith.U32Add.build(t, "add", xin, yin)
    core, omap = m3.compile([log_rows])
    wi = WitnessIndex(m3, [log_rows])
    tw = wi.table(0)
    xs = [prng.getrandbits(32) for _ in range(n_rows)]
    ys = [prng.getrandbits(32) for _ in range(n_rows)]
    tw.set_packed_ints(xin, xs)
    tw.set_packed_ints(yin, ys)
    adder.populate(tw, xs, ys)
    return core, wi.to_core_witness(core, omap)


def grouped_lookup_exp_instance(seed: int = 17):
    """A keccak-CLASS structure in miniature: indexed lookups (channels +
    LookupProducer), GKR exponentiation (MulUU32), and TWO same-structure
    u32_add tables whose stage-2 zerocheck claims prove GROUPED."""
    from .builder.table import M3ConstraintSystem
    from .builder.witness import WitnessIndex
    from .gadgets import arith
    from .gadgets.indexed_lookup import IncrLookup, IncrLooker
    from .gadgets.mul import MulUU32

    rng = random.Random(seed)
    m3 = M3ConstraintSystem()
    lookup_chan = m3.add_channel()
    perm_chan = m3.add_channel()
    t_lut = m3.add_table("incr_lookup")
    lut = IncrLookup.build(t_lut, lookup_chan, perm_chan, 4)
    t_look = m3.add_table("lookers")
    looker = IncrLooker.build(t_look, "incr", lookup_chan)
    adders = []
    for name in ("add_a", "add_b"):
        t = m3.add_table(name)
        xin = t.add_committed("xin", 0, arith.LOG_U32)
        yin = t.add_committed("yin", 0, arith.LOG_U32)
        adders.append((xin, yin, arith.U32Add.build(t, "add", xin, yin)))
    t_mul = m3.add_table("mul_exp")
    gm = MulUU32.build(t_mul, "mul")

    log_sizes = [9, 3, 5, 5, 2]
    core, omap = m3.compile(log_sizes)
    wi = WitnessIndex(m3, log_sizes)
    events = [(rng.getrandbits(8), rng.getrandbits(1)) for _ in range(1 << 3)]
    looker.populate(wi.table(1), events)
    counts = [0] * 512
    for i, c in events:
        counts[(c << 8) | i] += 1
    lut.populate(wi.table(0), sorted(enumerate(counts), key=lambda ic: -ic[1]))
    for ti, (xin, yin, adder) in enumerate(adders):
        tw = wi.table(2 + ti)
        xs = [rng.getrandbits(32) for _ in range(1 << 5)]
        ys = [rng.getrandbits(32) for _ in range(1 << 5)]
        tw.set_packed_ints(xin, xs)
        tw.set_packed_ints(yin, ys)
        adder.populate(tw, xs, ys)
    twm = wi.table(4)
    gm.populate(twm, [rng.getrandbits(32) for _ in range(4)],
                [rng.getrandbits(32) for _ in range(4)])
    return core, wi.to_core_witness(core, omap)
