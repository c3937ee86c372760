"""High-level M3 trace emulation: validate channel balance BEFORE
arithmetization.

Mirrors `crates/m3/src/emulate.rs:7-60`: a `Channel[T]` tracks the net
multiplicity of every pushed/pulled value; a balanced channel has an empty
multiset. Gadget designers run their event loop against plain-Python channels
first, then arithmetize — the reference's recommended design loop (its keccak
and merkle gadgets both ship `emulate`-level models next to the circuit).
"""

from __future__ import annotations


class Channel:
    """Net-multiplicity multiset over hashable values."""

    def __init__(self):
        self.net_multiplicities: dict = {}

    def push(self, val) -> None:
        m = self.net_multiplicities.get(val, 0) + 1
        if m == 0:
            del self.net_multiplicities[val]
        else:
            self.net_multiplicities[val] = m

    def pull(self, val) -> None:
        m = self.net_multiplicities.get(val, 0) - 1
        if m == 0:
            del self.net_multiplicities[val]
        else:
            self.net_multiplicities[val] = m

    def is_balanced(self) -> bool:
        return not self.net_multiplicities

    def assert_balanced(self) -> None:
        if self.is_balanced():
            return
        pushes = {v: m for v, m in self.net_multiplicities.items() if m > 0}
        pulls = {v: -m for v, m in self.net_multiplicities.items() if m < 0}
        lines = ["Channel is not balanced:"]
        if pushes:
            lines.append("  Unbalanced pushes:")
            lines.extend(f"    {m}: {v!r}" for v, m in sorted(pushes.items(),
                                                              key=lambda kv: repr(kv[0])))
        if pulls:
            lines.append("  Unbalanced pulls:")
            lines.extend(f"    {m}: {v!r}" for v, m in sorted(pulls.items(),
                                                              key=lambda kv: repr(kv[0])))
        raise AssertionError("\n".join(lines))
