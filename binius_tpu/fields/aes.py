"""AES tower fields (AESTowerField8b..128b).

Counterpart of `crates/field/src/aes_field.rs`: the same Fan-Paar tower
shape, but with Rijndael GF(2^8) (poly 0x11B) as the level-3 base. Above
level 3 the extension structure is chosen so that the canonical<->AES
conversion is the B8 isomorphism applied COORDINATE-WISE (one 8x8 F2 linear
map per byte) — exactly the reference's per-byte
AES_TO_BINARY_LINEAR_TRANSFORMATION design (`aes_field.rs:107-170`), which is
what makes byte-sliced arithmetic possible. Consequently every AES-tower op
here is the conjugate of the canonical op by the per-byte map; the maps
themselves are DERIVED in `isomorphism.py` (anchored at the reference's
generator image, `aes_field.rs:116`), not copied tables.

Parity anchors (multiplicative generators, `aes_field.rs:46-50`):
  8b=0xD0, 16b=0x4745, 32b=0xBD478FAB, 64b=0x0DE1555D2BD78EB4,
  128b=0x6DB54066349EDB96C33A87244A742678.
"""

from __future__ import annotations

import functools

import numpy as np

from . import scalar, tower
from .isomorphism import aes_to_canonical_b8_matrix, canonical_to_aes_b8_matrix

GENERATORS = {
    3: 0xD0,
    4: 0x4745,
    5: 0xBD478FAB,
    6: 0x0DE1555D2BD78EB4,
    7: 0x6DB54066349EDB96C33A87244A742678,
}


def _map_bytes(cols: list[int], a: int, n_bytes: int) -> int:
    out = 0
    for i in range(n_bytes):
        out |= scalar.apply_linmap(cols, (a >> (8 * i)) & 0xFF) << (8 * i)
    return out


def aes_to_canonical(level: int, a: int) -> int:
    """Per-byte AES -> canonical tower map (levels 3..7)."""
    assert 3 <= level <= 7
    return _map_bytes(aes_to_canonical_b8_matrix(), a, 1 << (level - 3))


def canonical_to_aes(level: int, a: int) -> int:
    assert 3 <= level <= 7
    return _map_bytes(canonical_to_aes_b8_matrix(), a, 1 << (level - 3))


def mul(level: int, a: int, b: int) -> int:
    """AES-tower multiplication (conjugation by the per-byte isomorphism)."""
    return canonical_to_aes(level, scalar.mul(
        level, aes_to_canonical(level, a), aes_to_canonical(level, b)))


def square(level: int, a: int) -> int:
    return canonical_to_aes(level, scalar.square(level, aes_to_canonical(level, a)))


def invert(level: int, a: int) -> int:
    return canonical_to_aes(level, scalar.invert(level, aes_to_canonical(level, a)))


def pow(level: int, a: int, e: int) -> int:  # noqa: A001
    return canonical_to_aes(level, scalar.pow(level, aes_to_canonical(level, a), e))


# ---------------------------------------------------------------------------
# Device conversion: the per-byte 8x8 F2 maps vectorize as bit-linear ops on
# the canonical uint32-lane layout (4 bytes per lane).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _byte_map_u32_cols(to_canonical: bool) -> np.ndarray:
    """32 uint32 columns: the B8 map applied to each byte of a uint32 lane."""
    cols8 = aes_to_canonical_b8_matrix() if to_canonical else canonical_to_aes_b8_matrix()
    out = np.zeros(32, dtype=np.uint32)
    for j in range(32):
        byte, bit = divmod(j, 8)
        out[j] = np.uint32(cols8[bit] << (8 * byte))
    return out


def convert_device(level: int, data, to_canonical: bool):
    """Apply the per-byte map to a device array in canonical uint32 layout."""
    import jax.numpy as jnp
    cols = jnp.asarray(_byte_map_u32_cols(to_canonical))
    shifts = np.arange(32, dtype=np.uint32)
    bits = (data[..., None] >> shifts) & np.uint32(1)
    return tower.xor_reduce(jnp.where(bits.astype(bool), cols, np.uint32(0)), axis=-1)
