"""Field isomorphisms: canonical tower <-> AES tower <-> POLYVAL.

Counterpart of the reference's AES tower (`crates/field/src/aes_field.rs`),
POLYVAL field (`crates/field/src/polyval.rs`), and the basis-change linear
transformations (`crates/field/src/linear_transformation.rs`).

Rather than hard-coding the reference's transformation constants, the
isomorphisms are DERIVED: a Fan-Paar tower embeds into any binary field of
matching degree by solving the tower's defining quadratics
X_{k+1}^2 + X_k X_{k+1} + 1 = 0 level by level (quadratic solving over F2 is
linear algebra: z = b*s with s^2 + s = c/b^2, solved via the F2-linear map
s -> s^2 + s). The resulting embedding of the canonical basis yields the
128x128 F2 change-of-basis matrices.
"""

from __future__ import annotations

import functools

from . import scalar

# ---------------------------------------------------------------------------
# POLYVAL field: GF(2)[x] / (x^128 + x^127 + x^126 + x^121 + 1)
# ---------------------------------------------------------------------------

POLYVAL_MODULUS = (1 << 128) | (1 << 127) | (1 << 126) | (1 << 121) | 1


def polyval_mul(a: int, b: int) -> int:
    """Carry-less multiply + reduction (host ints)."""
    r = 0
    while b:
        lsb = b & -b
        r ^= a << lsb.bit_length() - 1
        b ^= lsb
    # reduce modulo the polynomial
    for bit in range(254, 127, -1):
        if (r >> bit) & 1:
            r ^= POLYVAL_MODULUS << (bit - 128)
    return r & ((1 << 128) - 1)


def polyval_pow(a: int, e: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = polyval_mul(r, a)
        a = polyval_mul(a, a)
        e >>= 1
    return r


def polyval_inv(a: int) -> int:
    return polyval_pow(a, (1 << 128) - 2)


class _PolyvalOps:
    level = 7
    mul = staticmethod(polyval_mul)

    @staticmethod
    def square(a):
        return polyval_mul(a, a)

    @staticmethod
    def inv(a):
        return polyval_inv(a)


class _AesB8Ops:
    """Rijndael GF(2^8): x^8 + x^4 + x^3 + x + 1 (used at tower level 3)."""

    @staticmethod
    def mul(a, b):
        r = 0
        while b:
            if b & 1:
                r ^= a
            a <<= 1
            if a & 0x100:
                a ^= 0x11B
            b >>= 1
        return r


# ---------------------------------------------------------------------------
# Generic embedding: solve tower quadratics in a target field
# ---------------------------------------------------------------------------

def _solve_artin_schreier(mul, square, n_bits: int, d: int):
    """Solve s^2 + s = d over GF(2^n) given as bitvector ops; returns s or
    None. The map L(s) = s^2 + s is F2-linear; solve via Gaussian elim."""
    cols = []
    for j in range(n_bits):
        e = 1 << j
        cols.append(square(e) ^ e)
    # solve cols * x = d over F2
    rows = []
    for i in range(n_bits):
        r = 0
        for j in range(n_bits):
            if (cols[j] >> i) & 1:
                r |= 1 << j
        rows.append((r, (d >> i) & 1))
    # gaussian elimination
    sol = 0
    pivots = []
    for col in range(n_bits):
        piv = next((k for k in range(len(pivots), n_bits) if (rows[k][0] >> col) & 1), None)
        if piv is None:
            continue
        k0 = len(pivots)
        rows[k0], rows[piv] = rows[piv], rows[k0]
        for k in range(n_bits):
            if k != k0 and (rows[k][0] >> col) & 1:
                rows[k] = (rows[k][0] ^ rows[k0][0], rows[k][1] ^ rows[k0][1])
        pivots.append((col, k0))
    for col, k in pivots:
        if rows[k][1]:
            sol |= 1 << col
    # verify (the system may be inconsistent for half the d's)
    if square(sol) ^ sol == d:
        return sol
    return None


def derive_tower_embedding(mul, n_bits: int = 128, levels: int = 7) -> list[int]:
    """Images of the tower generators X_1..X_levels in the target field.

    Solves X_{k+1}^2 + X_k X_{k+1} + 1 = 0 iteratively (X_0 = 1).
    Returns [image(X_1), ..., image(X_levels)].
    """
    def square(a):
        return mul(a, a)

    def inv(a):
        # Fermat inverse
        r, e = 1, (1 << n_bits) - 2
        base = a
        while e:
            if e & 1:
                r = mul(r, base)
            base = mul(base, base)
            e >>= 1
        return r

    images = []
    xk = 1  # X_0 = 1
    for _ in range(levels):
        # solve z^2 + xk*z + 1 = 0:  z = xk*s with s^2 + s = 1/xk^2
        xk_inv = inv(xk)
        d = mul(xk_inv, xk_inv)
        s = _solve_artin_schreier(mul, square, n_bits, d)
        assert s is not None, "tower quadratic has no root (field mismatch)"
        z = mul(xk, s)
        # take either root (z or z + xk); normalize deterministically: pick
        # the lexicographically smaller integer for reproducibility
        z = min(z, z ^ xk)
        images.append(z)
        xk = z
    return images


@functools.lru_cache(maxsize=None)
def canonical_basis_images(mul_name: str) -> list[int]:
    """Images of the 128 canonical-tower F2 basis elements in the target.

    Canonical basis element #i = prod over set bits k of i of X_{k+1}'s
    sub-basis... precisely: basis elt i corresponds to the product of
    generators: bit j of i set -> multiply by the embedding of the j-th
    "bit generator" beta_j, where beta_j = X_{level} products. In the
    canonical tower the F2-basis element with index i IS the field element
    2^i = prod_{j in bits(i)} (1 << 2^?)...: element 2^i = product of
    X_{k} for the positions where... element 2^i decomposes as the product
    of generators with distinct 2-power supports: 2^i = prod_j X_{j+1}^{bit
    j of i}.
    """
    mul = {"polyval": polyval_mul}[mul_name]
    gens = derive_tower_embedding(mul)
    images = []
    for i in range(128):
        acc = 1
        for j in range(7):
            if (i >> j) & 1:
                acc = mul(acc, gens[j])
        images.append(acc)
    return images


def _check_canonical_decomposition():
    """Sanity: in the canonical tower, 2^i = prod_j X_{j+1}^{i_j}."""
    for i in range(0, 128, 17):
        acc = 1
        for j in range(7):
            if (i >> j) & 1:
                acc = scalar.mul(7, acc, 1 << (1 << j))
        assert acc == 1 << i, (i, acc)
    return True


@functools.lru_cache(maxsize=None)
def canonical_to_polyval_matrix() -> list[int]:
    """Column bitmasks: column i = POLYVAL image of canonical basis 2^i."""
    _check_canonical_decomposition()
    return list(canonical_basis_images("polyval"))


@functools.lru_cache(maxsize=None)
def polyval_to_canonical_matrix() -> list[int]:
    return scalar.invert_matrix(canonical_to_polyval_matrix(), 128)


def canonical_to_polyval(a: int) -> int:
    return scalar.apply_linmap(canonical_to_polyval_matrix(), a)


def polyval_to_canonical(a: int) -> int:
    return scalar.apply_linmap(polyval_to_canonical_matrix(), a)


# ---------------------------------------------------------------------------
# AES tower (Rijndael GF(2^8) at level 3)
# ---------------------------------------------------------------------------

#: Parity anchor: the reference pins its AES->binary isomorphism by mapping
#: the Rijndael polynomial generator x (0x02) to 0x3C in the canonical tower
#: (`aes_field.rs:116`, AES_TO_BINARY_LINEAR_TRANSFORMATION column 1). Any of
#: the 8 roots of the Rijndael polynomial gives a valid isomorphism; we anchor
#: on the same root so derived constants (e.g. the Grostl S-box matrix) are
#: byte-identical to the reference's.
_AES_GENERATOR_IMAGE = 0x3C


@functools.lru_cache(maxsize=None)
def aes_to_canonical_b8_matrix() -> list[int]:
    """8x8 F2 map: AES GF(2^8) -> canonical B8. Column j = image of x^j,
    i.e. the tower power basis of the anchored Rijndael root."""
    g = _AES_GENERATOR_IMAGE
    # verify the anchor is a root of x^8 + x^4 + x^3 + x + 1 in the tower
    pw = [1]
    for _ in range(8):
        pw.append(scalar.mul(3, pw[-1], g))
    assert pw[8] ^ pw[4] ^ pw[3] ^ pw[1] ^ pw[0] == 0, \
        "anchored AES generator image is not a Rijndael root"
    return pw[:8]


@functools.lru_cache(maxsize=None)
def canonical_to_aes_b8_matrix() -> list[int]:
    return scalar.invert_matrix(aes_to_canonical_b8_matrix(), 8)


def aes_b8_mul(a: int, b: int) -> int:
    return _AesB8Ops.mul(a, b)
