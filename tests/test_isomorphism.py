"""Field isomorphism tests: canonical <-> POLYVAL / AES, derived from the
tower quadratics (no hard-coded transformation constants)."""

import random

from binius_tpu.fields import isomorphism as iso
from binius_tpu.fields import scalar

random.seed(91)


def test_polyval_is_field():
    a, b, c = (random.getrandbits(128) | 1 for _ in range(3))
    assert iso.polyval_mul(a, iso.polyval_inv(a)) == 1
    assert iso.polyval_mul(a, iso.polyval_mul(b, c)) == \
        iso.polyval_mul(iso.polyval_mul(a, b), c)
    assert iso.polyval_mul(a, b ^ c) == iso.polyval_mul(a, b) ^ iso.polyval_mul(a, c)


def test_canonical_polyval_isomorphism():
    phi = iso.canonical_to_polyval
    assert phi(0) == 0 and phi(1) == 1
    for _ in range(8):
        a, b = random.getrandbits(128), random.getrandbits(128)
        assert phi(a ^ b) == phi(a) ^ phi(b)
        assert phi(scalar.mul(7, a, b)) == iso.polyval_mul(phi(a), phi(b))
        assert iso.polyval_to_canonical(phi(a)) == a


def test_canonical_aes_b8_isomorphism():
    cols = iso.canonical_to_aes_b8_matrix()
    phi = lambda a: scalar.apply_linmap(cols, a)
    inv_cols = iso.aes_to_canonical_b8_matrix()
    for _ in range(16):
        a, b = random.getrandbits(8), random.getrandbits(8)
        assert phi(scalar.mul(3, a, b)) == iso.aes_b8_mul(phi(a), phi(b))
        assert scalar.apply_linmap(inv_cols, phi(a)) == a


def test_embedding_solves_tower_quadratics():
    gens = iso.derive_tower_embedding(iso.polyval_mul)
    xk = 1
    for g in gens:
        # g^2 + xk*g + 1 == 0 in POLYVAL
        lhs = iso.polyval_mul(g, g) ^ iso.polyval_mul(xk, g) ^ 1
        assert lhs == 0
        xk = g
