"""Fiat-Shamir challenger: `HasherChallenger<H>` over Grøstl-256 (default)
or SHA-256 (`crates/hash/src/sha2.rs` — the reference's alternate
transcript hash).

Byte-exact re-implementation of the reference `HasherChallenger<H>`
state machine (`crates/core/src/fiat_shamir/hasher_challenger.rs:33-195`):

  * starts in sampler mode with buffer = H("") and the running hasher already
    fed that digest;
  * sampler -> observer transition absorbs the sampler's byte index as 8-byte
    little-endian;
  * observer mode absorbs observed bytes into the running hasher;
  * observer -> sampler transition marks the buffer exhausted, so the next
    sample does digest = finalize(state); state = fresh; absorb(digest);
    buffer = digest.
"""

from __future__ import annotations

import hashlib

from ..hash.groestl import Groestl256

DIGEST_SIZE = 32


class _Sha256:
    """digest::Digest-shaped adapter over hashlib (update/copy/finalize),
    the counterpart of the reference's sha2 re-export
    (`crates/hash/src/sha2.rs`)."""

    def __init__(self):
        self._h = hashlib.sha256()

    def update(self, data: bytes) -> "_Sha256":
        self._h.update(data)
        return self

    def copy(self) -> "_Sha256":
        out = _Sha256()
        out._h = self._h.copy()
        return out

    def finalize(self) -> bytes:
        return self._h.digest()


HASHES = {"groestl256": Groestl256, "sha256": _Sha256}


class HasherChallenger:
    def __init__(self, hash_name: str = "groestl256"):
        self._hash_cls = HASHES[hash_name]
        d = self._hash_cls().update(b"").finalize()
        self._hasher = self._hash_cls().update(d)
        self._mode = "sampler"
        self._buffer = d
        self._index = 0

    def observe(self, data: bytes) -> None:
        if self._mode == "sampler":
            self._hasher.update(self._index.to_bytes(8, "little"))
            self._mode = "observer"
        self._hasher.update(data)

    def sample(self, n: int) -> bytes:
        if self._mode == "observer":
            self._mode = "sampler"
            self._index = DIGEST_SIZE
            self._buffer = b""
        out = bytearray()
        while n > 0:
            if self._index == DIGEST_SIZE:
                digest = self._hasher.copy().finalize()
                self._hasher = self._hash_cls().update(digest)
                self._buffer = digest
                self._index = 0
            take = min(DIGEST_SIZE - self._index, n)
            out += self._buffer[self._index:self._index + take]
            self._index += take
            n -= take
        return bytes(out)
