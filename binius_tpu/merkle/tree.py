"""Binary Merkle tree vector commitment over Grøstl-256.

TPU-native counterpart of `crates/core/src/merkle_tree/` (BinaryMerkleTreeScheme
+ prover): leaves are byte blobs (canonically serialized field elements),
hashed with Grøstl-256; internal nodes use the output-transform 2-to-1
compression. Leaf hashing and level reduction are batch-vectorized (numpy on
host; the same code path can run as jnp for device builds).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..hash.groestl import bytes_to_state, compress, compress_pairs, groestl256_pad, output_transform, IV_256


def hash_leaves(blobs: np.ndarray) -> np.ndarray:
    """Grøstl-256 digest of each row: (N, L) uint8 -> (N, 32) uint8.

    Large batches route through the jitted bitsliced device kernel (the
    analog of the reference's `Groestl256Parallel` SIMD hasher — and on the
    TPU backend the only formulation whose compile doesn't blow up: the
    gather-based one is quarantined in `_hash_leaves_kernel`); small ones
    stay on host."""
    n, length = blobs.shape
    if n * length >= (1 << 16):
        if n % 32 == 0 and length % 4 == 0:
            from ..hash.groestl_bitslice import hash_leaves_device_bs
            return hash_leaves_device_bs(blobs)
        return _hash_leaves_device(blobs)
    return _hash_leaves_np(blobs)


def _hash_leaves_np(blobs: np.ndarray) -> np.ndarray:
    from ..hash.groestl import digest_rows_native
    out = digest_rows_native(blobs)
    if out is not None:
        return out
    n, length = blobs.shape
    if n <= 8:
        # per-query verifier path: the T-table integer implementation beats
        # numpy's per-op overhead by ~100x at batch size 1
        from ..hash.groestl import groestl256
        out = np.empty((n, 32), dtype=np.uint8)
        for i in range(n):
            out[i] = np.frombuffer(groestl256(blobs[i].tobytes()), dtype=np.uint8)
        return out
    pad = groestl256_pad(length)
    msg = np.concatenate([blobs, np.broadcast_to(pad, (n, len(pad)))], axis=1)
    h = np.broadcast_to(bytes_to_state(IV_256), (n, 8, 8)).copy()
    for i in range(msg.shape[1] // 64):
        m = bytes_to_state(msg[:, i * 64:(i + 1) * 64])
        h = compress(h, m)
    return output_transform(h)


import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1,))
def _hash_leaves_kernel(msg, n_blocks: int):
    from ..hash.groestl import compress as _compress
    from ..hash.groestl import output_transform as _ot
    st = bytes_to_state(msg.reshape(msg.shape[0], n_blocks, 64))  # (n, nb, 8, 8)
    iv = jnp.asarray(bytes_to_state(IV_256))
    h = jnp.broadcast_to(iv, (msg.shape[0], 8, 8))
    for i in range(n_blocks):
        h = _compress(h, st[:, i], xp=jnp)
    return _ot(h, xp=jnp)


def _hash_leaves_device(blobs: np.ndarray) -> np.ndarray:
    n, length = blobs.shape
    pad = groestl256_pad(length)
    msg = np.concatenate([blobs, np.broadcast_to(pad, (n, len(pad)))], axis=1)
    n_blocks = msg.shape[1] // 64
    msg = msg.reshape(n, n_blocks * 64)
    out = _hash_leaves_kernel(jnp.asarray(msg), n_blocks)
    return np.asarray(jax.device_get(out))


@dataclasses.dataclass(frozen=True)
class HashScheme:
    """A Merkle digest family: batched leaf hashing + 2-to-1 compression
    (the reference's `MerkleTreeScheme` hash parameters: Grostl-256 or
    Vision Mark-32, `merkle_tree/scheme.rs`)."""

    name: str
    hash_leaves: callable      # (N, L) uint8 -> (N, 32) uint8
    compress_pairs: callable   # (N, 64) uint8 -> (N, 32) uint8


GROESTL_SCHEME = HashScheme("groestl256", hash_leaves, compress_pairs)


@functools.lru_cache(maxsize=None)
def vision_scheme() -> HashScheme:
    """Vision Mark-32 instantiation (`hash/vision.py`)."""
    from ..hash import vision

    return HashScheme("vision32", vision.digest_many,
                      vision.Vision32Compression().compress_batch)


# device levels stop once a layer is this small; the top of the tree is
# latency-bound and runs on the host T-table path
_MIN_DEVICE_ROWS = 256


def commit_codeword_device(codeword, log_coset: int) -> "DeviceMerkleTree":
    """Build the Merkle tree for a device codeword ((N, limbs) uint32):
    leaf hashing and the wide levels run on device through the bitsliced
    Grøstl kernels (`hash/groestl_bitslice.py` — gather-free, so the remote
    TPU compile service handles it; the earlier table-gather formulation
    compiled a 156 MB executable in ~38 min). The tiny top levels finish on
    the host (the parallel tree builder of
    `merkle_tree/binary_merkle_tree.rs:211`).

    The wide layers stay DEVICE-RESIDENT: only the `_MIN_DEVICE_ROWS`-row
    layer crosses to the host (8 KB) to finish the top. Query-opening
    branches are later served by batched device gathers
    (`DeviceMerkleTree.branches_many`) — at benchmark scale (2^20+ leaves)
    fetching the full digest layers would move 10-100x the proof size over
    the tunnel."""
    from ..hash.groestl_bitslice import leaf_hash_kernel, pairs_kernel

    n_leaves = int(codeword.shape[0]) >> log_coset
    from ..hash import groestl_pallas
    blob_len = int(codeword.shape[0] * np.prod(codeword.shape[1:]) * 4
                   // max(n_leaves, 1))
    n_dev = max(0, (n_leaves.bit_length() - 1)
                - (_MIN_DEVICE_ROWS.bit_length() - 1))
    cw = codeword.reshape(codeword.shape[0], -1)
    if groestl_pallas.wants_dispatch(n_leaves):
        # fused-VMEM network, whole chain in ONE dispatch: every permutation
        # gate stays on-chip and no per-level relay round-trips
        outs = list(groestl_pallas.tree_levels(cw, log_coset, blob_len, n_dev))
    else:
        outs = [leaf_hash_kernel(cw, log_coset, blob_len)]
        for _ in range(n_dev):
            outs.append(pairs_kernel(outs[-1]))
    top = MerkleTree.build(_digests_to_np(outs[-1]))
    return DeviceMerkleTree(outs[:-1], top)


def _digests_to_np(dig) -> np.ndarray:
    """(N, 8) uint32 device digests -> (N, 32) uint8 host rows."""
    return (np.ascontiguousarray(np.asarray(jax.device_get(dig)).astype("<u4"))
            .view(np.uint8).reshape(-1, 32))


@functools.partial(jax.jit, static_argnums=())
def _gather_rows_jit(layers: tuple, idxs: tuple):
    """Concatenated row gathers: one dispatch per (tree-shape, query-count)."""
    return jnp.concatenate(
        [jnp.take(l, i, axis=0) for l, i in zip(layers, idxs)], axis=0)


class DeviceMerkleTree:
    """Merkle tree whose wide levels live on device ((N, 8) uint32 digests)
    and whose top (<= `_MIN_DEVICE_ROWS` rows) is a host `MerkleTree`.

    Exposes the same access surface the FRI prover needs (`root`, `depth`,
    `layer_np`, `branches_many`) plus a `.layers` materialization for
    tests/debug (fetches everything — do not use at scale)."""

    def __init__(self, dev_layers: list, top: MerkleTree):
        self.dev_layers = dev_layers      # leaf-up, device (N, 8) uint32
        self.top = top
        self.scheme = top.scheme
        self._layer_cache: dict[int, np.ndarray] = {}

    @property
    def root(self) -> bytes:
        return self.top.root

    @property
    def depth(self) -> int:
        return len(self.dev_layers) + self.top.depth

    def layer_np(self, k: int) -> np.ndarray:
        """Layer k (leaf = 0) as (N, 32) uint8 host rows."""
        n_dev = len(self.dev_layers)
        if k >= n_dev:
            return self.top.layers[k - n_dev]
        if k not in self._layer_cache:
            self._layer_cache[k] = _digests_to_np(self.dev_layers[k])
        return self._layer_cache[k]

    @property
    def layers(self) -> list:
        return ([self.layer_np(k) for k in range(len(self.dev_layers))]
                + self.top.layers)

    def branches_many(self, indices: list[int], to_layer: int) -> list[list[bytes]]:
        """Sibling paths for many leaves in ONE device round-trip: per device
        layer the sibling rows of every query are gathered on device, all
        layers concatenate, and a single transfer brings them home."""
        n_dev = min(len(self.dev_layers), to_layer)
        out = [[] for _ in indices]
        if n_dev:
            idxs = tuple(
                jnp.asarray(np.asarray([(i >> k) ^ 1 for i in indices],
                                       dtype=np.int32))
                for k in range(n_dev))
            rows = _digests_to_np(_gather_rows_jit(tuple(self.dev_layers[:n_dev]),
                                                   idxs))
            for k in range(n_dev):
                for q in range(len(indices)):
                    out[q].append(rows[k * len(indices) + q].tobytes())
        for k in range(n_dev, to_layer):
            layer = self.layer_np(k)
            for q, i in enumerate(indices):
                out[q].append(layer[(i >> k) ^ 1].tobytes())
        return out

    def branch(self, index: int, to_layer: int = None) -> list[bytes]:
        d = self.depth if to_layer is None else to_layer
        return self.branches_many([index], d)[0]


@dataclasses.dataclass
class MerkleTree:
    """All layers, layer[0] = leaf digests (N, 32) ... layer[d] = root (1, 32)."""

    layers: list
    scheme: HashScheme = GROESTL_SCHEME

    @staticmethod
    def build(leaf_digests: np.ndarray, scheme: HashScheme = GROESTL_SCHEME) -> "MerkleTree":
        assert leaf_digests.ndim == 2 and leaf_digests.shape[1] == 32
        n = leaf_digests.shape[0]
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        layers = [leaf_digests]
        cur = leaf_digests
        while cur.shape[0] > 1:
            cur = np.asarray(scheme.compress_pairs(cur.reshape(-1, 64)))
            layers.append(cur)
        return MerkleTree(layers, scheme)

    @property
    def root(self) -> bytes:
        return self.layers[-1][0].tobytes()

    @property
    def depth(self) -> int:
        return len(self.layers) - 1

    def branch(self, index: int, to_layer: int = None) -> list[bytes]:
        """Sibling digests from the leaf up (exclusive of `to_layer`, default root)."""
        d = self.depth if to_layer is None else to_layer
        out = []
        for k in range(d):
            out.append(self.layers[k][(index >> k) ^ 1].tobytes())
        return out

    def layer_np(self, k: int) -> np.ndarray:
        return self.layers[k]

    def branches_many(self, indices: list[int], to_layer: int) -> list[list[bytes]]:
        return [self.branch(i, to_layer) for i in indices]


def verify_branch(root: bytes, index: int, leaf_digest: bytes, branch: list[bytes],
                  scheme: HashScheme = GROESTL_SCHEME) -> bool:
    cur = np.frombuffer(leaf_digest, dtype=np.uint8)
    for k, sib in enumerate(branch):
        s = np.frombuffer(sib, dtype=np.uint8)
        pair = np.concatenate([cur, s] if ((index >> k) & 1) == 0 else [s, cur])
        cur = np.asarray(scheme.compress_pairs(pair[None, :]))[0]
    return cur.tobytes() == root


def verify_branch_to_layer(layer: np.ndarray, index: int, leaf_digest: bytes,
                           branch: list[bytes],
                           scheme: HashScheme = GROESTL_SCHEME) -> bool:
    """Verify against a cached internal layer (the reference's optimal
    verification layer, `merkle_tree/scheme.rs:48-50`)."""
    cur = np.frombuffer(leaf_digest, dtype=np.uint8)
    for k, sib in enumerate(branch):
        s = np.frombuffer(sib, dtype=np.uint8)
        pair = np.concatenate([cur, s] if ((index >> k) & 1) == 0 else [s, cur])
        cur = np.asarray(scheme.compress_pairs(pair[None, :]))[0]
    return cur.tobytes() == layer[index >> len(branch)].tobytes()
