"""On-device k-shingle hashing straight from raw text bytes.

The reference's canonical text front end shingles on the host and hashes
each shingle with SHA1 (``/root/reference/docs/minhash.rst`` "shingling";
``datasketch/minhash.py:189-224``). This library's native path
(:func:`datasketch_tpu.native.corpus.hash_shingles_padded`) already does
that in C — but through a remote-attached TPU the end-to-end rate is
bound by host->device BANDWIDTH (~50MB/s; see BASELINE.md round-3
recapture), and host-hashed shingles ship 4 bytes per overlapping
k-shingle, i.e. ~4 bytes per character. This module instead uploads the
raw text (1 byte per character) and computes the shingle hashes on the
VPU: a k-step polynomial roll over the byte stream finalized with the
murmur3 fmix32 scramble — ~4x fewer bytes over the link for the same
signature quality.

Like ``hashfunc='device'`` for token ids, the resulting signatures are
NOT value-compatible with the reference's SHA1 shingles (the estimator
statistics are identical; tests pin the 1/sqrt(num_perm) error bound and
bit-parity with the host twin :func:`window_hashes_np`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from datasketch_tpu.ops import minhash_ops
from datasketch_tpu.ops.hashing import mix32, mix32_np

__all__ = [
    "window_hashes_np",
    "shingle_signatures_ragged",
]

# FNV-32 prime: odd multiplier with good low/high-bit diffusion for the
# polynomial accumulator; fmix32 provides the final avalanche.
_POLY_C = 0x01000193


def _window_accumulate_jnp(chars, k: int, width: int):
    """uint32[B, width] polynomial window hashes from uint32[B, >=width+k-1]
    character codes: h_i = fmix32(sum_j c^{k-1-j} * chars[i+j])."""
    h = jnp.zeros(chars[:, :width].shape, dtype=jnp.uint32)
    c = jnp.uint32(_POLY_C)
    for j in range(k):  # k is small (default 9); static unroll, fuses on VPU
        h = h * c + chars[:, j : j + width]
    return mix32(h)


def window_hashes_np(text: bytes, k: int) -> np.ndarray:
    """Host twin of the device shingle hash, bit-identical.

    Returns uint32[max(0, len(text)-k+1)] — the hash of every overlapping
    k-byte window of ``text``.
    """
    n = max(0, len(text) - k + 1)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    chars = np.frombuffer(text, dtype=np.uint8).astype(np.uint32)
    h = np.zeros(n, dtype=np.uint32)
    c = np.uint32(_POLY_C)
    for j in range(k):
        h = np.multiply(h, c, dtype=np.uint32) + chars[j : j + n]
    return mix32_np(h)


@functools.partial(jax.jit, static_argnames=("k", "width"))
def _window_hashes_device(chars_flat, starts, k: int, width: int):
    """Gather ragged byte rows and hash every k-window on device.

    Over-gathers ``k`` extra bytes per row (shared ragged-expansion
    helper ``minhash_ops._gather_rows``) so the last window is complete;
    clamped out-of-range reads produce garbage only in rows' masked
    tails."""
    chars = minhash_ops._gather_rows(chars_flat, starts, width + k)
    return _window_accumulate_jnp(chars.astype(jnp.uint32), k, width)


def shingle_signatures_ragged(flat_bytes, text_lengths, k: int, seed: int,
                              num_perm: int, permutations=None):
    """MinHash signatures of every text's k-shingle set, from raw bytes.

    Args:
        flat_bytes: uint8[total] all texts' bytes back to back (the only
            large upload — 1 byte per character).
        text_lengths: int32[B] characters per text.
        k: shingle width in bytes.
    Returns:
        uint32[B, num_perm]; texts shorter than ``k`` yield the
        empty-sketch row (all MAX_HASH), matching ``MinHash()`` on an
        empty set.
    """
    text_lengths = np.asarray(text_lengths, dtype=np.int32)
    n_real = text_lengths.shape[0]
    sh_lengths = np.maximum(text_lengths - (k - 1), 0).astype(np.int32)
    b_pad = 128
    while b_pad < n_real:
        b_pad *= 2
    if b_pad != n_real:
        text_lengths = np.pad(text_lengths, (0, b_pad - n_real))
        sh_lengths = np.pad(sh_lengths, (0, b_pad - n_real))
    total = int(text_lengths.astype(np.int64).sum())
    if total >= 2**31:
        # starts are int32 on device; callers (bulk_from_text) chunk well
        # below this — fail loudly rather than overflow silently.
        raise ValueError(
            "batch holds %d text bytes; int32 starts overflow at 2**31 — "
            "chunk the batch (bulk_from_text does this automatically)" % total
        )
    starts = np.zeros(text_lengths.shape[0], dtype=np.int32)
    if text_lengths.size:
        np.cumsum(text_lengths[:-1], out=starts[1:])
    width = 128
    max_sh = int(sh_lengths.max()) if sh_lengths.size else 1
    while width < max_sh:
        width *= 2
    flat_bytes = np.asarray(flat_bytes, dtype=np.uint8)
    # Bucket the flat axis to powers of two: the jit below would otherwise
    # compile one XLA program per distinct total byte count (every program
    # compiles through the remote tunnel). Clamped out-of-range gathers are
    # masked by sh_lengths, so the zero padding is never observed.
    flat_pad = 1024
    while flat_pad < max(total, 1):
        flat_pad *= 2
    if flat_bytes.shape[0] != flat_pad:
        flat_bytes = np.pad(flat_bytes, (0, flat_pad - flat_bytes.shape[0]))
    wh = _window_hashes_device(
        jnp.asarray(flat_bytes), jnp.asarray(starts), k, width
    )
    return minhash_ops.compute_signatures(
        wh, sh_lengths, seed, num_perm, permutations=permutations
    )[:n_real]
