"""High-throughput corpus hashing via the ``_dshash`` C extension.

Zero Python-level marshalling: token lists are walked in C (CPython API),
hashed with SHA-NI when available, and written straight into the padded
``uint32[B, T]`` matrix the device signature kernel consumes
(:func:`datasketch_tpu.ops.minhash_ops.update_signatures`). Falls back to
the ctypes packed-buffer path if the extension can't build.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "dshash_module.cpp")
_HDR = os.path.join(_HERE, "src", "dshash_core.h")
_LIB_DIR = os.environ.get("DATASKETCH_TPU_CACHE", _HERE)
_EXT_SUFFIX = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
_MOD_PATH = os.path.join(_LIB_DIR, "_dshash" + _EXT_SUFFIX)

ALGO_SHA1_32 = 0
ALGO_XXH32 = 1
ALGO_SHA1_64 = 2

_lock = threading.Lock()
_mod = None
_mod_failed = False


def _build() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    tmp = _MOD_PATH + ".tmp.%d" % os.getpid()
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-pthread",
        "-I",
        include,
        _SRC,
        "-o",
        tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _MOD_PATH)
    return _MOD_PATH


def _load():
    """Build (if stale) and import the extension; None if unavailable."""
    global _mod, _mod_failed
    if _mod is not None or _mod_failed:
        return _mod
    with _lock:
        if _mod is not None or _mod_failed:
            return _mod
        try:
            src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_HDR))
            if (
                not os.path.exists(_MOD_PATH)
                or os.path.getmtime(_MOD_PATH) < src_mtime
            ):
                _build()
            spec = importlib.util.spec_from_file_location("_dshash", _MOD_PATH)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _mod = mod
        except Exception:
            _mod_failed = True
    return _mod


def available() -> bool:
    return _load() is not None


def _doc_lengths(docs) -> np.ndarray:
    n = len(docs)
    return np.fromiter(map(len, docs), np.int32, count=n) if n else np.zeros(
        0, np.int32
    )


MODE_AUTO = 0  # inline on single-core hosts, buffered-parallel otherwise
MODE_INLINE = 1  # hash under the GIL during collection (lowest latency)
MODE_BUFFERED = 2  # GIL-released deferred pass (overlaps Python threads)


def hash_corpus_padded(docs, algo: int = ALGO_SHA1_32, seed: int = 0,
                       pad_multiple: int = 128, mode: int = MODE_AUTO):
    """Hash list-of-token-lists into a padded matrix in one native call.

    Returns (hashes uint32[B, T], lengths int32[B]); padding slots are
    zero-initialized (callers mask by lengths). T is the max doc length
    rounded up to ``pad_multiple`` (bucketing limits jit recompiles).
    """
    lengths = _doc_lengths(docs)
    b = len(docs)
    max_len = int(lengths.max()) if b and lengths.size else 1
    t = max(pad_multiple, -(-max_len // pad_multiple) * pad_multiple)
    dtype = np.uint64 if algo == ALGO_SHA1_64 else np.uint32
    out = np.zeros((b, t), dtype=dtype)
    mod = _load()
    if mod is not None:
        mod.hash_padded(docs, out, t, algo, seed, mode)
        return out, lengths
    # ctypes fallback: per-doc packed-buffer calls.
    from datasketch_tpu.native import hashlib_native as hn

    fns = {
        ALGO_SHA1_32: hn.batch_sha1_hash32,
        ALGO_SHA1_64: hn.batch_sha1_hash64,
        ALGO_XXH32: lambda tk: hn.batch_xxhash32(tk, seed),
    }
    fn = fns[algo]
    for i, doc in enumerate(docs):
        if len(doc):
            out[i, : len(doc)] = fn(list(doc))
    return out, lengths


def hash_corpus_ragged(docs, algo: int = ALGO_SHA1_32, seed: int = 0,
                       mode: int = MODE_AUTO):
    """Hash list-of-token-lists into one CONTIGUOUS flat buffer.

    Returns (flat uint32[total], lengths int32[B]): doc d's hashes occupy
    ``flat[lengths[:d].sum() : ...+lengths[d]]`` with no padding slots —
    the layout :func:`datasketch_tpu.ops.minhash_ops.
    compute_signatures_ragged` consumes. Vs :func:`hash_corpus_padded`
    this ships only real bytes over the (bandwidth-bound) host->device
    link; the padding to the kernel's tile shape happens device-side.
    """
    lengths = _doc_lengths(docs)
    starts = np.zeros(len(docs), dtype=np.int64)
    if len(docs) > 1:
        np.cumsum(lengths[:-1], dtype=np.int64, out=starts[1:])
    total = int(lengths.sum())
    dtype = np.uint64 if algo == ALGO_SHA1_64 else np.uint32
    out = np.empty(total, dtype=dtype)
    mod = _load()
    if mod is not None:
        mod.hash_ragged(docs, out, starts, algo, seed, mode)
        return out, lengths
    # fallback: flat token list through hash_tokens
    import itertools

    flat_tokens = list(itertools.chain.from_iterable(docs))
    if flat_tokens:
        out[:] = hash_tokens(flat_tokens, algo, seed)
    return out, lengths


def hash_tokens(tokens, algo: int = ALGO_SHA1_32, seed: int = 0) -> np.ndarray:
    """Hash a flat token list in one native call (1-D output)."""
    dtype = np.uint64 if algo == ALGO_SHA1_64 else np.uint32
    out = np.empty(len(tokens), dtype=dtype)
    mod = _load()
    if mod is not None:
        mod.hash_flat(tokens, out, algo, seed)
        return out
    from datasketch_tpu.native import hashlib_native as hn

    if algo == ALGO_SHA1_32:
        return hn.batch_sha1_hash32(list(tokens))
    if algo == ALGO_SHA1_64:
        return hn.batch_sha1_hash64(list(tokens))
    return hn.batch_xxhash32(list(tokens), seed)


def hll_scatter(regs: np.ndarray, hv: np.ndarray, lengths: np.ndarray,
                p: int, max_rank: int):
    """Fused HLL register scatter-max over a flat hashed corpus.

    ``regs`` is int8[n_docs * 2**p] (flat, writable); ``hv`` uint64
    hashes; ``lengths`` int64 per-doc token counts. Returns the minimum
    rank observed (callers raise the reference hash-overflow ValueError
    on <= 0 — ``/root/reference/datasketch/hyperloglog.py:131-137``), or
    None when the extension is unavailable (callers take the numpy
    path). Registers may be partially written when overflow is
    reported; callers must discard them."""
    mod = _load()
    if mod is None or not hasattr(mod, "hll_scatter"):
        return None
    return mod.hll_scatter(regs, hv, lengths, int(p), int(max_rank))


def hash_shingles_padded(texts, k: int, algo: int = ALGO_SHA1_32,
                         seed: int = 0, pad_multiple: int = 128,
                         mode: int = MODE_AUTO):
    """Hash every overlapping k-byte shingle of each text, in one native call.

    The canonical text-dedup front end: shingles are hashed straight out of
    the text buffers (no Python shingle objects). Returns
    (hashes uint32[B, T], lengths int32[B]) where lengths[d] =
    max(0, len(text)-k+1).
    """
    texts = list(texts)
    lengths = np.fromiter(
        (max(0, len(t) - k + 1) for t in texts), np.int32, count=len(texts)
    )
    b = len(texts)
    max_len = int(lengths.max()) if b and lengths.size else 1
    t = max(pad_multiple, -(-max_len // pad_multiple) * pad_multiple)
    dtype = np.uint64 if algo == ALGO_SHA1_64 else np.uint32
    out = np.zeros((b, t), dtype=dtype)
    mod = _load()
    if mod is not None:
        mod.hash_shingles(texts, out, t, k, algo, seed, mode)
        return out, lengths
    # pure-python fallback
    for i, text in enumerate(texts):
        if lengths[i]:
            toks = [bytes(text[j : j + k]) for j in range(lengths[i])]
            out[i, : lengths[i]] = hash_tokens(toks, algo, seed)
    return out, lengths
