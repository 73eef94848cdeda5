// _dshash — CPython extension for zero-marshalling corpus hashing.
//
// The ctypes path (hashing.cpp) still needs Python to flatten token lists
// and b"".join() them into a packed buffer — at millions of tokens that
// Python-level marshalling dominates SHA-NI hashing by >3x. This module
// walks list[bytes] / list[list[bytes]] structures directly in C, reads
// PyBytes payloads in place, releases the GIL, and hashes in parallel
// straight into a caller-provided numpy buffer (padded [B, T] matrix for
// the corpus form — the exact input layout of the device signature kernel,
// datasketch_tpu/ops/minhash_ops.py:update_signatures).
//
// Algo codes: 0 = sha1_32, 1 = xxhash32, 2 = sha1_64 (64-bit out buffer).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <memory>

#include "dshash_core.h"

namespace {

struct TokenRef {
  const uint8_t* ptr;
  uint32_t len;
  int64_t out_pos;
};

// Owns references that must stay alive until hashing completes (the
// PySequence_Fast lists may hold the only reference to tokens produced by
// lazy sequences).
struct Keepalive {
  std::vector<PyObject*> objs;
  std::vector<Py_buffer> views;  // buffer-protocol tokens (numpy ints, ...)
  ~Keepalive() {
    for (Py_buffer& v : views) PyBuffer_Release(&v);
    for (PyObject* o : objs) Py_DECREF(o);
  }
};

// Process-global sha1-32 memo. The cache is content-addressed and the
// sha1_32 token hash takes no seed, so entries can never go stale across
// calls — a per-call cache would re-pay one cold SHA1 per distinct token
// per call PLUS a 4MB table zeroing, which dominates warm Zipfian streams.
// Only the inline path touches it, and inline mode runs under the GIL;
// the buffered multi-thread pass builds per-thread caches in hash_refs.
dshash::TokenCache* global_token_cache() {
  static dshash::TokenCache* cache = new dshash::TokenCache();
  return cache;
}

// Pointer-identity layer (epoch-tagged; see IdentCache in dshash_core.h).
// GIL-guarded like the content cache; each call bumps the epoch so entries
// from a previous call's (possibly freed) objects can never match.
dshash::IdentCache* global_ident_cache() {
  static dshash::IdentCache* cache = new dshash::IdentCache();
  return cache;
}

// Consumes (ptr, len, out_pos) triples. Either buffers them for a later
// parallel pass (multi-core) or hashes inline during collection
// (single-core: skips the buffer entirely; SHA-NI tokens are paired
// through the 2-way compressor via a one-deep pending slot).
struct TokenSink {
  std::vector<TokenRef>* refs = nullptr;  // buffering mode if non-null
  uint32_t* out32 = nullptr;
  uint64_t* out64 = nullptr;
  int algo = 0;
  uint32_t seed = 0;
  dshash::compress_fn compress = nullptr;
  bool use_x2 = false;
  dshash::TokenCache* cache = nullptr;  // sha1_32 memoization (optional)
  dshash::IdentCache* ident = nullptr;  // pointer-identity layer above it
  uint64_t ident_epoch = 0;             // this call's claimed session id
  TokenRef pending{nullptr, 0, 0};
  uint64_t pending_key = 0;
  bool has_pending = false;

  inline void consume(const uint8_t* ptr, uint32_t len, int64_t pos) {
    if (refs) {
      refs->push_back(TokenRef{ptr, len, pos});
      return;
    }
    switch (algo) {
      case 0: {
        uint64_t ck = 0;
        if (ident) {
          uint32_t v;
          if (ident->lookup(ptr, len, &v, ident_epoch)) {
            out32[pos] = v;
            return;
          }
        }
        if (cache) {
          ck = dshash::TokenCache::content_key(ptr, len);
          uint32_t v;
          if (cache->lookup(ck, len, &v)) {
            out32[pos] = v;
            if (ident) ident->insert(ptr, len, v, ident_epoch);
            return;
          }
        }
#ifdef DSHASH_X86
        if (use_x2 && len <= 55) {
          if (!has_pending) {
            pending = TokenRef{ptr, len, pos};
            pending_key = ck;
            has_pending = true;
          } else {
            dshash::sha1_32_short_x2(pending.ptr, pending.len, ptr, len,
                                     &out32[pending.out_pos], &out32[pos]);
            has_pending = false;
            if (cache) {
              if (pending_key)
                cache->insert(pending_key, pending.len,
                              out32[pending.out_pos]);
              if (ck) cache->insert(ck, len, out32[pos]);
            }
            if (ident) {
              ident->insert(pending.ptr, pending.len, out32[pending.out_pos],
                            ident_epoch);
              ident->insert(ptr, len, out32[pos], ident_epoch);
            }
          }
          return;
        }
#endif
        out32[pos] = dshash::sha1_32(ptr, len, compress);
        if (cache && ck) cache->insert(ck, len, out32[pos]);
        if (ident) ident->insert(ptr, len, out32[pos], ident_epoch);
        return;
      }
      case 1:
        out32[pos] = dshash::xxh32(ptr, len, seed);
        return;
      default:
#ifdef DSHASH_X86
        // same 2-way SHA-NI pairing as case 0 (no content cache on the
        // 64-bit path — HLL streams are dominated by unique tokens)
        if (use_x2 && len <= 55) {
          if (!has_pending) {
            pending = TokenRef{ptr, len, pos};
            has_pending = true;
          } else {
            dshash::sha1_64_short_x2(pending.ptr, pending.len, ptr, len,
                                     &out64[pending.out_pos], &out64[pos]);
            has_pending = false;
          }
          return;
        }
#endif
        out64[pos] = dshash::sha1_64(ptr, len, compress);
    }
  }

  inline void flush() {
    if (!has_pending) return;
    if (algo == 2) {
      out64[pending.out_pos] =
          dshash::sha1_64(pending.ptr, pending.len, compress);
      has_pending = false;
      return;
    }
    out32[pending.out_pos] =
        dshash::sha1_32(pending.ptr, pending.len, compress);
    if (cache && pending_key)
      cache->insert(pending_key, pending.len, out32[pending.out_pos]);
    if (ident)
      ident->insert(pending.ptr, pending.len, out32[pending.out_pos],
                    ident_epoch);
    has_pending = false;
  }
};

// Collect (ptr, len) for every bytes token in `seq` under the GIL, feeding
// them to `sink` (buffer or inline-hash). Errors if the sequence holds more
// than `max_count` tokens (out-buffer bound, checked BEFORE any write).
// Returns the token count on success, -1 on error.
Py_ssize_t collect_tokens(PyObject* seq, int64_t out_base, Py_ssize_t max_count,
                          TokenSink& sink, Keepalive& keep) {
  PyObject* fast = PySequence_Fast(seq, "expected a sequence of bytes tokens");
  if (!fast) return -1;
  keep.objs.push_back(fast);
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  if (n > max_count) {
    PyErr_Format(PyExc_ValueError, "%zd tokens exceed capacity %zd", n,
                 max_count);
    return -1;
  }
  PyObject** items = PySequence_Fast_ITEMS(fast);
  for (Py_ssize_t i = 0; i < n; i++) {
    // Tokens are scattered PyObjects; pull the upcoming headers (bytes
    // content is inline right after the header) while hashing this one —
    // random-heap latency, not hashing, dominates large-vocab streams.
    // The identity-cache slot is addressable without dereferencing (the
    // data pointer of a PyBytes is its object pointer + ob_sval offset),
    // so warm that line too.
    if (i + 8 < n) {
      PyObject* ahead = items[i + 8];
      __builtin_prefetch(ahead, 0, 3);
      if (sink.ident)
        __builtin_prefetch(
            &sink.ident->slots[dshash::IdentCache::slot_of(
                reinterpret_cast<const char*>(ahead) +
                offsetof(PyBytesObject, ob_sval))],
            0, 1);
    }
    PyObject* tok = items[i];
    if (PyBytes_Check(tok)) {
      sink.consume(reinterpret_cast<const uint8_t*>(PyBytes_AS_STRING(tok)),
                   static_cast<uint32_t>(PyBytes_GET_SIZE(tok)), out_base + i);
    } else if (PyByteArray_Check(tok)) {
      sink.consume(
          reinterpret_cast<const uint8_t*>(PyByteArray_AS_STRING(tok)),
          static_cast<uint32_t>(PyByteArray_GET_SIZE(tok)), out_base + i);
    } else {
      // buffer-protocol fallback (numpy scalars/arrays hash their native
      // byte representation, matching hashlib.sha1's behavior on them)
      Py_buffer view;
      if (PyObject_GetBuffer(tok, &view, PyBUF_SIMPLE) == 0) {
        keep.views.push_back(view);  // released after hashing completes
        sink.consume(reinterpret_cast<const uint8_t*>(view.buf),
                     static_cast<uint32_t>(view.len), out_base + i);
      } else {
        PyErr_Format(
            PyExc_TypeError,
            "token %zd is %.80s, expected bytes/bytearray/buffer", i,
            Py_TYPE(tok)->tp_name);
        return -1;
      }
    }
  }
  return n;
}

// mode: 0 = auto (inline on single-core hosts, where a deferred parallel
// pass only adds buffer traffic), 1 = force inline (hash under the GIL
// during collection — lowest latency), 2 = force buffered (GIL-released
// deferred pass — lets hashing overlap other Python threads).
void init_sink(TokenSink& sink, std::vector<TokenRef>* refs, int algo,
               uint32_t seed, uint32_t* out32, uint64_t* out64, int mode,
               dshash::TokenCache* cache) {
  sink.algo = algo;
  sink.seed = seed;
  sink.out32 = out32;
  sink.out64 = out64;
  sink.compress = dshash::sha1_compress();
  sink.use_x2 = dshash::sha_ni_available();
  static const bool single_core = std::thread::hardware_concurrency() <= 1;
  const bool inline_mode = (mode == 1) || (mode == 0 && single_core);
  sink.refs = inline_mode ? nullptr : refs;
  sink.cache = (algo == 0 && inline_mode) ? cache : nullptr;
  if (sink.cache) {
    sink.ident = global_ident_cache();
    // per-call SESSION id: a concurrent call that starts while this one
    // is mid-collection (GIL released inside PySequence_Fast /
    // PyObject_GetBuffer on lazy inputs) claims a different session, so
    // its entries can never match this call's lookups
    sink.ident_epoch = sink.ident->begin_session();
  }
}

// Hash all collected tokens into `out32`/`out64` (one of them), GIL released.
void hash_refs(const std::vector<TokenRef>& refs, int algo, uint32_t seed,
               uint32_t* out32, uint64_t* out64) {
  const dshash::compress_fn c = dshash::sha1_compress();
  const int64_t n = static_cast<int64_t>(refs.size());
#ifdef DSHASH_X86
  if (algo == 0 && dshash::sha_ni_available()) {
    // Pair single-block tokens through the 2-way interleaved compressor,
    // with a per-thread content cache (Zipfian streams repeat tokens).
    const bool use_cache = n >= 4096;
    dshash::parallel_for(n, [&](int64_t lo, int64_t hi) {
      std::unique_ptr<dshash::TokenCache> cache(
          use_cache ? new dshash::TokenCache() : nullptr);
      int64_t pending = -1;
      uint64_t pending_key = 0;
      for (int64_t i = lo; i < hi; i++) {
        const TokenRef& r = refs[i];
        uint64_t ck = 0;
        if (cache) {
          ck = dshash::TokenCache::content_key(r.ptr, r.len);
          uint32_t v;
          if (cache->lookup(ck, r.len, &v)) {
            out32[r.out_pos] = v;
            continue;
          }
        }
        if (r.len <= 55) {
          if (pending < 0) {
            pending = i;
            pending_key = ck;
          } else {
            const TokenRef& p = refs[pending];
            dshash::sha1_32_short_x2(p.ptr, p.len, r.ptr, r.len,
                                     &out32[p.out_pos], &out32[r.out_pos]);
            if (cache) {
              if (pending_key)
                cache->insert(pending_key, p.len, out32[p.out_pos]);
              if (ck) cache->insert(ck, r.len, out32[r.out_pos]);
            }
            pending = -1;
          }
        } else {
          out32[r.out_pos] = dshash::sha1_32(r.ptr, r.len, c);
          if (cache && ck) cache->insert(ck, r.len, out32[r.out_pos]);
        }
      }
      if (pending >= 0) {
        const TokenRef& p = refs[pending];
        out32[p.out_pos] = dshash::sha1_32(p.ptr, p.len, c);
        if (cache && pending_key) cache->insert(pending_key, p.len, out32[p.out_pos]);
      }
    });
    return;
  }
  if (algo == 2 && dshash::sha_ni_available()) {
    dshash::parallel_for(n, [&](int64_t lo, int64_t hi) {
      int64_t pending = -1;
      for (int64_t i = lo; i < hi; i++) {
        const TokenRef& r = refs[i];
        if (r.len <= 55) {
          if (pending < 0) {
            pending = i;
          } else {
            const TokenRef& p = refs[pending];
            dshash::sha1_64_short_x2(p.ptr, p.len, r.ptr, r.len,
                                     &out64[p.out_pos], &out64[r.out_pos]);
            pending = -1;
          }
        } else {
          out64[r.out_pos] = dshash::sha1_64(r.ptr, r.len, c);
        }
      }
      if (pending >= 0) {
        const TokenRef& p = refs[pending];
        out64[p.out_pos] = dshash::sha1_64(p.ptr, p.len, c);
      }
    });
    return;
  }
#endif
  dshash::parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      const TokenRef& r = refs[i];
      switch (algo) {
        case 0:
          out32[r.out_pos] = dshash::sha1_32(r.ptr, r.len, c);
          break;
        case 1:
          out32[r.out_pos] = dshash::xxh32(r.ptr, r.len, seed);
          break;
        default:
          out64[r.out_pos] = dshash::sha1_64(r.ptr, r.len, c);
      }
    }
  });
}

// get a writable contiguous buffer; itemsize validated by caller via algo.
int get_out_buffer(PyObject* obj, Py_buffer* view, int algo) {
  if (PyObject_GetBuffer(obj, view, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS) < 0)
    return -1;
  const Py_ssize_t want = (algo == 2) ? 8 : 4;
  if (view->itemsize != want) {
    PyBuffer_Release(view);
    PyErr_Format(PyExc_ValueError, "out buffer itemsize %zd, expected %zd",
                 view->itemsize, want);
    return -1;
  }
  return 0;
}

// hash_flat(tokens, out, algo, seed, mode=0) -> n
PyObject* hash_flat(PyObject*, PyObject* args) {
  PyObject* tokens;
  PyObject* out_obj;
  int algo;
  unsigned int seed;
  int mode = 0;
  if (!PyArg_ParseTuple(args, "OOiI|i", &tokens, &out_obj, &algo, &seed, &mode))
    return nullptr;

  Py_buffer view;
  if (get_out_buffer(out_obj, &view, algo) < 0) return nullptr;
  const Py_ssize_t capacity = view.len / view.itemsize;

  std::vector<TokenRef> refs;
  Keepalive keep;
  TokenSink sink;
  // PySequence_Size can FAIL (-1 with a pending exception) on objects
  // that pass PySequence_Check but lack __len__; treat that as "no hint"
  // or the pending exception later surfaces as a bogus SystemError.
  Py_ssize_t size_hint = 0;
  if (PySequence_Check(tokens)) {
    size_hint = PySequence_Size(tokens);
    if (size_hint < 0) {
      PyErr_Clear();
      size_hint = 0;
    }
  }
  dshash::TokenCache* cache =
      (algo == 0 && size_hint >= 4096) ? global_token_cache() : nullptr;
  init_sink(sink, &refs, algo, seed, static_cast<uint32_t*>(view.buf),
            static_cast<uint64_t*>(view.buf), mode, cache);
  if (sink.refs && size_hint > 0)
    refs.reserve(static_cast<size_t>(size_hint));
  const Py_ssize_t n = collect_tokens(tokens, 0, capacity, sink, keep);
  if (n < 0) {
    PyBuffer_Release(&view);
    return nullptr;
  }
  sink.flush();

  if (sink.refs) {
    Py_BEGIN_ALLOW_THREADS
    hash_refs(refs, algo, seed, static_cast<uint32_t*>(view.buf),
              static_cast<uint64_t*>(view.buf));
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&view);
  return PyLong_FromSsize_t(n);
}

// hash_padded(docs, out, row_stride, algo, seed, mode=0) -> total_tokens
//
// docs: sequence of sequences of bytes; doc i's token j hashes into
// out[i * row_stride + j]. Caller guarantees row_stride >= max doc length.
PyObject* hash_padded(PyObject*, PyObject* args) {
  PyObject* docs;
  PyObject* out_obj;
  Py_ssize_t row_stride;
  int algo;
  unsigned int seed;
  int mode = 0;
  if (!PyArg_ParseTuple(args, "OOniI|i", &docs, &out_obj, &row_stride, &algo,
                        &seed, &mode))
    return nullptr;

  Keepalive keep;
  PyObject* fast = PySequence_Fast(docs, "expected a sequence of documents");
  if (!fast) return nullptr;
  keep.objs.push_back(fast);
  const Py_ssize_t n_docs = PySequence_Fast_GET_SIZE(fast);
  PyObject** doc_items = PySequence_Fast_ITEMS(fast);

  Py_buffer view;
  if (get_out_buffer(out_obj, &view, algo) < 0) return nullptr;
  if (row_stride <= 0 || view.len / view.itemsize < n_docs * row_stride) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "out buffer too small for docs*stride");
    return nullptr;
  }

  std::vector<TokenRef> refs;
  Keepalive token_keep;
  TokenSink sink;
  dshash::TokenCache* cache =
      (algo == 0 && n_docs >= 16) ? global_token_cache() : nullptr;
  init_sink(sink, &refs, algo, seed, static_cast<uint32_t*>(view.buf),
            static_cast<uint64_t*>(view.buf), mode, cache);
  if (sink.refs) refs.reserve(static_cast<size_t>(n_docs) * 8);

  int64_t total = 0;
  for (Py_ssize_t d = 0; d < n_docs; d++) {
    const Py_ssize_t count =
        collect_tokens(doc_items[d], static_cast<int64_t>(d) * row_stride,
                       row_stride, sink, token_keep);
    if (count < 0) {
      PyBuffer_Release(&view);
      return nullptr;
    }
    total += count;
  }
  sink.flush();

  if (sink.refs) {
    Py_BEGIN_ALLOW_THREADS
    hash_refs(refs, algo, seed, static_cast<uint32_t*>(view.buf),
              static_cast<uint64_t*>(view.buf));
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&view);
  return PyLong_FromSsize_t(static_cast<Py_ssize_t>(total));
}

// hash_ragged(docs, out, starts, algo, seed, mode=0) -> total_tokens
//
// Contiguous (flat) layout: doc d's token j hashes into
// out[starts[d] + j] with NO padding slots between docs — the layout the
// device-side gather (`ops.minhash_ops.compute_signatures_ragged`)
// consumes, shipping only real bytes over the host->device link.
// `starts` is an int64[n_docs] C-contiguous buffer of cumulative doc
// offsets (starts[0] == 0); doc d's capacity is starts[d+1]-starts[d]
// (last doc: out capacity - starts[d]).
PyObject* hash_ragged(PyObject*, PyObject* args) {
  PyObject* docs;
  PyObject* out_obj;
  PyObject* starts_obj;
  int algo;
  unsigned int seed;
  int mode = 0;
  if (!PyArg_ParseTuple(args, "OOOiI|i", &docs, &out_obj, &starts_obj, &algo,
                        &seed, &mode))
    return nullptr;

  Keepalive keep;
  PyObject* fast = PySequence_Fast(docs, "expected a sequence of documents");
  if (!fast) return nullptr;
  keep.objs.push_back(fast);
  const Py_ssize_t n_docs = PySequence_Fast_GET_SIZE(fast);
  PyObject** doc_items = PySequence_Fast_ITEMS(fast);

  Py_buffer starts_view;
  if (PyObject_GetBuffer(starts_obj, &starts_view, PyBUF_C_CONTIGUOUS) < 0)
    return nullptr;
  if (starts_view.itemsize != 8 ||
      starts_view.len / starts_view.itemsize < n_docs) {
    PyBuffer_Release(&starts_view);
    PyErr_SetString(PyExc_ValueError,
                    "starts must be int64 with one entry per doc");
    return nullptr;
  }
  const int64_t* starts = static_cast<const int64_t*>(starts_view.buf);

  Py_buffer view;
  if (get_out_buffer(out_obj, &view, algo) < 0) {
    PyBuffer_Release(&starts_view);
    return nullptr;
  }
  const Py_ssize_t capacity = view.len / view.itemsize;

  std::vector<TokenRef> refs;
  Keepalive token_keep;
  TokenSink sink;
  dshash::TokenCache* cache =
      (algo == 0 && n_docs >= 16) ? global_token_cache() : nullptr;
  init_sink(sink, &refs, algo, seed, static_cast<uint32_t*>(view.buf),
            static_cast<uint64_t*>(view.buf), mode, cache);
  if (sink.refs) refs.reserve(static_cast<size_t>(n_docs) * 8);

  int64_t total = 0;
  for (Py_ssize_t d = 0; d < n_docs; d++) {
    const int64_t base = starts[d];
    const int64_t limit = (d + 1 < n_docs) ? starts[d + 1] : capacity;
    if (base < 0 || limit < base || limit > capacity) {
      PyBuffer_Release(&view);
      PyBuffer_Release(&starts_view);
      PyErr_Format(PyExc_ValueError, "bad starts at doc %zd", d);
      return nullptr;
    }
    const Py_ssize_t count =
        collect_tokens(doc_items[d], base, limit - base, sink, token_keep);
    if (count < 0) {
      PyBuffer_Release(&view);
      PyBuffer_Release(&starts_view);
      return nullptr;
    }
    total += count;
  }
  sink.flush();

  if (sink.refs) {
    Py_BEGIN_ALLOW_THREADS
    hash_refs(refs, algo, seed, static_cast<uint32_t*>(view.buf),
              static_cast<uint64_t*>(view.buf));
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&view);
  PyBuffer_Release(&starts_view);
  return PyLong_FromSsize_t(static_cast<Py_ssize_t>(total));
}

// hash_shingles(texts, out, row_stride, k, algo, seed, mode=0) -> total
//
// texts: sequence of bytes-like documents; document d contributes
// max(0, len(d)-k+1) overlapping k-byte shingles, hashed straight out of
// the text buffer into out[d*row_stride + i] — no Python-level shingle
// objects exist at any point.
PyObject* hash_shingles(PyObject*, PyObject* args) {
  PyObject* texts;
  PyObject* out_obj;
  Py_ssize_t row_stride;
  Py_ssize_t k;
  int algo;
  unsigned int seed;
  int mode = 0;
  if (!PyArg_ParseTuple(args, "OOnniI|i", &texts, &out_obj, &row_stride, &k,
                        &algo, &seed, &mode))
    return nullptr;
  if (k <= 0) {
    PyErr_SetString(PyExc_ValueError, "k must be positive");
    return nullptr;
  }

  Keepalive keep;
  PyObject* fast = PySequence_Fast(texts, "expected a sequence of texts");
  if (!fast) return nullptr;
  keep.objs.push_back(fast);
  const Py_ssize_t n_docs = PySequence_Fast_GET_SIZE(fast);
  PyObject** items = PySequence_Fast_ITEMS(fast);

  Py_buffer view;
  if (get_out_buffer(out_obj, &view, algo) < 0) return nullptr;
  if (row_stride <= 0 || view.len / view.itemsize < n_docs * row_stride) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "out buffer too small for docs*stride");
    return nullptr;
  }

  std::vector<TokenRef> refs;
  TokenSink sink;
  dshash::TokenCache* cache =
      (algo == 0 && n_docs >= 4) ? global_token_cache() : nullptr;
  init_sink(sink, &refs, algo, seed, static_cast<uint32_t*>(view.buf),
            static_cast<uint64_t*>(view.buf), mode, cache);
  if (sink.refs) refs.reserve(static_cast<size_t>(n_docs) * 64);

  int64_t total = 0;
  for (Py_ssize_t d = 0; d < n_docs; d++) {
    PyObject* txt = items[d];
    const uint8_t* ptr;
    Py_ssize_t len;
    if (PyBytes_Check(txt)) {
      ptr = reinterpret_cast<const uint8_t*>(PyBytes_AS_STRING(txt));
      len = PyBytes_GET_SIZE(txt);
    } else {
      Py_buffer tv;
      if (PyObject_GetBuffer(txt, &tv, PyBUF_SIMPLE) != 0) {
        PyBuffer_Release(&view);
        PyErr_Format(PyExc_TypeError, "text %zd is %.80s, expected bytes",
                     d, Py_TYPE(txt)->tp_name);
        return nullptr;
      }
      keep.views.push_back(tv);
      ptr = reinterpret_cast<const uint8_t*>(tv.buf);
      len = tv.len;
    }
    const Py_ssize_t n_sh = len >= k ? len - k + 1 : 0;
    if (n_sh > row_stride) {
      PyBuffer_Release(&view);
      PyErr_Format(PyExc_ValueError,
                   "document %zd has %zd shingles > row stride %zd", d, n_sh,
                   row_stride);
      return nullptr;
    }
    const int64_t base = static_cast<int64_t>(d) * row_stride;
    for (Py_ssize_t i = 0; i < n_sh; i++)
      sink.consume(ptr + i, static_cast<uint32_t>(k), base + i);
    total += n_sh;
  }
  sink.flush();

  if (sink.refs) {
    Py_BEGIN_ALLOW_THREADS
    hash_refs(refs, algo, seed, static_cast<uint32_t*>(view.buf),
              static_cast<uint64_t*>(view.buf));
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&view);
  return PyLong_FromSsize_t(static_cast<Py_ssize_t>(total));
}

PyObject* sha_ni(PyObject*, PyObject*) {
  return PyBool_FromLong(dshash::sha_ni_available() ? 1 : 0);
}

// hll_scatter(regs, hv, lengths, p, max_rank) -> min_rank
//
// Fused HyperLogLog register update over a flat hashed corpus: for doc
// d's hash h, regs[d*2^p + (h & (2^p-1))] max= max_rank -
// bit_length(h >> p) + 1. One C pass replaces the numpy pipeline's
// np.repeat doc base + flat-index build + frexp bit_length +
// np.maximum.at (~65ms/1M tokens on the bench host vs ~2ms here).
// Returns the minimum rank observed so the caller can raise the
// reference's hash-overflow ValueError (hyperloglog.py:131-137
// semantics); registers may be partially updated on overflow, so
// callers must not return them (bulk_registers builds regs fresh).
PyObject* hll_scatter(PyObject*, PyObject* args) {
  PyObject* regs_obj;
  PyObject* hv_obj;
  PyObject* len_obj;
  int p;
  int max_rank;
  if (!PyArg_ParseTuple(args, "OOOii", &regs_obj, &hv_obj, &len_obj, &p,
                        &max_rank))
    return nullptr;
  if (p < 1 || p > 30 || max_rank < 1) {
    PyErr_SetString(PyExc_ValueError, "bad p/max_rank");
    return nullptr;
  }
  Py_buffer regs, hv, lens;
  if (PyObject_GetBuffer(regs_obj, &regs,
                         PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS) < 0)
    return nullptr;
  if (PyObject_GetBuffer(hv_obj, &hv, PyBUF_C_CONTIGUOUS) < 0) {
    PyBuffer_Release(&regs);
    return nullptr;
  }
  if (PyObject_GetBuffer(len_obj, &lens, PyBUF_C_CONTIGUOUS) < 0) {
    PyBuffer_Release(&regs);
    PyBuffer_Release(&hv);
    return nullptr;
  }
  const int64_t m = int64_t(1) << p;
  const int64_t n_docs = lens.len / int64_t(sizeof(int64_t));
  const int64_t n_hv = hv.len / int64_t(sizeof(uint64_t));
  bool size_ok = regs.itemsize == 1 && hv.itemsize == 8 &&
                 lens.itemsize == 8 && regs.len >= n_docs * m;
  const int64_t* lengths = static_cast<const int64_t*>(lens.buf);
  int64_t total = 0;
  if (size_ok) {
    for (int64_t d = 0; d < n_docs; d++) {
      if (lengths[d] < 0) {  // a negative length whose sum still matched
        size_ok = false;     // n_hv would read past the hv buffer
        break;
      }
      total += lengths[d];
    }
    size_ok = size_ok && total == n_hv;
  }
  if (!size_ok) {
    PyBuffer_Release(&regs);
    PyBuffer_Release(&hv);
    PyBuffer_Release(&lens);
    PyErr_SetString(PyExc_ValueError,
                    "hll_scatter: buffer sizes/dtypes inconsistent "
                    "(regs int8[n_docs*2^p], hv uint64, lengths int64)");
    return nullptr;
  }
  int8_t* r = static_cast<int8_t*>(regs.buf);
  const uint64_t* h = static_cast<const uint64_t*>(hv.buf);
  const uint64_t mask = uint64_t(m) - 1;
  int min_rank = INT32_MAX;
  Py_BEGIN_ALLOW_THREADS
  int64_t pos = 0;
  for (int64_t d = 0; d < n_docs; d++) {
    int8_t* row = r + d * m;
    const int64_t end = pos + lengths[d];
    for (; pos < end; pos++) {
      const uint64_t v = h[pos];
      const uint64_t bits = v >> p;
      const int bl = bits ? 64 - __builtin_clzll(bits) : 0;
      const int rank = max_rank - bl + 1;
      if (rank < min_rank) min_rank = rank;
      const int64_t ix = int64_t(v & mask);
      if (int8_t(rank) > row[ix]) row[ix] = int8_t(rank);
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&regs);
  PyBuffer_Release(&hv);
  PyBuffer_Release(&lens);
  return PyLong_FromLong(min_rank == INT32_MAX ? max_rank : min_rank);
}

PyMethodDef methods[] = {
    {"hash_flat", hash_flat, METH_VARARGS,
     "hash_flat(tokens, out, algo, seed, mode=0) -> n"},
    {"hash_padded", hash_padded, METH_VARARGS,
     "hash_padded(docs, out, row_stride, algo, seed, mode=0) -> total_tokens"},
    {"hash_ragged", hash_ragged, METH_VARARGS,
     "hash_ragged(docs, out, starts, algo, seed, mode=0) -> total_tokens"},
    {"hash_shingles", hash_shingles, METH_VARARGS,
     "hash_shingles(texts, out, row_stride, k, algo, seed, mode=0) -> total"},
    {"sha_ni_available", sha_ni, METH_NOARGS, "SHA-NI fast path active?"},
    {"hll_scatter", hll_scatter, METH_VARARGS,
     "hll_scatter(regs, hv, lengths, p, max_rank) -> min_rank"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_dshash",
                         "native corpus hashing", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__dshash(void) { return PyModule_Create(&moduledef); }
