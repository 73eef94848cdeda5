"""Raw-text near-duplicate detection with ON-DEVICE shingling.

The canonical dedup front end (the reference's shingling recipe,
``/root/reference/docs/minhash.rst``) with the transport-optimal engine:
``hashfunc='device'`` uploads the RAW TEXT (1 byte per character) and
hashes every overlapping k-byte window on the TPU's VPU
(``ops/text_ops.py``) — ~4x fewer bytes over the host->device link than
host-hashed shingles, and zero host per-shingle work. Shows: signatures
straight from text, the ``index_text`` front end, threshold and top-k
queries, and similarity estimation vs the true shingle-set Jaccard.
"""

import numpy as np

from datasketch_tpu import MinHash, TpuMinHashLSH

rng = np.random.RandomState(7)

WORDS = [b"tpu", b"sketch", b"jaccard", b"band", b"shingle", b"vector",
         b"kernel", b"mesh", b"hash", b"index", b"stream", b"batch"]


def sentence(n=60):
    return b" ".join(WORDS[i] for i in rng.randint(0, len(WORDS), n))


# A corpus of documents where every third one is a near-duplicate edit.
texts = []
for _ in range(120):
    base = sentence()
    texts.append(base)
    texts.append(base[: len(base) // 2] + sentence(30))  # half-overlap
    texts.append(sentence())                              # unrelated

K = 9

# 1. Signature matrix straight from raw bytes — shingles hashed on-chip.
sigs = MinHash.bulk_from_text(texts, k=K, num_perm=128, seed=1,
                              hashfunc="device")
print("signatures:", sigs.shape, sigs.dtype)

# 2. Device index built straight from the texts.
index = TpuMinHashLSH(threshold=0.4, num_perm=128, bucket_cap=128)
index.index_text(range(len(texts)), texts, k=K, seed=1)

# 3. Query with sketches built the same way (same k and seed!).
queries = [MinHash(hashvalues=row, hashfunc="device") for row in sigs[:3]]
for i, row in enumerate(index.query_batch(queries, return_scores=True)):
    print(f"text {i}: {[(k_, round(s, 2)) for k_, s in row[:4]]}")

# 4. Estimated vs TRUE shingle-set Jaccard for the first pair.
a, b = texts[0], texts[1]
sa = {a[i:i + K] for i in range(len(a) - K + 1)}
sb = {b[i:i + K] for i in range(len(b) - K + 1)}
true_j = len(sa & sb) / len(sa | sb)
est_j = float((sigs[0] == sigs[1]).mean())
print(f"pair (0,1): true shingle Jaccard {true_j:.3f}, estimate {est_j:.3f}")

# 5. Top-k near-duplicates for a whole query batch in one dispatch.
top = index.top_k(queries, k=3)
print("top-3 per query:", [[k_ for k_, _ in row] for row in top])
