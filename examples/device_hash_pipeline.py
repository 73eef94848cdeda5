"""Pre-tokenized corpus pipeline with ON-DEVICE hashing.

The end-to-end fast path for corpora that are already integer token ids
(tokenizer output, categorical features): ``hashfunc='device'`` uploads
raw ids and hashes them on-chip (fmix32 fused into the signature kernel)
— the host does zero per-token work. Shows: bulk signatures, the
``index_tokens`` front end, pipelined threshold serving, HLL cardinality
over the same ids, and the sharded index on a multi-device mesh.
"""

import numpy as np

from datasketch_tpu import HyperLogLog, MinHash, TpuMinHashLSH

rng = np.random.RandomState(0)

# A corpus of near-duplicate clusters of uint32 token ids.
docs = []
for _ in range(200):
    base = rng.choice(100_000, 150, replace=False).astype(np.uint32)
    for _ in range(3):
        d = base.copy()
        mutate = rng.rand(150) < 0.1
        d[mutate] = rng.choice(100_000, int(mutate.sum()))
        docs.append(d)

# 1. Signature matrix with zero host per-token work.
sigs = MinHash.bulk_signatures(docs, num_perm=128, seed=1, hashfunc="device")
print("signatures:", sigs.shape, sigs.dtype)

# 2. Build the device index straight from token ids.
index = TpuMinHashLSH(threshold=0.6, num_perm=128, bucket_cap=128)
index.index_tokens(range(len(docs)), docs, seed=1)

# 3. Query with sketches built the same way (same seed!).
queries = [MinHash(hashvalues=row, hashfunc="device") for row in sigs[:6]]
for i, row in enumerate(index.query_batch(queries, return_scores=True)):
    print(f"doc {i}: {[(k, round(s, 2)) for k, s in row[:4]]}")

# 4. Pipelined serving: batches stream with the tunnel round trip hidden.
batches = [queries[:3], queries[3:6]]
for rows in index.query_stream(batches, depth=2):
    print("stream batch ->", [len(r) for r in rows])

# 5. HLL cardinality over the same pre-tokenized stream.
hll = HyperLogLog(p=12, hashfunc="device")
hll.update_batch([int(x) for doc in docs[:100] for x in doc])
print("distinct tokens (estimated):", round(hll.count()))

# 6. The same corpus sharded over every available device.
import jax
from jax.sharding import Mesh

from datasketch_tpu.parallel import ShardedMinHashLSH

n_dev = len(jax.devices())
mesh = Mesh(np.array(jax.devices()).reshape(n_dev), ("data",))
sharded = ShardedMinHashLSH(mesh, threshold=0.6, num_perm=128)
sharded.index(list(range(len(docs))), sigs)
print("sharded top-3:", sharded.top_k(queries[:2], k=3))
