"""Drop-in submodule alias: the reference exposes datasketch.hnsw
(users import it directly), so datasketch_tpu.hnsw forwards to
:mod:`datasketch_tpu.models.hnsw`."""

from datasketch_tpu.models.hnsw import *  # noqa: F401,F403
