"""Drop-in submodule alias: the reference exposes datasketch.lsh_bloom
(users import it directly), so datasketch_tpu.lsh_bloom forwards to
:mod:`datasketch_tpu.models.lsh_bloom`."""

from datasketch_tpu.models.lsh_bloom import *  # noqa: F401,F403
