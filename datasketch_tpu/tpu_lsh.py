"""Drop-in submodule alias: the reference exposes datasketch.tpu_lsh
(users import it directly), so datasketch_tpu.tpu_lsh forwards to
:mod:`datasketch_tpu.models.tpu_lsh`."""

from datasketch_tpu.models.tpu_lsh import *  # noqa: F401,F403
