"""Drop-in submodule alias: the reference exposes datasketch.lsh
(users import it directly), so datasketch_tpu.lsh forwards to
:mod:`datasketch_tpu.models.lsh`."""

from datasketch_tpu.models.lsh import *  # noqa: F401,F403
