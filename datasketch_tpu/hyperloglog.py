"""Drop-in submodule alias: the reference exposes datasketch.hyperloglog
(users import it directly), so datasketch_tpu.hyperloglog forwards to
:mod:`datasketch_tpu.models.hyperloglog`."""

from datasketch_tpu.models.hyperloglog import *  # noqa: F401,F403
