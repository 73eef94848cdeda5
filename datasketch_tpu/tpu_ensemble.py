"""Drop-in submodule alias: the reference exposes datasketch.tpu_ensemble
(users import it directly), so datasketch_tpu.tpu_ensemble forwards to
:mod:`datasketch_tpu.models.tpu_ensemble`."""

from datasketch_tpu.models.tpu_ensemble import *  # noqa: F401,F403
