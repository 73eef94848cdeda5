"""Drop-in submodule alias: the reference exposes datasketch.lshensemble
(users import it directly), so datasketch_tpu.lshensemble forwards to
:mod:`datasketch_tpu.models.lshensemble`."""

from datasketch_tpu.models.lshensemble import *  # noqa: F401,F403
