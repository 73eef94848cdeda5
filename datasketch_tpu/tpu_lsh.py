"""Convenience submodule alias: the device-resident classes live under
:mod:`datasketch_tpu.models.tpu_lsh` (TPU-native additions with no
reference analogue); this alias keeps import paths flat alongside the
drop-in parity modules."""

from datasketch_tpu.models.tpu_lsh import *  # noqa: F401,F403
