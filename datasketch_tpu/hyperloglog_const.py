"""Drop-in submodule alias: the reference ships its HLL++ empirical
bias-correction tables as module-level lists in
``datasketch.hyperloglog_const`` (`/root/reference/datasketch/hyperloglog_const.py:4-70`).
This build stores them as a binary asset (``models/_hllpp_bias.npz``); expose
the same ``_thresholds`` / ``_raw_estimate`` / ``_bias`` names (lists indexed
by ``p - 4`` for p in 4..18) for code that imports the constants directly."""

from datasketch_tpu.models.hyperloglog import _bias_tables

_t, _re, _b = _bias_tables()
_thresholds = [int(x) for x in _t]
_raw_estimate = [_re[p].tolist() for p in range(4, 19)]
_bias = [_b[p].tolist() for p in range(4, 19)]

del _t, _re, _b
