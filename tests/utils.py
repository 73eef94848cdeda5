"""Shared test helpers (pattern: /root/reference/test/utils.py:4-6)."""


def fake_hash_func(data):
    """Identity hash — makes sketch state exactly predictable in tests."""
    return data
