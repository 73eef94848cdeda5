"""In-process fake of the redis client surface our storages use.

The analogue of the reference's mockredis monkeypatching
(``/root/reference/test/test_lsh.py:13-17``): exercises the Redis storage
code paths (namespacing, pipelines, buffer flushes) without a server.
"""

from collections import defaultdict


class FakeRedis:
    def __init__(self, **kwargs):
        self._lists = defaultdict(list)
        self._sets = defaultdict(set)

    # --- list ops
    def rpush(self, key, *vals):
        self._lists[key].extend(vals)

    def lrange(self, key, start, end):
        vals = self._lists.get(key, [])
        end = len(vals) if end == -1 else end + 1
        return list(vals[start:end])

    def lrem(self, key, count, val):
        try:
            self._lists[key].remove(val)
        except ValueError:
            pass

    def llen(self, key):
        return len(self._lists.get(key, []))

    # --- set ops
    def sadd(self, key, *vals):
        self._sets[key].update(vals)

    def smembers(self, key):
        return set(self._sets.get(key, set()))

    def srem(self, key, val):
        self._sets[key].discard(val)

    def scard(self, key):
        return len(self._sets.get(key, set()))

    # --- generic
    def delete(self, *keys):
        for k in keys:
            self._lists.pop(k, None)
            self._sets.pop(k, None)

    def exists(self, key):
        return int(key in self._lists or key in self._sets)

    def keys(self, pattern):
        # emulate redis glob matching for the patterns our storages emit:
        # a backslash-ESCAPED literal prefix followed by one trailing '*'
        assert pattern.endswith(b"*")
        escaped = pattern[:-1]
        prefix = bytearray()
        i = 0
        while i < len(escaped):
            if escaped[i] == 0x5C and i + 1 < len(escaped):  # backslash
                i += 1
            prefix.append(escaped[i])
            i += 1
        prefix = bytes(prefix)
        out = [k for k in list(self._lists) + list(self._sets)
               if k.startswith(prefix)]
        return out

    def pipeline(self, *args, **kwargs):
        return FakePipeline(self)


class FakePipeline:
    """Buffers (cmd, args) and applies them on execute()."""

    def __init__(self, client):
        self._client = client
        self._ops = []

    def __getattr__(self, name):
        def queue(*args, **kwargs):
            self._ops.append((name, args, kwargs))

        return queue

    def execute(self):
        # real pipelines return each command's result (read pipelines
        # such as RedisListStorage.getmany depend on this)
        ops, self._ops = self._ops, []
        return [
            getattr(self._client, name)(*args, **kwargs)
            for name, args, kwargs in ops
        ]
