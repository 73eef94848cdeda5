"""In-process fake of the motor/pymongo surface AsyncMongoStorage uses."""

from collections import defaultdict


class _Op:
    def __init__(self, kind, *args):
        self.kind = kind
        self.args = args


def _match(doc, flt):
    return all(doc.get(k) == v for k, v in flt.items())


class FakeCollection:
    def __init__(self):
        self._docs = []

    async def create_index(self, key, background=False):
        return key

    async def bulk_write(self, ops, ordered=False):
        for op in ops:
            if op.kind == "insert":
                self._docs.append(dict(op.args[0]))
            elif op.kind == "update_upsert":
                flt, update = op.args
                if not any(_match(d, flt) for d in self._docs):
                    self._docs.append(dict(update["$setOnInsert"]))
            elif op.kind == "delete_many":
                (flt,) = op.args
                self._docs = [d for d in self._docs if not _match(d, flt)]
            elif op.kind == "delete_one":
                (flt,) = op.args
                for i, d in enumerate(self._docs):
                    if _match(d, flt):
                        del self._docs[i]
                        break

    async def distinct(self, field):
        out, seen = [], set()
        for d in self._docs:
            v = d.get(field)
            if v not in seen:
                seen.add(v)
                out.append(v)
        return out

    async def count_documents(self, flt, limit=None):
        n = sum(1 for d in self._docs if _match(d, flt))
        return min(n, limit) if limit else n

    def find(self, flt, projection=None):
        return _AsyncIter([d for d in self._docs if _match(d, flt)])

    def aggregate(self, pipeline):
        group = pipeline[0]["$group"]
        key_field = group["_id"].lstrip("$")
        counts = defaultdict(int)
        for d in self._docs:
            counts[d.get(key_field)] += 1
        return _AsyncIter(
            [{"_id": k, "count": v} for k, v in counts.items()]
        )


class _AsyncIter:
    def __init__(self, items):
        self._items = list(items)

    def __aiter__(self):
        self._i = 0
        return self

    async def __anext__(self):
        if self._i >= len(self._items):
            raise StopAsyncIteration
        item = self._items[self._i]
        self._i += 1
        return item


class FakeDatabase(dict):
    def __init__(self, name=None, client=None):
        super().__init__()
        self.name = name
        self.client = client

    def __missing__(self, key):
        self[key] = FakeCollection()
        return self[key]

    def get_collection(self, name):
        return self[name]

    async def list_collection_names(self):
        return list(self.keys())


class FakeMotorClient:
    _dbs: dict = {}

    def __init__(self, dsn=None, *args, **kwargs):
        # remember a url-path database name if one was given
        self._default_db = None
        if isinstance(dsn, str) and dsn.startswith("mongodb://"):
            path = dsn[len("mongodb://"):].partition("/")[2]
            self._default_db = path.split("?")[0].strip("/") or None

    def __getitem__(self, name):
        db = self._dbs.setdefault(name, FakeDatabase(name=name))
        db.client = self
        return db

    def get_default_database(self, default=None):
        return self[self._default_db or default or "db_0"]

    async def drop_database(self, name):
        self._dbs.pop(name, None)

    def close(self):
        return None


class FakeInsertOne(_Op):
    def __init__(self, doc):
        super().__init__("insert", doc)


class FakeUpdateOne(_Op):
    def __init__(self, flt, update, upsert=False):
        super().__init__("update_upsert", flt, update)


class FakeDeleteMany(_Op):
    def __init__(self, flt):
        super().__init__("delete_many", flt)


class FakeDeleteOne(_Op):
    def __init__(self, flt):
        super().__init__("delete_one", flt)
