"""Placeholder — implementation lands later this round."""



class HNSW:
    def __init__(self, *a, **kw):
        raise NotImplementedError("HNSW: not yet implemented in this build")
