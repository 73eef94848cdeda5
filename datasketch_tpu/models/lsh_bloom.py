"""Placeholder — implementation lands later this round."""



class MinHashLSHBloom:
    def __init__(self, *a, **kw):
        raise NotImplementedError("MinHashLSHBloom: not yet implemented in this build")
