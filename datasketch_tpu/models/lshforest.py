"""Placeholder — implementation lands later this round."""



class MinHashLSHForest:
    def __init__(self, *a, **kw):
        raise NotImplementedError("MinHashLSHForest: not yet implemented in this build")
