"""Placeholder — implementation lands later this round."""



class MinHashLSHEnsemble:
    def __init__(self, *a, **kw):
        raise NotImplementedError("MinHashLSHEnsemble: not yet implemented in this build")
