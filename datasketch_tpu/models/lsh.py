"""Placeholder — implementation lands later this round."""



class MinHashLSH:
    def __init__(self, *a, **kw):
        raise NotImplementedError("MinHashLSH: not yet implemented in this build")
