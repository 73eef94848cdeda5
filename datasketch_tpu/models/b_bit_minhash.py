"""Placeholder — implementation lands later this round."""



class bBitMinHash:
    def __init__(self, *a, **kw):
        raise NotImplementedError("bBitMinHash: not yet implemented in this build")
