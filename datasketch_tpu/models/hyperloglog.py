"""Placeholder — implementation lands later this round."""



class HyperLogLog:
    def __init__(self, *a, **kw):
        raise NotImplementedError("HyperLogLog: not yet implemented in this build")


class HyperLogLogPlusPlus:
    def __init__(self, *a, **kw):
        raise NotImplementedError("HyperLogLogPlusPlus: not yet implemented in this build")
