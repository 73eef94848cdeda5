"""Placeholder — implementation lands later this round."""



class WeightedMinHash:
    def __init__(self, *a, **kw):
        raise NotImplementedError("WeightedMinHash: not yet implemented in this build")


class WeightedMinHashGenerator:
    def __init__(self, *a, **kw):
        raise NotImplementedError("WeightedMinHashGenerator: not yet implemented in this build")
