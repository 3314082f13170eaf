"""Placeholder — implemented in a later milestone of this round."""


class MultiOmixGCN:
    def __init__(self, *a, **kw):
        raise NotImplementedError("multiomix is not implemented yet")
