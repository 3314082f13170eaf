"""Placeholder — implemented in a later milestone of this round."""


class DeeperGCN:
    def __init__(self, *a, **kw):
        raise NotImplementedError("deepergcn is not implemented yet")
