"""Placeholder — implemented in a later milestone of this round."""


class DiffPool:
    def __init__(self, *a, **kw):
        raise NotImplementedError("diffpool is not implemented yet")
