"""Placeholder — implemented in a later milestone of this round."""


class PathCNN:
    def __init__(self, *a, **kw):
        raise NotImplementedError("pathcnn is not implemented yet")
