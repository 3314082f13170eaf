"""Placeholder — implemented in a later milestone of this round."""


class AutoEncoder:
    def __init__(self, *a, **kw):
        raise NotImplementedError("autoencoder is not implemented yet")
