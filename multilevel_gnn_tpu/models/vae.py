"""Placeholder — implemented in a later milestone of this round."""


class VAE:
    def __init__(self, *a, **kw):
        raise NotImplementedError("vae is not implemented yet")
