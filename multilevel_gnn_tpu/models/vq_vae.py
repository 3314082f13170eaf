"""Placeholder — implemented in a later milestone of this round."""


class VQVAE:
    def __init__(self, *a, **kw):
        raise NotImplementedError("vq_vae is not implemented yet")
