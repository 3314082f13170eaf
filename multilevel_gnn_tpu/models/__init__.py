"""Model registry (reference models/__init__.py:11-24)."""
from multilevel_gnn_tpu.models.multilevel_gnn import MultilevelGNN  # noqa: F401


def get_model(name: str):
    from multilevel_gnn_tpu.models import multilevel_gnn, pathcnn, deepergcn
    from multilevel_gnn_tpu.models import autoencoder, vae, vq_vae, multiomix

    registry = {
        "multilevel_gnn": multilevel_gnn.MultilevelGNN,
        "vae_finetune": vae.VAEClassifier,  # CV fine-tune head over the VAE
        "multilevel_gnn_seq": multilevel_gnn.MultilevelGNN,  # seq refactor == same math
        "pathcnn": pathcnn.PathCNN,
        "deepergcn": deepergcn.DeeperGCN,
        "multiomix": multiomix.MultiOmixGCN,  # reference key (models/__init__.py:13)
        "mulitomix_gcn": multiomix.MultiOmixGCN,  # legacy alias (kept for configs)
        "multiomix_gcn": multiomix.MultiOmixGCN,
        "autoencoder": autoencoder.AutoEncoder,
        "vae": vae.VAE,
        "mmd_vae": vae.VAE,
        "vq_vae": vq_vae.VQVAE,
        # models/minet.py (Cox survival) is intentionally NOT here: the
        # reference registry also omits it, and its (x, age, masks) call
        # protocol differs from the driver's (batch, ctx) contract — use
        # multilevel_gnn_tpu.models.minet.OmicsNet directly
    }
    return registry[name]
